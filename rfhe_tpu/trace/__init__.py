"""L6: op-level tracing (reference-format ROI markers), trace aggregation
(analyze/sum_trace ports), and phase-decomposed profiled evaluator ops."""
from .markers import TraceCollector, TraceEvent, xla_trace  # noqa: F401
from .analyze import collapse_kernel_runs, summarize_roi  # noqa: F401
from .profiled import ProfiledRotation  # noqa: F401
from .cost import op_cost, evaluator_cost_report, format_report  # noqa: F401
