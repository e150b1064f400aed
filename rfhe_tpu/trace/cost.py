"""Static cost analysis (L6): the callgrind-instruction-count analog.

The reference attributes per-op instruction counts with valgrind/callgrind
(profile_framewk/profile_data/*/batch_callgrind.sh + draw_info.py).  Under
XLA the equivalent ground truth is the compiled executable's cost analysis
(FLOPs, bytes accessed) — exact, per compiled op, no sampling.

  op_cost(fn, *args)      -> {"flops", "bytes accessed", ...} for one jitted op
  evaluator_cost_report   -> per-evaluator-op cost table for a CkksContext
"""
from __future__ import annotations

from typing import Dict

import jax


def op_cost(fn, *args) -> Dict[str, float]:
    """Compile fn(*args) and return XLA's cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):          # older jax returns [dict]
        ca = ca[0] if ca else {}
    return dict(ca or {})


def evaluator_cost_report(ckks, ct_a, ct_b) -> Dict[str, Dict[str, float]]:
    """Static cost of each evaluator op at the ciphertexts' level."""
    report = {}
    report["add"] = op_cost(lambda a, b: ckks._add_impl(a, b).c[0].data,
                            ct_a, ct_b)
    report["multiply"] = op_cost(
        lambda a, b: ckks._multiply_impl(a, b).c[0].data, ct_a, ct_b)
    report["multiply_relin"] = op_cost(
        lambda a, b, k: ckks._relinearize_impl(
            ckks._multiply_impl(a, b), k).c[0].data,
        ct_a, ct_b, ckks.rlk)
    report["rescale"] = op_cost(
        lambda a, b, k: ckks._rescale_impl(
            ckks._relinearize_impl(ckks._multiply_impl(a, b), k)).c[0].data,
        ct_a, ct_b, ckks.rlk)
    g = ckks.rotation_galois_element(1)
    report["rotate"] = op_cost(
        lambda a, k: ckks._apply_galois_impl(a, k, g).c[0].data,
        ct_a, ckks.galois_key(g))
    return report


def format_report(report: Dict[str, Dict[str, float]]) -> str:
    lines = [f"{'op':<16}{'GFLOP':>10}{'MB moved':>12}"]
    for op, ca in report.items():
        fl = ca.get("flops", 0.0) / 1e9
        by = ca.get("bytes accessed", 0.0) / 1e6
        lines.append(f"{op:<16}{fl:>10.3f}{by:>12.2f}")
    return "\n".join(lines)
