import io

import numpy as np
import pytest

from rfhe_tpu.trace import (
    TraceCollector, collapse_kernel_runs, summarize_roi, ProfiledRotation)


def test_collector_format():
    buf = io.StringIO()
    col = TraceCollector(out=buf)
    with col.scope("ROTATE"):
        col.kernel_cost("NTT", 100)
        col.kernel_cost("NTT", 50)
        col.kernel_cost("MULTEVK", 200)
    text = buf.getvalue()
    assert text.startswith("frontend: ROTATE\n")
    assert "[NTT] total cost 100 us" in text
    assert "ROTATE[" in text and "microseconds]" in text


def test_collapse_kernel_runs():
    lines = [
        "frontend: ROTATE",
        "[NTT] total cost 100 us",
        "[NTT] total cost 50 us",
        "[MULTEVK] total cost 400 us",   # parent op: contains the 150us NTT
        "[NTT] total cost 30 us",
        "ROTATE[600 microseconds]",
    ]
    out = collapse_kernel_runs(lines)
    assert "[NTT] total cost 150 us" in out
    assert "[MULTEVK] total cost 250 us" in out   # self time = 400 - 150
    assert "[NTT] total cost 30 us" in out


def test_summarize_roi():
    lines = [
        "frontend: ROTATE",
        "[NTT] total cost 100 us",
        "[NTT] total cost 50 us",
        "[MULTEVK] total cost 400 us",
        "[BASECONV] total cost 100 us",
        "ROTATE[700 microseconds]",
    ]
    s = summarize_roi(lines)
    assert s["roi_total_us"] == 700
    assert s["per_tag"]["NTT"] == 150
    assert s["per_tag"]["MULTEVK"] == 250
    assert s["per_tag"]["BASECONV"] == 100
    assert abs(s["shares_of_roi"]["NTT"] - 150 / 700) < 1e-9


def test_profiled_rotation_matches_plain():
    from rfhe_tpu.fhe import CkksContext, CkksParams
    ckks = CkksContext(CkksParams.make(n=256, levels=2, q0_bits=30,
                                       scale_bits=26), seed=3)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, 128) + 0j
    ct = ckks.encrypt(*ckks.encode(z))
    prof = ProfiledRotation(ckks)
    out = prof.rotate(ct, 1)
    plain = ckks.rotate(ct, 1)
    np.testing.assert_array_equal(np.asarray(out.c[0].data),
                                  np.asarray(plain.c[0].data))
    np.testing.assert_array_equal(np.asarray(out.c[1].data),
                                  np.asarray(plain.c[1].data))
    bd = prof.breakdown()
    assert abs(sum(v for k, v in bd.items() if k != "total_us") - 1.0) < 1e-6
    text = prof.last_collector.text()
    s = summarize_roi(text.splitlines())
    assert s["per_tag"]["NTT"] > 0
