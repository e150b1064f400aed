import numpy as np
import pytest

from rfhe_tpu.faults.reduction_campaigns import (
    barrett_scheme_campaign, montgomery_campaign, barrett_final_campaign)


def test_barrett_t_check_only():
    """T-ECC alone: detects all T-stage injections (50% of trials), but a
    T flip is only HARMFUL when it lands above bit 2k of t (prob ~ 38/112),
    so detection over harmful trials ~ 0.19/(0.19+0.5) ~ 0.27.  (The
    reference's published ~0.5 figure aggregates different flip configs;
    the per-trial semantics here follow barret_modmul.py exactly.)"""
    res = barrett_scheme_campaign(16, (True, False, False), trials=400,
                                  pbits=37, vec_len=256, seed=42)
    assert 0.15 < res["detection_rate"] < 0.45


def test_barrett_sn_check_wide_fold():
    """SN-ECC at fold width 16 catches essentially all harmful faults
    (draw_barrett.py: SN-check -> 1.0 by fw=16)."""
    res = barrett_scheme_campaign(16, (False, True, False), trials=300,
                                  pbits=37, vec_len=256, seed=1)
    assert res["detection_rate"] > 0.97


def test_barrett_sn_check_narrow_fold():
    """A SINGLE bit flip changes the sum by ±2^b which is never ≡ 0 mod
    2^w−1, so even fold width 2 catches all single-flip faults; collisions
    appear with 2 flips per element (reference's sub-1.0 narrow-fold rates
    correspond to multi-flip configs)."""
    res = barrett_scheme_campaign(2, (False, True, False), trials=300,
                                  pbits=37, vec_len=256, seed=2)
    assert res["detection_rate"] > 0.97
    res2 = barrett_scheme_campaign(2, (False, True, False), trials=300,
                                   pbits=37, vec_len=256, bits_per_elem=2,
                                   seed=2)
    assert res2["detection_rate"] < res["detection_rate"] + 1e-9
    assert res2["detection_rate"] < 0.95


def test_barrett_final_range_check():
    """Final range window catches internal (reduction-path) faults ~100%
    (draw_barrett.py: final-range 1.000)."""
    res = barrett_scheme_campaign(16, (False, False, True), trials=300,
                                  pbits=37, vec_len=256, seed=3)
    assert res["detection_rate"] > 0.95


def test_montgomery_full_scheme():
    """m-check + mp-check + final at wide fold: detection ~ 1.0
    (montgomery.py fold_widths 26-32 table)."""
    res = montgomery_campaign(24, (True, True, True), trials=200, pbits=37,
                              vec_len=256, flip_count=2, seed=4)
    assert res["detection_rate"] > 0.97


def test_barrett_final_sum_check_models():
    """Sum check: miss 0 for randomize-element models (sum.txt rows 1-3)."""
    for model in (1, 2, 3):
        res = barrett_final_campaign(8, model, trials=150, pbits=37,
                                     vec_len=256, use_intra=False,
                                     use_range=False, use_sum=True, seed=5)
        assert res["miss_rate"] < 0.05, model


def test_barrett_final_intra_s4():
    """Intra fold 2^4+1: model-1 miss ~ 1/17 ~ 0.059 (intra.txt row s=4)."""
    res = barrett_final_campaign(4, 1, trials=600, pbits=37, vec_len=128,
                                 use_intra=True, use_range=False,
                                 use_sum=False, seed=6)
    assert 0.01 < res["miss_rate"] < 0.15


def test_barrett_final_range_alone_misses_external():
    """Range check alone never sees faults injected OUTSIDE the reduction
    (range.txt: miss 1.0)."""
    res = barrett_final_campaign(8, 1, trials=100, pbits=37, vec_len=128,
                                 use_intra=False, use_range=True,
                                 use_sum=False, seed=7)
    assert res["miss_rate"] > 0.9


def test_barrett_fold_ramp_matches_reference_tables():
    """Parity with draw_barrett.py:10-80 (MOF fault mix): SN-check detection
    = 1 - 1/M and T-check ~ (1 - 1/M)/2 (stage split 50/50), within
    binomial CI.  The BF mix cannot produce this ramp (a +-2^j delta is
    never 0 mod 2^w-1) -- that flatline was round-1's Weak #6."""
    import math
    for fw, ref_sn in ((2, 0.6683), (3, 0.8637), (4, 0.9327)):
        M = (1 << fw) - 1
        res = barrett_scheme_campaign(fw, (False, True, False), trials=1200,
                                      vec_len=512, seed=20 + fw, fault="MOF")
        exp = 1.0 - 1.0 / M
        ci = 4 * math.sqrt(exp * (1 - exp) / 1200)
        assert abs(res["detection_rate"] - exp) < ci + 0.01, (fw, res)
        assert abs(res["detection_rate"] - ref_sn) < ci + 0.02, (fw, res)
    # T-check at fw=2: ~ 0.333 (reference 0.3246)
    rt = barrett_scheme_campaign(2, (True, False, False), trials=1200,
                                 vec_len=512, seed=30, fault="MOF")
    assert 0.26 < rt["detection_rate"] < 0.41, rt
