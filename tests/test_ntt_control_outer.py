import numpy as np

from rfhe_tpu import numth
from rfhe_tpu.faults.ntt_control import standard_ntt_campaign
from rfhe_tpu.faults.reduction_campaigns import outer_check_campaign


def test_standard_ntt_mult_faults_caught():
    """Multiplier faults: lazy bucket checker catches all (miss 0)."""
    q = numth.find_ntt_prime(64, 12, negacyclic=False)
    res = standard_ntt_campaign("SBF", "mult", trials=500, n=64, q=q, seed=1)
    assert res["miss_rate"] == 0.0


def test_standard_ntt_storage_misses_at_1_over_q():
    """Storage faults: only the global projection sees them; miss ~ 1/q
    (the control result vs the four-step's layered detectors)."""
    q = 769
    res = standard_ntt_campaign("SBF", "storage", trials=4000, n=64, q=q,
                                seed=2)
    assert res["harmful"] > 3000
    assert res["miss_rate"] < 0.02           # ~1/769 expected
    # the abft-only miss should be > 0 occasionally at these trial counts or
    # at least consistent with 1/q
    assert res["abft_only_miss"] < 0.02


def test_standard_ntt_clean_projection_passes():
    """Sanity: with no harmful effect (faults can be value-preserving),
    projections don't false-positive en masse (FP only via real mismatch)."""
    q = numth.find_ntt_prime(64, 20, negacyclic=False)
    res = standard_ntt_campaign("SBF", "storage", trials=300, n=64, q=q,
                                seed=3)
    assert res["miss_rate"] < 0.01


def test_outer_check_sbf_always_caught():
    """Single-bit flips never collide mod 2^k+1... except when the flipped
    bit pattern aligns; at k=8 collisions are ~0."""
    res = outer_check_campaign(8, "SBF", trials=400, qbits=37, vec_len=256)
    assert res["miss_intra"] < 0.02
    assert res["miss_both"] < 0.02


def test_outer_check_mof_narrow_fold_collides():
    """Randomizing an element collides with prob ~1/M: visible at k=4
    (M=17): miss ~ 1/17 ~ 0.06."""
    res = outer_check_campaign(4, "MOF1", trials=2000, qbits=37, vec_len=256)
    assert 0.01 < res["miss_intra"] < 0.15


def test_outer_check_all_modes_run():
    from rfhe_tpu.faults.reduction_campaigns import OUTER_MODES
    for mode in OUTER_MODES:
        res = outer_check_campaign(8, mode, trials=100, qbits=20, vec_len=64)
        assert 0.0 <= res["miss_both"] <= 1.0, mode
