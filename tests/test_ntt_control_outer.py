import jax
import jax.numpy as jnp
import numpy as np

from rfhe_tpu import numth
from rfhe_tpu.faults.ntt_control import (
    KIND_DELTA, KIND_MLF, SCENARIOS, lazy_num_buckets, ntt_standard_lazy,
    standard_ntt_campaign)
from rfhe_tpu.faults.reduction_campaigns import outer_check_campaign
from rfhe_tpu.ops.ntt import NttPlan, ntt


def test_lazy_checker_clean_passes_and_matches_ntt():
    """No faults: lazy verify passes and output is bit-identical to ntt()."""
    n, qbits = 64, 12
    q = numth.find_ntt_prime(n, qbits, negacyclic=False)
    plan = NttPlan.make(n, q)
    x = jnp.asarray(np.random.default_rng(0).integers(0, q, n,
                                                      dtype=np.uint32))
    y, ok = ntt_standard_lazy(x, plan, jax.random.PRNGKey(0))
    assert bool(ok)
    assert np.array_equal(np.asarray(y), np.asarray(ntt(x, plan)))


def test_lazy_checker_single_mult_fault_always_fires():
    """A single injected-at-multiply fault desynchronizes its bucket by
    δ ≢ 0 mod q: the computed verify must fail whenever the value changed."""
    n, q = 64, 769
    plan = NttPlan.make(n, q)
    rng = np.random.default_rng(1)
    total_ops = (n // 2) * (n.bit_length() - 1)
    fired = 0
    for t in range(20):
        x = jnp.asarray(rng.integers(0, q, n, dtype=np.uint32))
        op = int(rng.integers(0, total_ops))
        y, ok = ntt_standard_lazy(
            x, plan, jax.random.PRNGKey(t),
            mult_ops=jnp.asarray([op]),
            mult_kinds=jnp.asarray([KIND_MLF]))
        harmful = not np.array_equal(np.asarray(y), np.asarray(ntt(x, plan)))
        if harmful:
            assert not bool(ok), f"lazy checker missed a mult fault at op {op}"
            fired += 1
    assert fired > 10  # MLF rarely no-ops (prob 1/q)


def test_lazy_checker_bucket_cancellation_is_missed():
    """Two +δ/−δ faults in the SAME bucket cancel in the bucket sum: the lazy
    checker must pass (proving detection comes from computed bucket state,
    not a hardcoded flag) even though the output is corrupted.  The global
    ABFT projection is what catches this case (with prob 1−1/q)."""
    n, q = 64, 769
    plan = NttPlan.make(n, q)
    B = lazy_num_buckets(n)
    x = jnp.asarray(np.random.default_rng(2).integers(0, q, n,
                                                      dtype=np.uint32))
    delta = 123
    # same stage (stage 0), ops 0 and B -> same bucket (op % B == 0)
    y, ok = ntt_standard_lazy(
        x, plan, jax.random.PRNGKey(0),
        mult_ops=jnp.asarray([0, B]),
        mult_kinds=jnp.asarray([KIND_DELTA, KIND_DELTA]),
        mult_deltas=jnp.asarray([delta, q - delta], dtype=jnp.uint32))
    assert not np.array_equal(np.asarray(y), np.asarray(ntt(x, plan)))
    assert bool(ok), "cancelling deltas in one bucket must evade the checker"
    # different buckets: the same pair of deltas is caught
    y2, ok2 = ntt_standard_lazy(
        x, plan, jax.random.PRNGKey(0),
        mult_ops=jnp.asarray([0, 1]),
        mult_kinds=jnp.asarray([KIND_DELTA, KIND_DELTA]),
        mult_deltas=jnp.asarray([delta, q - delta], dtype=jnp.uint32))
    assert not bool(ok2)


def test_standard_ntt_multifault_scenarios_run():
    """The reference's scenario table (SBF..MLF+MLF) all run; mult-target
    detection stays near 1 (bucket collisions need same-bucket cancellation)."""
    q = numth.find_ntt_prime(64, 12, negacyclic=False)
    for sc in SCENARIOS:
        res = standard_ntt_campaign(sc, "mult", trials=60, n=64, q=q, seed=5)
        assert 0.0 <= res["miss_rate"] <= 0.1, (sc, res)


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
