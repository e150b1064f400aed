"""Fused Pallas NTT/INTT vs the XLA Pease path (interpret mode on CPU;
the same kernels compile via Mosaic on TPU — exercised by bench/verify)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rfhe_tpu import numth
from rfhe_tpu.ops import ntt_pease, pallas_ntt


@pytest.mark.parametrize("n,L,B", [(256, 2, 1), (512, 3, 2)])
def test_pallas_fwd_matches_pease(n, L, B, rng):
    primes = numth.find_ntt_primes(n, 28, L, negacyclic=True)
    pplan = pallas_ntt.PallasNttPlan.make(n, primes)
    xplan = ntt_pease.PeaseNttPlan.make(n, primes)
    x = jnp.asarray(rng.integers(0, min(primes), (B, L, n), dtype=np.uint32))
    y = pallas_ntt.negacyclic_ntt(x, pplan, interpret=True)
    ref = ntt_pease.negacyclic_ntt(x, xplan)
    assert np.array_equal(np.asarray(y), np.asarray(ref))


def test_pallas_fwd_wide_prime(rng):
    """31-bit primes exercise the full digit count."""
    n, L = 256, 2
    primes = numth.find_ntt_primes(n, 31, L, negacyclic=True)
    pplan = pallas_ntt.PallasNttPlan.make(n, primes)
    xplan = ntt_pease.PeaseNttPlan.make(n, primes)
    x = jnp.asarray(rng.integers(0, min(primes), (1, L, n), dtype=np.uint32))
    y = pallas_ntt.negacyclic_ntt(x, pplan, interpret=True)
    ref = ntt_pease.negacyclic_ntt(x, xplan)
    assert np.array_equal(np.asarray(y), np.asarray(ref))


@pytest.mark.parametrize("n,L", [(256, 2), (512, 3)])
def test_pallas_roundtrip(n, L, rng):
    primes = numth.find_ntt_primes(n, 28, L, negacyclic=True)
    pplan = pallas_ntt.PallasNttPlan.make(n, primes)
    x = jnp.asarray(rng.integers(0, min(primes), (2, L, n), dtype=np.uint32))
    y = pallas_ntt.negacyclic_ntt(x, pplan, interpret=True)
    back = pallas_ntt.negacyclic_intt(y, pplan, interpret=True)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_pallas_limb_padding(rng):
    """L not a multiple of the limb block: padded path stays bit-exact."""
    n, L = 256, 5
    primes = numth.find_ntt_primes(n, 28, L, negacyclic=True)
    pplan = pallas_ntt.PallasNttPlan.make(n, primes)
    xplan = ntt_pease.PeaseNttPlan.make(n, primes)
    x = jnp.asarray(rng.integers(0, min(primes), (1, L, n), dtype=np.uint32))
    import rfhe_tpu.ops.pallas_ntt as m
    orig = m._limb_block
    m._limb_block = lambda L_, n_: 2 if L_ == 5 else orig(L_, n_)
    try:
        xp, plan2, L0 = m._pad_limbs(x, pplan, 2)
        assert xp.shape[1] == 6 and L0 == 5
        y = pallas_ntt.negacyclic_ntt(x, pplan, interpret=True)
    finally:
        m._limb_block = orig
    ref = ntt_pease.negacyclic_ntt(x, xplan)
    assert np.array_equal(np.asarray(y), np.asarray(ref))
