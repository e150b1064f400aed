import numpy as np
import jax
import jax.numpy as jnp

from rfhe_tpu import numth, oracle
from rfhe_tpu.ops import ntt_pease
from rfhe_tpu.ops.u32 import from_mont, mul_mod_shoup

N = 64
PRIMES = numth.find_ntt_primes(N, 28, 3)
PLAN = ntt_pease.PeaseNttPlan.make(N, PRIMES)


def test_forward_matches_oracle(rng):
    x = np.stack([rng.integers(0, q, N, dtype=np.uint32) for q in PRIMES])
    got = np.asarray(ntt_pease.ntt(jnp.asarray(x), PLAN))
    for li, q in enumerate(PRIMES):
        omega = numth.PrimeCtx.make(q, N).omega
        expect = np.array(oracle.ntt(list(map(int, x[li])), omega, q),
                          dtype=np.uint32)
        np.testing.assert_array_equal(got[li], expect[PLAN.nu])


def test_roundtrip(rng):
    x = np.stack([rng.integers(0, q, N, dtype=np.uint32) for q in PRIMES])
    y = ntt_pease.negacyclic_ntt(jnp.asarray(x), PLAN)
    back = np.asarray(ntt_pease.negacyclic_intt(y, PLAN))
    np.testing.assert_array_equal(back, x)


def test_negacyclic_matches_oracle(rng):
    x = np.stack([rng.integers(0, q, N, dtype=np.uint32) for q in PRIMES])
    y = ntt_pease.negacyclic_ntt(jnp.asarray(x), PLAN)
    y_norm = np.asarray(from_mont(y, PLAN.qb(1), PLAN.qinvb(1)))
    for li, q in enumerate(PRIMES):
        psi = numth.PrimeCtx.make(q, N).psi
        expect = np.array(oracle.negacyclic_ntt(list(map(int, x[li])), psi, q),
                          dtype=np.uint32)
        np.testing.assert_array_equal(y_norm[li], expect[PLAN.nu])


def test_polymul(rng):
    from rfhe_tpu.ops.u32 import mont_mul
    a = np.stack([rng.integers(0, q, N, dtype=np.uint32) for q in PRIMES])
    b = np.stack([rng.integers(0, q, N, dtype=np.uint32) for q in PRIMES])
    A = ntt_pease.negacyclic_ntt(jnp.asarray(a), PLAN)
    B = ntt_pease.negacyclic_ntt(jnp.asarray(b), PLAN)
    C = mont_mul(A, B, PLAN.qb(1), PLAN.qinvb(1))
    got = np.asarray(ntt_pease.negacyclic_intt(C, PLAN))
    for li, q in enumerate(PRIMES):
        psi = numth.PrimeCtx.make(q, N).psi
        expect = np.array(
            oracle.poly_mul_negacyclic(list(map(int, a[li])),
                                       list(map(int, b[li])), psi, q),
            dtype=np.uint32)
        np.testing.assert_array_equal(got[li], expect)


def test_large_n(rng):
    n = 1024
    primes = numth.find_ntt_primes(n, 30, 2)
    plan = ntt_pease.PeaseNttPlan.make(n, primes)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in primes])
    y = jax.jit(lambda v: ntt_pease.negacyclic_ntt(v, plan))(jnp.asarray(x))
    back = np.asarray(jax.jit(
        lambda v: ntt_pease.negacyclic_intt(v, plan))(y))
    np.testing.assert_array_equal(back, x)


def test_batched(rng):
    x = np.stack([
        np.stack([rng.integers(0, q, N, dtype=np.uint32) for q in PRIMES])
        for _ in range(4)])
    y = ntt_pease.negacyclic_ntt(jnp.asarray(x), PLAN)
    back = np.asarray(ntt_pease.negacyclic_intt(y, PLAN))
    np.testing.assert_array_equal(back, x)
