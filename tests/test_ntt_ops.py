import numpy as np
import jax
import jax.numpy as jnp

from rfhe_tpu import numth, oracle
from rfhe_tpu.ops.ntt import (
    NttPlan,
    bit_reverse_indices,
    ntt,
    intt,
    negacyclic_ntt,
    negacyclic_intt,
    poly_mul_negacyclic,
)
from rfhe_tpu.ops.u32 import to_mont, from_mont

N = 64
Q = numth.find_ntt_prime(N, 30)
PLAN = NttPlan.make(N, Q)


def test_ntt_matches_oracle_bitrev(rng):
    a = rng.integers(0, Q, size=N, dtype=np.uint32)
    got = np.asarray(ntt(jnp.asarray(a), PLAN))
    expect = np.array(oracle.ntt(list(map(int, a)), PLAN.ctx.omega, Q), dtype=np.uint32)
    rev = bit_reverse_indices(N)
    np.testing.assert_array_equal(got, expect[rev])


def test_intt_roundtrip(rng):
    a = rng.integers(0, Q, size=(5, N), dtype=np.uint32)
    y = ntt(jnp.asarray(a), PLAN)
    # intt leaves factor n; remove with explicit n_inv multiply
    back = intt(y, PLAN)
    n_inv = numth.mod_inv(N, Q)
    from rfhe_tpu.ops.u32 import mul_mod_shoup
    back = mul_mod_shoup(back, n_inv, numth.shoup_precompute(n_inv, Q), Q)
    np.testing.assert_array_equal(np.asarray(back), a)


def test_negacyclic_roundtrip(rng):
    a = rng.integers(0, Q, size=(3, N), dtype=np.uint32)
    y = negacyclic_ntt(jnp.asarray(a), PLAN)
    back = np.asarray(negacyclic_intt(y, PLAN))
    np.testing.assert_array_equal(back, a)


def test_negacyclic_matches_oracle(rng):
    a = rng.integers(0, Q, size=N, dtype=np.uint32)
    y = negacyclic_ntt(jnp.asarray(a), PLAN)
    # output is Montgomery-domain + bit-reversed
    y_norm = np.asarray(from_mont(y, Q, PLAN.ctx.qinv_neg))
    expect = np.array(
        oracle.negacyclic_ntt(list(map(int, a)), PLAN.ctx.psi, Q), dtype=np.uint32)
    rev = bit_reverse_indices(N)
    np.testing.assert_array_equal(y_norm, expect[rev])


def test_polymul_matches_oracle(rng):
    a = rng.integers(0, Q, size=N, dtype=np.uint32)
    b = rng.integers(0, Q, size=N, dtype=np.uint32)
    got = np.asarray(poly_mul_negacyclic(jnp.asarray(a), jnp.asarray(b), PLAN))
    expect = np.array(
        oracle.poly_mul_negacyclic(list(map(int, a)), list(map(int, b)),
                                   PLAN.ctx.psi, Q),
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(got, expect)


def test_polymul_large_n(rng):
    n, q = 4096, numth.find_ntt_prime(4096, 30)
    plan = NttPlan.make(n, q)
    a = rng.integers(0, q, size=n, dtype=np.uint32)
    b = rng.integers(0, q, size=n, dtype=np.uint32)
    got = np.asarray(jax.jit(
        lambda x, y: poly_mul_negacyclic(x, y, plan))(jnp.asarray(a), jnp.asarray(b)))
    # check against NTT-based oracle (naive would be too slow)
    expect = np.array(
        oracle.poly_mul_negacyclic(list(map(int, a)), list(map(int, b)),
                                   plan.ctx.psi, q),
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(got, expect)


def test_batched_ntt(rng):
    a = rng.integers(0, Q, size=(4, 3, N), dtype=np.uint32)
    got = np.asarray(ntt(jnp.asarray(a), PLAN))
    rev = bit_reverse_indices(N)
    for i in range(4):
        for j in range(3):
            expect = np.array(
                oracle.ntt(list(map(int, a[i, j])), PLAN.ctx.omega, Q),
                dtype=np.uint32)
            np.testing.assert_array_equal(got[i, j], expect[rev])
