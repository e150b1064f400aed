import random

import numpy as np
import jax
import jax.numpy as jnp

from rfhe_tpu import numth, oracle
from rfhe_tpu.ops.modring import ModArith, sum_mod
from rfhe_tpu.ops.matmul_mod import DigitPlan, matmul_mod
from rfhe_tpu.ops.u32 import mul32_parts
from rfhe_tpu.protect import (
    fold_u32, fold_u64, fold_2s1_u32, fold_2s1_u64,
    matmul_check, elementwise_fold_check,
    stage1_projection_check, stage2_projection_check, twiddle_inter_check,
    intra_fold_product_check, barrett_range_protected,
    baseconv_append_checksum, baseconv_ecc_check,
)
from rfhe_tpu.transform import FourStepPlan, four_step_ntt_stages

Q = numth.find_ntt_prime(64, 20)
ARITH = ModArith.make(Q)


def test_sum_mod(rng):
    x = rng.integers(0, Q, size=(5, 37), dtype=np.uint32)
    got = np.asarray(sum_mod(jnp.asarray(x), Q, axis=-1))
    np.testing.assert_array_equal(got, x.astype(np.uint64).sum(axis=-1) % Q)


def test_folds_match_oracle(rng):
    x = rng.integers(0, 1 << 32, size=500, dtype=np.uint64).astype(np.uint32)
    for w in (2, 4, 8, 13, 24):
        got = np.asarray(fold_u32(jnp.asarray(x), w))
        expect = x.astype(np.uint64) % ((1 << w) - 1)
        np.testing.assert_array_equal(got.astype(np.uint64), expect)
        got = np.asarray(fold_2s1_u32(jnp.asarray(x), w))
        expect = x.astype(np.uint64) % ((1 << w) + 1)
        np.testing.assert_array_equal(got.astype(np.uint64), expect)


def test_folds_u64(rng):
    v = rng.integers(0, 1 << 63, size=500, dtype=np.uint64)
    hi = (v >> 32).astype(np.uint32)
    lo = (v & 0xFFFFFFFF).astype(np.uint32)
    for w in (3, 8, 17, 24):
        got = np.asarray(fold_u64(jnp.asarray(hi), jnp.asarray(lo), w))
        np.testing.assert_array_equal(
            got.astype(np.uint64), v % np.uint64((1 << w) - 1))
        got = np.asarray(fold_2s1_u64(jnp.asarray(hi), jnp.asarray(lo), w))
        np.testing.assert_array_equal(
            got.astype(np.uint64), v % np.uint64((1 << w) + 1))


def test_matmul_check_clean_and_faulty(rng):
    plan = DigitPlan.make(Q, ARITH.qinv_neg)
    A = rng.integers(0, Q, size=(8, 8), dtype=np.uint32)
    B = rng.integers(0, Q, size=(8, 8), dtype=np.uint32)
    C = matmul_mod(jnp.asarray(A), jnp.asarray(B), plan)
    assert bool(matmul_check(jnp.asarray(A), jnp.asarray(B), C, ARITH))
    # additive fault is always caught (delta != 0 mod q)
    Cf = C.at[3, 4].set((int(C[3, 4]) + 7) % Q)
    assert not bool(matmul_check(jnp.asarray(A), jnp.asarray(B), Cf, ARITH))


def test_elementwise_fold_check(rng):
    w = 8
    M = (1 << w) - 1
    X = rng.integers(0, M, size=64, dtype=np.uint32)
    T = rng.integers(0, M, size=64, dtype=np.uint32)
    Y = (X.astype(np.uint64) * T) % M
    Y = Y.astype(np.uint32)
    assert bool(elementwise_fold_check(jnp.asarray(X), jnp.asarray(T),
                                       jnp.asarray(Y), w))
    Yf = Y.copy()
    Yf[10] ^= 1
    assert not bool(elementwise_fold_check(jnp.asarray(X), jnp.asarray(T),
                                           jnp.asarray(Yf), w))


def test_four_step_projections_clean(rng):
    plan = FourStepPlan.make(64, Q)
    a = rng.integers(0, Q, size=64, dtype=np.uint32)
    A, B1, B2, Y = four_step_ntt_stages(jnp.asarray(a), plan)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    assert bool(stage1_projection_check(A, B1, plan.W2, plan.digit, plan.arith, k1))
    assert bool(twiddle_inter_check(B1, B2, plan.T, plan.arith, k2))
    assert bool(stage2_projection_check(B2, Y, plan.W1T, plan.digit, plan.arith, k3))


def test_four_step_projections_catch_faults(rng):
    plan = FourStepPlan.make(64, Q)
    a = rng.integers(0, Q, size=64, dtype=np.uint32)
    A, B1, B2, Y = four_step_ntt_stages(jnp.asarray(a), plan)
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    B1f = B1.at[2, 3].set((int(B1[2, 3]) + 5) % Q)
    assert not bool(stage1_projection_check(A, B1f, plan.W2, plan.digit, plan.arith, k1))
    B2f = B2.at[1, 1].set((int(B2[1, 1]) + 9) % Q)
    assert not bool(twiddle_inter_check(B1, B2f, plan.T, plan.arith, k2))
    Yf = Y.at[0, 5].set((int(Y[0, 5]) + 3) % Q)
    assert not bool(stage2_projection_check(B2, Yf, plan.W1T, plan.digit, plan.arith, k3))


def test_intra_fold_product_check(rng):
    s = 8
    a = rng.integers(0, Q, size=128, dtype=np.uint32)
    b = rng.integers(0, Q, size=128, dtype=np.uint32)
    hi, lo = mul32_parts(jnp.asarray(a), jnp.asarray(b))
    ok = np.asarray(intra_fold_product_check(jnp.asarray(a), jnp.asarray(b), hi, lo, s))
    assert ok.all()
    # corrupt one product
    lo_f = np.asarray(lo).copy()
    lo_f[7] ^= 1
    ok = np.asarray(intra_fold_product_check(
        jnp.asarray(a), jnp.asarray(b), hi, jnp.asarray(lo_f), s))
    assert not ok[7]
    assert ok[:7].all() and ok[8:].all()


def test_barrett_range_protected(rng):
    q = numth.find_prime_with_bitlen(30, random.Random(9))
    mu, k = numth.barrett_constants(q)
    a = rng.integers(0, q, size=200, dtype=np.uint64)
    b = rng.integers(0, q, size=200, dtype=np.uint64)
    x = a * b
    hi = (x >> 32).astype(np.uint32)
    lo = (x & 0xFFFFFFFF).astype(np.uint32)
    red, ok = barrett_range_protected(jnp.asarray(hi), jnp.asarray(lo), q, mu, k)
    np.testing.assert_array_equal(np.asarray(red).astype(np.uint64), x % q)
    assert np.asarray(ok).all()
    # corrupt the input high limb: range window should trip for most elements
    hi_f = hi.copy()
    hi_f[0] ^= 1 << 20
    red, ok = barrett_range_protected(jnp.asarray(hi_f), jnp.asarray(lo), q, mu, k)
    # corrupted x still reduces consistently; the check validates internal
    # faults, not input faults -- just ensure shape/type sanity here
    assert np.asarray(ok).shape == (200,)


def test_baseconv_ecc(rng):
    r = random.Random(20)
    moduli_in = numth.generate_crt_primes(4, 12, r)
    # grouped output moduli (products of input groups) -- the setting in which
    # the appended-sum ECC invariant holds (baseConv.py main: group_multiply)
    moduli_out = [moduli_in[0] * moduli_in[1], moduli_in[2] * moduli_in[3]]
    from rfhe_tpu.ops.baseconv import BaseConvPlan, base_conv
    plan = BaseConvPlan.make(moduli_in, moduli_out)
    res = np.stack([rng.integers(0, p, size=32, dtype=np.uint32) for p in moduli_in])
    with_ecc = baseconv_append_checksum(jnp.asarray(res), moduli_in)
    out = base_conv(with_ecc, plan)
    assert bool(baseconv_ecc_check(out, moduli_out))
    # corrupt one residue AFTER checksum: detection
    bad = np.asarray(with_ecc).copy()
    bad[1, 5] ^= 4
    out = base_conv(jnp.asarray(bad), plan)
    assert not bool(baseconv_ecc_check(out, moduli_out))
