import numpy as np
import jax
import jax.numpy as jnp

from rfhe_tpu import numth
from rfhe_tpu.ops import u32

Q30 = numth.find_ntt_prime(4096, 30)
Q31 = numth.next_prime_ge((1 << 31) - 1000)  # largest-ish odd prime < 2^31
if Q31 >= (1 << 31):
    Q31 = 2147483629  # known prime < 2^31


def _rand_u32(rng, n, lim):
    return rng.integers(0, lim, size=n, dtype=np.uint32)


def test_mul32_parts(rng):
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    hi, lo = jax.jit(u32.mul32_parts)(jnp.asarray(a), jnp.asarray(b))
    full = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(hi, dtype=np.uint64), full >> 32)
    np.testing.assert_array_equal(np.asarray(lo, dtype=np.uint64), full & 0xFFFFFFFF)


def test_add_sub_neg_mod(rng):
    for q in (Q30, Q31):
        a = _rand_u32(rng, 1000, q)
        b = _rand_u32(rng, 1000, q)
        got = np.asarray(u32.add_mod(jnp.asarray(a), jnp.asarray(b), q))
        np.testing.assert_array_equal(got, (a.astype(np.uint64) + b) % q)
        got = np.asarray(u32.sub_mod(jnp.asarray(a), jnp.asarray(b), q))
        np.testing.assert_array_equal(
            got, (a.astype(np.int64) - b.astype(np.int64)) % q)
        got = np.asarray(u32.neg_mod(jnp.asarray(a), q))
        np.testing.assert_array_equal(got, (-a.astype(np.int64)) % q)


def test_mont_mul_and_domain(rng):
    for q in (Q30, Q31):
        _, qinv_neg, r2 = numth.montgomery_constants(q, 32)
        a = _rand_u32(rng, 1000, q)
        b = _rand_u32(rng, 1000, q)
        rinv = numth.mod_inv(1 << 32, q)
        got = np.asarray(u32.mont_mul(jnp.asarray(a), jnp.asarray(b), q, qinv_neg))
        expect = (a.astype(object) * b.astype(object) * rinv) % q
        np.testing.assert_array_equal(got.astype(object), expect)
        # full mul_mod
        got = np.asarray(u32.mul_mod(jnp.asarray(a), jnp.asarray(b), q, qinv_neg, r2))
        np.testing.assert_array_equal(
            got.astype(object), (a.astype(object) * b.astype(object)) % q)
        # to_mont / from_mont roundtrip
        am = u32.to_mont(jnp.asarray(a), q, qinv_neg, r2)
        back = np.asarray(u32.from_mont(am, q, qinv_neg))
        np.testing.assert_array_equal(back, a)


def test_mont_mul_vectorized_moduli(rng):
    """mont_mul with per-element modulus arrays (the baseconv path)."""
    qs = np.array([Q30, Q31, 998244353, 1004535809], dtype=np.uint32)
    qinvs = np.array(
        [numth.montgomery_constants(int(q), 32)[1] for q in qs], dtype=np.uint32)
    a = np.array([rng.integers(0, int(q)) for q in qs], dtype=np.uint32)
    b = np.array([rng.integers(0, int(q)) for q in qs], dtype=np.uint32)
    got = np.asarray(u32.mont_mul(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(qs), jnp.asarray(qinvs)))
    for i, q in enumerate(qs):
        rinv = numth.mod_inv(1 << 32, int(q))
        assert int(got[i]) == (int(a[i]) * int(b[i]) * rinv) % int(q)


def test_shoup_mul(rng):
    for q in (Q30, Q31):
        w = int(rng.integers(0, q))
        ws = numth.shoup_precompute(w, q)
        x = _rand_u32(rng, 1000, q)
        got = np.asarray(u32.mul_mod_shoup(jnp.asarray(x), w, ws, q))
        np.testing.assert_array_equal(
            got.astype(object), (x.astype(object) * w) % q)


def test_pow_mod(rng):
    q = Q30
    _, qinv_neg, r2 = numth.montgomery_constants(q, 32)
    base = _rand_u32(rng, 100, q)
    for e in (0, 1, 5, 1023):
        got = np.asarray(u32.pow_mod(jnp.asarray(base), e, q, qinv_neg, r2))
        expect = np.array([pow(int(x), e, q) for x in base], dtype=np.uint32)
        np.testing.assert_array_equal(got, expect)


def test_barrett_reduce64(rng):
    for q in (Q30, Q31, numth.find_prime_with_bitlen(20, __import__("random").Random(7))):
        mu, k = numth.barrett_constants(q)
        x = rng.integers(0, int(q) * int(q), size=1000, dtype=np.uint64)
        hi = (x >> 32).astype(np.uint32)
        lo = (x & 0xFFFFFFFF).astype(np.uint32)
        got = np.asarray(u32.barrett_reduce64(jnp.asarray(hi), jnp.asarray(lo), q, mu, k))
        np.testing.assert_array_equal(got.astype(np.uint64), x % q)
