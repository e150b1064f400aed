import random

import pytest

from rfhe_tpu import numth


def test_is_prime_small():
    primes = {2, 3, 5, 7, 11, 13, 97, 7681, 12289, 998244353}
    for p in primes:
        assert numth.is_prime(p)
    for c in [1, 4, 9, 15, 91, 7680, 998244351]:
        assert not numth.is_prime(c)


def test_find_ntt_prime():
    q = numth.find_ntt_prime(4096, 30)
    assert numth.is_prime(q)
    assert q < (1 << 30)
    assert (q - 1) % 8192 == 0


def test_find_prime_with_bitlen():
    rng = random.Random(42)
    for bits in (10, 30, 37, 50):
        p = numth.find_prime_with_bitlen(bits, rng)
        assert numth.is_prime(p)
        assert p.bit_length() == bits


def test_root_of_unity_and_psi():
    q = numth.find_ntt_prime(64, 20)
    w = numth.root_of_unity(64, q)
    assert pow(w, 64, q) == 1
    assert pow(w, 32, q) != 1
    psi = numth.psi_negacyclic(64, q)
    assert pow(psi, 64, q) == q - 1
    assert (psi * psi) % q == pow(psi, 2, q)


def test_barrett_constants():
    q = numth.find_prime_with_bitlen(37, random.Random(1))
    mu, k = numth.barrett_constants(q)
    assert k == 37
    assert mu == (1 << (2 * k)) // q
    # Barrett reduces correctly for x < q^2
    from rfhe_tpu.oracle import barrett_reduce
    rng = random.Random(2)
    for _ in range(200):
        x = rng.randrange(q * q)
        assert barrett_reduce(x, q, mu, k) == x % q


def test_montgomery_constants():
    q = numth.find_ntt_prime(64, 30)
    R, qinv_neg, r2 = numth.montgomery_constants(q, 32)
    assert (q * (R - numth.mod_inv(q, R))) % R == qinv_neg * q % R
    assert ((-q * qinv_neg) % R) == R - 1 or (q * qinv_neg) % R == R - 1
    assert r2 == (R * R) % q
    from rfhe_tpu.oracle import montgomery_reduce
    rng = random.Random(3)
    for _ in range(200):
        a, b = rng.randrange(q), rng.randrange(q)
        # REDC(a*b) == a*b*R^{-1}
        got = montgomery_reduce(a * b, q, 32, qinv_neg)
        assert got == (a * b * numth.mod_inv(R, q)) % q


def test_shoup():
    q = numth.find_ntt_prime(64, 30)
    rng = random.Random(4)
    for _ in range(100):
        w = rng.randrange(q)
        ws = numth.shoup_precompute(w, q)
        x = rng.randrange(q)
        hi = (x * ws) >> 32
        r = (x * w - hi * q) % (1 << 32)
        if r >= q:
            r -= q
        assert r == (x * w) % q


def test_crt_constants_roundtrip():
    rng = random.Random(5)
    moduli = numth.generate_crt_primes(4, 20, rng)
    P, hat_p, inv_hat_p = numth.crt_constants(moduli)
    x = rng.randrange(P)
    residues = [x % p for p in moduli]
    # Garner-style reconstruction via hat/inv_hat
    recon = sum(r * h * ih for r, h, ih in zip(residues, hat_p, inv_hat_p)) % P
    assert recon == x


def test_prime_ctx():
    ctx = numth.PrimeCtx.make(numth.find_ntt_prime(256, 30), 256)
    assert pow(ctx.psi, 256, ctx.q) == ctx.q - 1
    assert (ctx.n_inv * 256) % ctx.q == 1
