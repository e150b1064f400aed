import random

from rfhe_tpu import numth
from rfhe_tpu import oracle


def test_ntt_intt_roundtrip():
    n = 64
    q = numth.find_ntt_prime(n, 20)
    w = numth.root_of_unity(n, q)
    rng = random.Random(0)
    a = [rng.randrange(q) for _ in range(n)]
    assert oracle.intt(oracle.ntt(a, w, q), w, q) == a


def test_ntt_matches_direct():
    n = 32
    q = numth.find_ntt_prime(n, 20)
    w = numth.root_of_unity(n, q)
    rng = random.Random(1)
    a = [rng.randrange(q) for _ in range(n)]
    assert oracle.ntt(a, w, q) == oracle.ntt_direct(a, w, q)


def test_four_step_matches_direct():
    for n in (16, 64, 128):  # square and non-square splits
        q = numth.find_ntt_prime(n, 20)
        w = numth.root_of_unity(n, q)
        rng = random.Random(n)
        a = [rng.randrange(q) for _ in range(n)]
        assert oracle.four_step_ntt(a, w, q) == oracle.ntt_direct(a, w, q)


def test_negacyclic_polymul_matches_naive():
    n = 32
    q = numth.find_ntt_prime(n, 20, negacyclic=True)
    psi = numth.psi_negacyclic(n, q)
    rng = random.Random(2)
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    assert oracle.poly_mul_negacyclic(a, b, psi, q) == \
        oracle.poly_mul_negacyclic_naive(a, b, q)


def test_negacyclic_roundtrip():
    n = 64
    q = numth.find_ntt_prime(n, 25)
    psi = numth.psi_negacyclic(n, q)
    rng = random.Random(3)
    a = [rng.randrange(q) for _ in range(n)]
    assert oracle.negacyclic_intt(oracle.negacyclic_ntt(a, psi, q), psi, q) == a


def test_fold_mod():
    # fold mod 2^w - 1 is congruence: fold(x) == x mod (2^w - 1)
    rng = random.Random(4)
    for w in (4, 8, 24):
        M = (1 << w) - 1
        for _ in range(50):
            x = rng.getrandbits(100)
            assert oracle.fold_mod(x, w) == x % M
    # alternating fold mod 2^s + 1
    for s in (4, 8, 24):
        M = (1 << s) + 1
        for _ in range(50):
            x = rng.getrandbits(100)
            assert oracle.fold_mod_2s1(x, s) == x % M


def test_base_conv_exact():
    rng = random.Random(5)
    moduli = numth.generate_crt_primes(4, 12, rng)
    from math import prod
    P = prod(moduli)
    moduli_out = numth.generate_crt_primes(2, 20, rng)
    xs = [rng.randrange(P) for _ in range(8)]
    residues = [[x % p for x in xs] for p in moduli]
    out = oracle.base_conv(residues, moduli, moduli_out)
    # unreduced interpolation equals x + e*P for small integer e; mod q_out it
    # equals (x + e*P) mod q -- check exact CRT value including the P-overflow
    # term as the reference formulation produces (baseConv.py:27-38).
    _, hat_p, inv_hat_p = numth.crt_constants(moduli)
    for i, x in enumerate(xs):
        v = sum((x % p) * h * ih for p, h, ih in zip(moduli, hat_p, inv_hat_p))
        for k, qk in enumerate(moduli_out):
            expect = sum(
                (x % moduli[j]) * ((hat_p[j] * inv_hat_p[j]) % qk)
                for j in range(len(moduli))
            ) % qk
            assert out[i][k] == expect
        assert v % P == x
