"""Golden NTT models over Python ints.

Semantics match the reference's dependency-light Python models
(rfhe_framewk/src/ntt.py:38-62, negaclic_ntt.py:86-109,
reliability_test/four_step_ntt_prot.py:49-109) but are written fresh as a
single coherent module: forward NTT computes y_k = Σ_t a_t ω^{kt} (mod q).
"""
from __future__ import annotations

import math
from typing import List, Sequence

from ..numth import mod_inv, root_of_unity


def ntt(a: Sequence[int], omega: int, q: int) -> List[int]:
    """Iterative radix-2 Cooley-Tukey NTT, natural order in and out.

    `omega` must be a primitive n-th root of unity mod q.
    """
    n = len(a)
    assert n & (n - 1) == 0, "n must be a power of two"
    A = [x % q for x in a]
    # bit-reverse permutation
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j ^= bit
        if i < j:
            A[i], A[j] = A[j], A[i]
    length = 2
    while length <= n:
        wlen = pow(omega, n // length, q)
        half = length // 2
        for start in range(0, n, length):
            w = 1
            for j in range(start, start + half):
                u = A[j]
                v = (A[j + half] * w) % q
                A[j] = (u + v) % q
                A[j + half] = (u - v) % q
                w = (w * wlen) % q
        length <<= 1
    return A


def intt(A: Sequence[int], omega: int, q: int) -> List[int]:
    """Inverse of `ntt` (same omega), including the 1/n scaling."""
    n = len(A)
    a = ntt(A, mod_inv(omega, q), q)
    n_inv = mod_inv(n, q)
    return [(x * n_inv) % q for x in a]


def ntt_direct(a: Sequence[int], omega: int, q: int) -> List[int]:
    """Dense O(n^2) NTT: the ultimate ground truth."""
    n = len(a)
    return [
        sum(a[t] * pow(omega, (k * t) % n, q) for t in range(n)) % q
        for k in range(n)
    ]


def four_step_ntt(a: Sequence[int], omega: int, q: int) -> List[int]:
    """Four-step factorization: N = n1*n2 (square when possible).

    Layout (matches four_step_ntt_prot.py:71-109 math):
      A[t2][t1] = a[t1 + n1*t2]
      stage 1: n2-point NTT along t2 per column t1 (root omega^n1)
      twiddle: *= omega^(t1*k2)
      stage 2: n1-point NTT along t1 per row k2 (root omega^n2)
      y[k1*n2 + k2] = Y[k2][k1]
    """
    n = len(a)
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)      # n1 <= n2; square split when log_n is even
    n2 = n // n1
    assert n1 * n2 == n
    w_n1 = pow(omega, n1, q)  # order n2
    w_n2 = pow(omega, n2, q)  # order n1

    A = [[a[t1 + n1 * t2] % q for t1 in range(n1)] for t2 in range(n2)]
    # stage 1: column NTTs (along t2)
    B = [[0] * n1 for _ in range(n2)]
    for t1 in range(n1):
        col = ntt([A[t2][t1] for t2 in range(n2)], w_n1, q)
        for k2 in range(n2):
            B[k2][t1] = col[k2]
    # twiddle
    for k2 in range(n2):
        for t1 in range(n1):
            B[k2][t1] = (B[k2][t1] * pow(omega, (t1 * k2) % n, q)) % q
    # stage 2: row NTTs (along t1)
    Y = [[0] * n1 for _ in range(n2)]
    for k2 in range(n2):
        Y[k2] = ntt(B[k2], w_n2, q)
    out = [0] * n
    for k1 in range(n1):
        for k2 in range(n2):
            out[k1 * n2 + k2] = Y[k2][k1]
    return out


def negacyclic_ntt(a: Sequence[int], psi: int, q: int) -> List[int]:
    """DWT-style negacyclic NTT: premultiply by psi^i, then cyclic NTT with psi^2
    (negaclic_ntt.py:86-92)."""
    n = len(a)
    a_pw = [(a[i] * pow(psi, i, q)) % q for i in range(n)]
    return ntt(a_pw, (psi * psi) % q, q)


def negacyclic_intt(A: Sequence[int], psi: int, q: int) -> List[int]:
    n = len(A)
    inv = intt(A, (psi * psi) % q, q)
    psi_inv = mod_inv(psi, q)
    return [(inv[i] * pow(psi_inv, i, q)) % q for i in range(n)]


def poly_mul_negacyclic_naive(a: Sequence[int], b: Sequence[int], q: int) -> List[int]:
    """O(n^2) multiplication in Z_q[x]/(x^n + 1)."""
    n = len(a)
    res = [0] * n
    for i in range(n):
        if a[i] == 0:
            continue
        for j in range(n):
            k = i + j
            if k >= n:
                res[k - n] = (res[k - n] - a[i] * b[j]) % q
            else:
                res[k] = (res[k] + a[i] * b[j]) % q
    return res


def poly_mul_negacyclic(a: Sequence[int], b: Sequence[int], psi: int, q: int) -> List[int]:
    A = negacyclic_ntt(a, psi, q)
    B = negacyclic_ntt(b, psi, q)
    C = [(x * y) % q for x, y in zip(A, B)]
    return negacyclic_intt(C, psi, q)
