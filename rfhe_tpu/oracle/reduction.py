"""Golden Barrett / Montgomery reduction and fold checksums (Python ints).

Semantics match barret_modmul.py:55-124, montgomery.py:44-92,
barrett_final.py:46-54 of the reference.
"""
from __future__ import annotations

from typing import Tuple


def barrett_reduce(x: int, q: int, mu: int, k: int) -> int:
    """x mod q via Barrett: t = x*mu; s = t >> 2k; c = x - s*q; cond-subtract."""
    t = x * mu
    s = t >> (2 * k)
    c = x - s * q
    if c < 0:
        c += q
    elif c >= q:
        c -= q
    return c


def barrett_reduce_steps(x: int, q: int, mu: int, k: int) -> Tuple[int, int, int, int]:
    """All intermediates (t, s, sq, c_pre) for detector golden-models."""
    t = x * mu
    s = t >> (2 * k)
    sq = s * q
    c_pre = x - sq
    return t, s, sq, c_pre


def montgomery_reduce(T: int, q: int, k: int, qinv_neg: int) -> int:
    """REDC: returns T * R^{-1} mod q for R = 2^k; requires T < R*q."""
    R = 1 << k
    m = ((T & (R - 1)) * qinv_neg) & (R - 1)
    u = (T + m * q) >> k
    return u - q if u >= q else u


def fold_mod(x: int, w: int) -> int:
    """Fold checksum of x in w-bit chunks modulo 2^w - 1 (barret_modmul.py:62-71)."""
    M = (1 << w) - 1
    s = 0
    while x:
        s += x & M
        x >>= w
    return s % M


def fold_mod_2s1(x: int, s_bits: int) -> int:
    """Alternating-sign fold of x modulo 2^s + 1 (barrett_final.py:46-54)."""
    base = 1 << s_bits
    mod = base + 1
    acc, sign = 0, 1
    while x:
        acc += sign * (x & (base - 1))
        sign = -sign
        x >>= s_bits
    return acc % mod
