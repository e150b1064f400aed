"""ModArith: bundled modular-arithmetic context for one prime q < 2^31.

Thin convenience layer over ops.u32 providing overflow-safe reductions
(sums/dots mod q via halving trees — TPU-friendly log-depth reductions that
never leave uint32).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..numth import montgomery_constants
from . import u32


def sum_mod(x: jnp.ndarray, q, axis: int = -1) -> jnp.ndarray:
    """Modular sum along `axis` via log-depth halving with add_mod.

    `q` is a Python int or a uint32 array broadcastable to the result shape.
    Inputs must already be < q.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    p = 1 << max(0, (n - 1).bit_length())
    if p != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, p - n)]
        x = jnp.pad(x, pad)
    qb = jnp.asarray(q, dtype=jnp.uint32)
    if qb.ndim:
        qb = qb[..., None]
    while x.shape[-1] > 1:
        h = x.shape[-1] // 2
        x = u32.add_mod(x[..., :h], x[..., h:], qb)
    return x[..., 0]


@dataclass(frozen=True)
class ModArith:
    q: int
    qinv_neg: int
    r2: int

    @classmethod
    def make(cls, q: int) -> "ModArith":
        _, qinv_neg, r2 = montgomery_constants(q, 32)
        return cls(q=q, qinv_neg=qinv_neg, r2=r2)

    def add(self, a, b):
        return u32.add_mod(a, b, self.q)

    def sub(self, a, b):
        return u32.sub_mod(a, b, self.q)

    def neg(self, a):
        return u32.neg_mod(a, self.q)

    def mul(self, a, b):
        return u32.mul_mod(a, b, self.q, self.qinv_neg, self.r2)

    def mont_mul(self, a, b):
        return u32.mont_mul(a, b, self.q, self.qinv_neg)

    def to_mont(self, a):
        return u32.to_mont(a, self.q, self.qinv_neg, self.r2)

    def from_mont(self, a):
        return u32.from_mont(a, self.q, self.qinv_neg)

    def pow(self, a, e: int):
        return u32.pow_mod(a, e, self.q, self.qinv_neg, self.r2)

    def sum(self, x, axis: int = -1):
        return sum_mod(x, self.q, axis=axis)

    def dot(self, a, b, axis: int = -1):
        """<a, b> mod q (general operands: 2 mont_muls per element + tree sum)."""
        return self.sum(self.mul(a, b), axis=axis)
