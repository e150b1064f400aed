"""Pallas fused negacyclic NTT/INTT kernels (TPU).

The XLA formulations (ops/ntt.py, ops/ntt_pease.py) round-trip the working
array through HBM between butterfly stages.  Here the whole transform runs
inside one Pallas kernel: a block of rows is DMA'd to VMEM once, all log n
stages execute in-core (statically unrolled DIF with per-stage slicing), and
the result is written back once — turning an HBM-bandwidth-bound O(log n)
pass structure into a single streaming pass.

Grid: (limb, row-block).  Per-limb constants (q, -q^{-1} mod 2^32) come from
SMEM; twiddle/ψ tables are blocked per limb.  Shapes follow the fhe layer:
x (..., L, n) uint32, Montgomery/ν-free: this kernel uses the plain DIF
bit-reversed order of ops/ntt.py (tables from NttPlan), entering/leaving the
Montgomery domain via the ψ entry/exit tables exactly like the XLA paths.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import NttPlan


def _add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _sub_mod(a, b, q):
    d = a - b
    return jnp.where(b > a, d + q, d)


def _mulhi(a, b):
    m16 = jnp.uint32(0xFFFF)
    al, ah = a & m16, a >> 16
    bl, bh = b & m16, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> 16) + (lh & m16) + (hl & m16)
    return hh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def _shoup(x, w, ws, q):
    hi = _mulhi(x, ws)
    r = x * w - hi * q
    return jnp.where(r >= q, r - q, r)


def _mont(a, b, q, qinv):
    m16 = jnp.uint32(0xFFFF)
    al, ah = a & m16, a >> 16
    bl, bh = b & m16, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = (ll >> 16) + (lh & m16) + (hl & m16)
    lo = (mid << 16) | (ll & m16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    m = lo * qinv
    # m * q
    ml, mh = m & m16, m >> 16
    ql, qh = q & m16, q >> 16
    ll2 = ml * ql
    lh2 = ml * qh
    hl2 = mh * ql
    hh2 = mh * qh
    mid2 = (ll2 >> 16) + (lh2 & m16) + (hl2 & m16)
    mq_hi = hh2 + (lh2 >> 16) + (hl2 >> 16) + (mid2 >> 16)
    carry = (lo != 0).astype(jnp.uint32)
    t = hi + mq_hi + carry
    return jnp.where(t >= q, t - q, t)


def _fwd_kernel(qs_ref, x_ref, psi_ref, psis_ref, w_ref, ws_ref, o_ref,
                *, n: int, log_n: int):
    q = qs_ref[0, 0]
    x = x_ref[:, 0, :]                        # (R, n)
    psi = psi_ref[0, :]
    psis = psis_ref[0, :]
    x = _shoup(x, psi[None, :], psis[None, :], q)
    off = 0
    for s in range(log_n):
        m = n >> s
        half = m // 2
        xr = x.reshape(x.shape[0], n // m, m)
        a = xr[:, :, :half]
        b = xr[:, :, half:]
        u = _add_mod(a, b, q)
        w = w_ref[0, off:off + half]
        ws = ws_ref[0, off:off + half]
        v = _shoup(_sub_mod(a, b, q), w[None, None, :], ws[None, None, :], q)
        x = jnp.concatenate([u, v], axis=-1).reshape(x.shape[0], n)
        off += half
    o_ref[:, 0, :] = x


def _inv_kernel(qs_ref, qinvs_ref, x_ref, w_ref, ws_ref, psin_ref, o_ref,
                *, n: int, log_n: int):
    q = qs_ref[0, 0]
    qinv = qinvs_ref[0, 0]
    x = x_ref[:, 0, :]
    off = n - 1
    for s in reversed(range(log_n)):
        m = n >> s
        half = m // 2
        off -= half
        xr = x.reshape(x.shape[0], n // m, m)
        u = xr[:, :, :half]
        v = xr[:, :, half:]
        w = w_ref[0, off:off + half]
        ws = ws_ref[0, off:off + half]
        t = _shoup(v, w[None, None, :], ws[None, None, :], q)
        hi = _add_mod(u, t, q)
        lo = _sub_mod(u, t, q)
        x = jnp.concatenate([hi, lo], axis=-1).reshape(x.shape[0], n)
    psin = psin_ref[0, :]
    o_ref[:, 0, :] = _mont(x, psin[None, :], q, qinv)


@dataclass(frozen=True)
class PallasNttPlan:
    """Per-limb tables flattened for the fused kernels.  Twiddles are packed
    as one (L, n-1) array (stage s occupies a contiguous slice)."""

    n: int
    q2d: jnp.ndarray          # (L, 1)
    qinv2d: jnp.ndarray
    fwd_w: jnp.ndarray        # (L, n-1) concatenated per-stage twiddles
    fwd_ws: jnp.ndarray
    inv_w: jnp.ndarray        # (L, n-1), stage order matching _inv_kernel
    inv_ws: jnp.ndarray
    psi_mont: jnp.ndarray     # (L, n)
    psi_mont_shoup: jnp.ndarray
    psi_inv_n: jnp.ndarray
    nu: np.ndarray            # slot -> NTT coefficient index (bit-reversal)

    @classmethod
    def make(cls, n: int, primes) -> "PallasNttPlan":
        from .ntt import bit_reverse_indices
        primes = [int(q) for q in primes]
        plans = [NttPlan.make(n, q) for q in primes]
        cat = lambda tabs: np.concatenate([np.asarray(t) for t in tabs])
        fwd_w = np.stack([cat(p.fwd_w) for p in plans])
        fwd_ws = np.stack([cat(p.fwd_w_shoup) for p in plans])
        # inverse tables laid out in the same offsets as forward (stage s at
        # offset sum_{s'<s} half(s')), consumed in reverse stage order
        inv_w = np.stack([cat(p.inv_w) for p in plans])
        inv_ws = np.stack([cat(p.inv_w_shoup) for p in plans])
        return cls(
            n=n,
            q2d=jnp.asarray(np.array([[p.q] for p in plans], dtype=np.uint32)),
            qinv2d=jnp.asarray(np.array([[p.ctx.qinv_neg] for p in plans],
                                        dtype=np.uint32)),
            fwd_w=jnp.asarray(fwd_w), fwd_ws=jnp.asarray(fwd_ws),
            inv_w=jnp.asarray(inv_w), inv_ws=jnp.asarray(inv_ws),
            psi_mont=jnp.asarray(np.stack([np.asarray(p.psi_mont)
                                           for p in plans])),
            psi_mont_shoup=jnp.asarray(np.stack([np.asarray(p.psi_mont_shoup)
                                                 for p in plans])),
            psi_inv_n=jnp.asarray(np.stack([np.asarray(p.psi_inv_n)
                                            for p in plans])),
            nu=bit_reverse_indices(n),
        )

    @property
    def L(self) -> int:
        return int(self.q2d.shape[0])


def _row_block(batch: int, n: int) -> int:
    # keep the working set comfortably inside VMEM (x + out + tables)
    budget = 6 * 1024 * 1024
    per_row = n * 4 * 3
    r = max(1, min(batch, budget // per_row))
    while batch % r:
        r -= 1
    return r


def negacyclic_ntt(x: jnp.ndarray, plan: PallasNttPlan,
                   interpret: bool = False) -> jnp.ndarray:
    """x: (B, L, n) uint32 -> NTT domain (Montgomery, bit-reversed order)."""
    B, L, n = x.shape
    log_n = n.bit_length() - 1
    R = _row_block(B, n)
    grid = (L, B // R)
    kern = functools.partial(_fwd_kernel, n=n, log_n=log_n)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda li, rb: (li, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 1, n), lambda li, rb: (rb, li, 0)),
            pl.BlockSpec((1, n), lambda li, rb: (li, 0)),
            pl.BlockSpec((1, n), lambda li, rb: (li, 0)),
            pl.BlockSpec((1, n - 1), lambda li, rb: (li, 0)),
            pl.BlockSpec((1, n - 1), lambda li, rb: (li, 0)),
        ],
        out_specs=pl.BlockSpec((R, 1, n), lambda li, rb: (rb, li, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, n), jnp.uint32),
        interpret=interpret,
    )(plan.q2d, x, plan.psi_mont, plan.psi_mont_shoup, plan.fwd_w,
      plan.fwd_ws)


def negacyclic_intt(x: jnp.ndarray, plan: PallasNttPlan,
                    interpret: bool = False) -> jnp.ndarray:
    """Inverse of negacyclic_ntt (exact, including 1/n and Montgomery exit)."""
    B, L, n = x.shape
    log_n = n.bit_length() - 1
    R = _row_block(B, n)
    grid = (L, B // R)
    kern = functools.partial(_inv_kernel, n=n, log_n=log_n)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda li, rb: (li, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda li, rb: (li, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 1, n), lambda li, rb: (rb, li, 0)),
            pl.BlockSpec((1, n - 1), lambda li, rb: (li, 0)),
            pl.BlockSpec((1, n - 1), lambda li, rb: (li, 0)),
            pl.BlockSpec((1, n), lambda li, rb: (li, 0)),
        ],
        out_specs=pl.BlockSpec((R, 1, n), lambda li, rb: (rb, li, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, n), jnp.uint32),
        interpret=interpret,
    )(plan.q2d, plan.qinv2d, x, plan.inv_w, plan.inv_ws, plan.psi_inv_n)
