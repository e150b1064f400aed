"""Pallas fused negacyclic NTT/INTT kernels (TPU).

The XLA formulations (ops/ntt.py, ops/ntt_pease.py) round-trip the working
array through HBM between butterfly stages.  Here the whole transform runs
inside one Pallas kernel: a block of RNS limbs is DMA'd to VMEM once, every
stage executes in-core, and the result is written back once — one streaming
HBM pass instead of O(log n).

TPU-native replacement for the reference substrate's batched per-limb CUDA
NTT (reliability_test/ntt_test.cu:44-95 `nwt_2d_radix8_forward_inplace`):
the CUDA `batch_size` limb axis becomes the block sublane axis, so one grid
cell transforms a block of limbs in lockstep with per-row moduli.

Lane-legal formulation (Mosaic cannot lane-split vector reshapes):
  * the polynomial is viewed as an (n/128, 128) matrix — stages with
    butterfly distance >= 128 (block size m >= 256) are pure sublane-axis
    slices/concats with the lane dim pinned at 128;
  * the remaining 7 stages (m = 128..2) act within each 128-lane row and
    are identical for every row, so their composition is ONE fixed 128x128
    matrix per limb — evaluated on the MXU as an exact int8-digit matmul
    (base-2^7 digits, int32 accumulate, Montgomery-weighted recombination),
    the same digit scheme as ops/matmul_mod.py.
Forward runs sublane stages then the MXU tail; inverse runs the MXU tail
(inverse-stage composition) then the sublane inverse stages.  Outputs are
bit-exact with ops/ntt_pease.py (same NttPlan tables, same bit-reversed
Montgomery-domain slot order), so the paths are interchangeable.
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

_LANE = 128
_TAIL_STAGES = 7                 # log2(_LANE): stages folded into the matmul
_DIGIT_BITS = 7                  # int8-safe digit base (digits in [0,127])


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


def _sublane_rows(n: int):
    """(stage block size m, packed row offset) for stages with m >= 256."""
    out, roff = [], 0
    m = n
    while m >= 2 * _LANE:
        out.append((m, roff))
        roff += (m // 2) // _LANE
        m //= 2
    return out


def _tail_matmul(xl, md_ref, l, q, qinv, wm_ref, nd):
    """xl: (n1r, 128) u32 -> (xl @ M_l) mod q via int8-digit MXU matmuls."""
    mask = jnp.uint32((1 << _DIGIT_BITS) - 1)
    xd = [((xl >> jnp.uint32(_DIGIT_BITS * i)) & mask).astype(jnp.int8)
          for i in range(nd)]
    y = None
    for s in range(2 * nd - 1):
        p = None
        for i in range(max(0, s - nd + 1), min(nd, s + 1)):
            t = jnp.dot(xd[i], md_ref[l, s - i],
                        preferred_element_type=jnp.int32)
            p = t if p is None else p + t
        term = _mont(p.astype(jnp.uint32), wm_ref[l, s], q, qinv)
        y = term if y is None else _add_mod(term, y, q)
    return y


def _fwd_kernel(x_ref, q_ref, qinv_ref, psi_ref, psis_ref, w_ref, ws_ref,
                md_ref, wm_ref, o_ref, *, n: int, nd: int):
    q2 = q_ref[:, :]                           # (Rl, 1)
    q3 = q2[:, :, None]
    q4 = q2[:, :, None, None]
    x = x_ref[0]                               # (Rl, n1r, 128)
    x = _shoup(x, psi_ref[:, :, :], psis_ref[:, :, :], q3)
    for m, roff in _sublane_rows(n):
        rows = m // _LANE
        xr = x.reshape(x.shape[0], n // m, rows, _LANE)
        a = xr[:, :, :rows // 2]
        b = xr[:, :, rows // 2:]
        u = _add_mod(a, b, q4)
        w = w_ref[:, roff:roff + rows // 2, :][:, None]
        ws = ws_ref[:, roff:roff + rows // 2, :][:, None]
        v = _shoup(_sub_mod(a, b, q4), w, ws, q4)
        x = jnp.concatenate([u, v], axis=2).reshape(
            x.shape[0], n // _LANE, _LANE)
    for l in range(x.shape[0]):
        o_ref[0, l] = _tail_matmul(x[l], md_ref, l, q_ref[l, 0],
                                   qinv_ref[l, 0], wm_ref, nd)


def _inv_kernel(x_ref, q_ref, qinv_ref, w_ref, ws_ref, psin_ref, md_ref,
                wm_ref, o_ref, scr_ref, *, n: int, nd: int):
    q2 = q_ref[:, :]
    q3 = q2[:, :, None]
    q4 = q2[:, :, None, None]
    qinv3 = qinv_ref[:, :][:, :, None]
    x0 = x_ref[0]
    for l in range(x0.shape[0]):
        scr_ref[l] = _tail_matmul(x0[l], md_ref, l, q_ref[l, 0],
                                  qinv_ref[l, 0], wm_ref, nd)
    x = scr_ref[:, :, :]
    for m, roff in reversed(_sublane_rows(n)):
        rows = m // _LANE
        xr = x.reshape(x.shape[0], n // m, rows, _LANE)
        u = xr[:, :, :rows // 2]
        v = xr[:, :, rows // 2:]
        w = w_ref[:, roff:roff + rows // 2, :][:, None]
        ws = ws_ref[:, roff:roff + rows // 2, :][:, None]
        t = _shoup(v, w, ws, q4)
        hi = _add_mod(u, t, q4)
        lo = _sub_mod(u, t, q4)
        x = jnp.concatenate([hi, lo], axis=2).reshape(
            x.shape[0], n // _LANE, _LANE)
    o_ref[0] = _mont(x, psin_ref[:, :, :], q3, qinv3)


def _apply_fwd_stage(X: np.ndarray, m: int, w: np.ndarray, q: int):
    Xr = X.reshape(X.shape[0], X.shape[1] // m, m)
    a = Xr[:, :, :m // 2].astype(np.int64)
    b = Xr[:, :, m // 2:].astype(np.int64)
    u = (a + b) % q
    v = ((a - b) % q) * w[None, None, :].astype(np.int64) % q
    return np.concatenate([u, v], axis=-1).reshape(X.shape).astype(np.uint64)


def _apply_inv_stage(X: np.ndarray, m: int, w: np.ndarray, q: int):
    Xr = X.reshape(X.shape[0], X.shape[1] // m, m)
    u = Xr[:, :, :m // 2].astype(np.int64)
    v = Xr[:, :, m // 2:].astype(np.int64)
    t = v * w[None, None, :].astype(np.int64) % q
    hi = (u + t) % q
    lo = (u - t) % q
    return np.concatenate([hi, lo], axis=-1).reshape(X.shape).astype(np.uint64)


def _tail_matrix(plan: NttPlan, forward: bool) -> np.ndarray:
    """128x128 matrix composing the within-lane stages (m = 128..2):
    y_row = x_row @ M (mod q), built by transforming the identity's rows
    with exactly the same per-stage tables the butterfly loop would use."""
    n = plan.n
    log_n = n.bit_length() - 1
    q = plan.q
    X = np.eye(_LANE, dtype=np.uint64)
    stages = range(log_n - _TAIL_STAGES, log_n)
    if forward:
        for s in stages:
            m = n >> s
            X = _apply_fwd_stage(X, m, np.asarray(plan.fwd_w[s],
                                                  dtype=np.uint64), q)
    else:
        for s in reversed(stages):
            m = n >> s
            X = _apply_inv_stage(X, m, np.asarray(plan.inv_w[s],
                                                  dtype=np.uint64), q)
    return X.astype(np.uint32)


def _digit_planes(M: np.ndarray, nd: int) -> np.ndarray:
    """(nd, 128, 128) int8 planes of base-2^7 digits."""
    mask = (1 << _DIGIT_BITS) - 1
    return np.stack([((M >> (_DIGIT_BITS * i)) & mask).astype(np.int8)
                     for i in range(nd)])


def _pack_sublane_tables(tabs, n: int) -> np.ndarray:
    """Per-stage twiddles for m >= 256 packed into (n/128, 128) rows."""
    rows = n // _LANE
    out = np.zeros((rows, _LANE), dtype=np.uint32)
    log_n = n.bit_length() - 1
    for s in range(log_n - _TAIL_STAGES):
        m = n >> s
        roff = dict(_sublane_rows(n))[m]
        t = np.asarray(tabs[s], dtype=np.uint32).reshape(-1, _LANE)
        out[roff:roff + t.shape[0]] = t
    return out


@dataclass(frozen=True)
class PallasNttPlan:
    """Per-limb tables for the fused kernels (all pre-shaped lane-legal)."""

    n: int
    nd: int                   # digit planes per operand
    q_col: jnp.ndarray        # (L, 1) uint32
    qinv_col: jnp.ndarray     # (L, 1) -q^{-1} mod 2^32
    psi: jnp.ndarray          # (L, n/128, 128) Montgomery psi entry table
    psi_shoup: jnp.ndarray
    psin: jnp.ndarray         # (L, n/128, 128) psi^{-1}/n Montgomery exit
    fwd_w: jnp.ndarray        # (L, n/128, 128) packed sublane twiddles
    fwd_ws: jnp.ndarray
    inv_w: jnp.ndarray
    inv_ws: jnp.ndarray
    md_f: jnp.ndarray         # (L, nd, 128, 128) int8 forward tail digits
    md_i: jnp.ndarray         # (L, nd, 128, 128) int8 inverse tail digits
    wm: jnp.ndarray           # (L, 2nd-1) Montgomery digit weights
    nu: np.ndarray            # slot -> NTT coefficient index (bit-reversal)

    @classmethod
    def make(cls, n: int, primes) -> "PallasNttPlan":
        from .ntt import bit_reverse_indices
        assert n >= 2 * _LANE, "Pallas NTT needs n >= 256 (lane tiling)"
        primes = [int(q) for q in primes]
        plans = [NttPlan.make(n, q) for q in primes]
        nd = max(-(-q.bit_length() // _DIGIT_BITS) for q in primes)
        n1r = n // _LANE
        re3 = lambda a: np.asarray(a, dtype=np.uint32).reshape(n1r, _LANE)
        wm = np.stack([
            np.array([((1 << (_DIGIT_BITS * s)) << 32) % p.q
                      for s in range(2 * nd - 1)], dtype=np.uint32)
            for p in plans])
        return cls(
            n=n, nd=nd,
            q_col=jnp.asarray(np.array([[p.q] for p in plans],
                                       dtype=np.uint32)),
            qinv_col=jnp.asarray(np.array([[p.ctx.qinv_neg] for p in plans],
                                          dtype=np.uint32)),
            psi=jnp.asarray(np.stack([re3(p.psi_mont) for p in plans])),
            psi_shoup=jnp.asarray(np.stack([re3(p.psi_mont_shoup)
                                            for p in plans])),
            psin=jnp.asarray(np.stack([re3(p.psi_inv_n) for p in plans])),
            fwd_w=jnp.asarray(np.stack(
                [_pack_sublane_tables(p.fwd_w, n) for p in plans])),
            fwd_ws=jnp.asarray(np.stack(
                [_pack_sublane_tables(p.fwd_w_shoup, n) for p in plans])),
            inv_w=jnp.asarray(np.stack(
                [_pack_sublane_tables(p.inv_w, n) for p in plans])),
            inv_ws=jnp.asarray(np.stack(
                [_pack_sublane_tables(p.inv_w_shoup, n) for p in plans])),
            md_f=jnp.asarray(np.stack(
                [_digit_planes(_tail_matrix(p, True), nd) for p in plans])),
            md_i=jnp.asarray(np.stack(
                [_digit_planes(_tail_matrix(p, False), nd) for p in plans])),
            wm=jnp.asarray(wm),
            nu=bit_reverse_indices(n),
        )

    @property
    def L(self) -> int:
        return int(self.q_col.shape[0])


def _limb_block(L: int, n: int) -> int:
    """Limbs per grid cell: full L unless the working set (x, out, twiddle
    pairs, psi pair, tail digit planes) would not double-buffer in VMEM."""
    budget = 5 * 1024 * 1024
    per_limb = n * 4 * 6 + 5 * _LANE * _LANE
    if L * per_limb <= budget or L <= 8:
        return L
    return min(L - L % 8, max(8, (budget // per_limb) // 8 * 8))


def _pad_limbs(x, plan: PallasNttPlan, Rl: int):
    """Pad the limb axis so Rl divides it (tables padded by edge copy)."""
    L = plan.L
    Lp = -(-L // Rl) * Rl
    if Lp == L:
        return x, plan, L
    pad = Lp - L
    pt = lambda t: jnp.concatenate([t, jnp.repeat(t[-1:], pad, 0)], 0)
    plan2 = PallasNttPlan(
        n=plan.n, nd=plan.nd, q_col=pt(plan.q_col),
        qinv_col=pt(plan.qinv_col), psi=pt(plan.psi),
        psi_shoup=pt(plan.psi_shoup), psin=pt(plan.psin),
        fwd_w=pt(plan.fwd_w), fwd_ws=pt(plan.fwd_ws),
        inv_w=pt(plan.inv_w), inv_ws=pt(plan.inv_ws),
        md_f=pt(plan.md_f), md_i=pt(plan.md_i), wm=pt(plan.wm), nu=plan.nu)
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return xp, plan2, L


def _specs(Rl: int, n: int, nd: int, inverse: bool):
    n1r = n // _LANE
    limb = lambda b, lb: (lb, 0, 0)
    x_spec = pl.BlockSpec((1, Rl, n1r, _LANE), lambda b, lb: (b, lb, 0, 0))
    col = pl.BlockSpec((Rl, 1), lambda b, lb: (lb, 0))
    tab = pl.BlockSpec((Rl, n1r, _LANE), limb)
    md = pl.BlockSpec((Rl, nd, _LANE, _LANE), lambda b, lb: (lb, 0, 0, 0))
    wm = pl.BlockSpec((Rl, 2 * nd - 1), lambda b, lb: (lb, 0))
    if inverse:
        return [x_spec, col, col, tab, tab, tab, md, wm], x_spec
    return [x_spec, col, col, tab, tab, tab, tab, md, wm], x_spec


def negacyclic_ntt(x: jnp.ndarray, plan: PallasNttPlan,
                   interpret: bool = False) -> jnp.ndarray:
    """x: (B, L, n) uint32 -> NTT domain (Montgomery, bit-reversed order)."""
    B, L, n = x.shape
    Rl = _limb_block(L, n)
    x, plan, L0 = _pad_limbs(x, plan, Rl)
    Lp = x.shape[1]
    n1r = n // _LANE
    x4 = x.reshape(B, Lp, n1r, _LANE)
    in_specs, out_spec = _specs(Rl, n, plan.nd, inverse=False)
    kern = functools.partial(_fwd_kernel, n=n, nd=plan.nd)
    out = pl.pallas_call(
        kern,
        grid=(B, Lp // Rl),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lp, n1r, _LANE), jnp.uint32),
        interpret=interpret,
    )(x4, plan.q_col, plan.qinv_col, plan.psi, plan.psi_shoup,
      plan.fwd_w, plan.fwd_ws, plan.md_f, plan.wm)
    return out.reshape(B, Lp, n)[:, :L0]


def negacyclic_intt(x: jnp.ndarray, plan: PallasNttPlan,
                    interpret: bool = False) -> jnp.ndarray:
    """Inverse of negacyclic_ntt (exact, including 1/n and Montgomery exit)."""
    B, L, n = x.shape
    Rl = _limb_block(L, n)
    x, plan, L0 = _pad_limbs(x, plan, Rl)
    Lp = x.shape[1]
    n1r = n // _LANE
    x4 = x.reshape(B, Lp, n1r, _LANE)
    in_specs, out_spec = _specs(Rl, n, plan.nd, inverse=True)
    kern = functools.partial(_inv_kernel, n=n, nd=plan.nd)
    out = pl.pallas_call(
        kern,
        grid=(B, Lp // Rl),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lp, n1r, _LANE), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((Rl, n1r, _LANE), jnp.uint32)],
        interpret=interpret,
    )(x4, plan.q_col, plan.qinv_col, plan.inv_w, plan.inv_ws, plan.psin,
      plan.md_i, plan.wm)
    return out.reshape(B, Lp, n)[:, :L0]
