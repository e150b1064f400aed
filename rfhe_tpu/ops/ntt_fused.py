"""Single-pass Pallas kernel for the four-step MXU NTT (production TPU path).

The XLA composition in ops/ntt_mxu.py materializes every intermediate to HBM
(digitized int8 operands, int32 accumulators, the stage boundary), so the
transform is bound by intermediate HBM traffic, not MXU compute: measured
~69 us for 168 transforms at n=4096 where the in/out floor is ~7 us.  This
kernel runs the whole pipeline per (limb, batch-block) inside VMEM — one HBM
read of the coefficients, one HBM write of the slots, tables streamed per
limb — with the identical integer algebra, so it is bit-exact vs
MxuNttPlan's XLA path and the oracle (tests/test_ntt_fused.py).

Structure per grid step (limb l, batch block of Bb polys):

  forward:  for each poly b: digitize (sublane concat) -> one int8 MXU
            matmul against the stage-1 matrix -> Shoup twiddle recombination
            (per-element folded tables) => Bm rows; then ONE batched int8
            matmul (per-digit split, see below) for stage 2 with all Bb*n2
            rows -> scalar Shoup recombination -> slots.
  inverse:  mirror image: big per-digit matmul contracting k1 first, then
            per-poly small matmuls contracting k2.

Formulation notes (v5e):

  * The digit recombination uses Shoup multiplication (x*w with w' =
    floor(w*2^32/q) precomputed; valid for any x < 2^32, w < q) instead of
    Montgomery — 6 vs 9 VPU multiplies per term — with the negative-
    accumulator fix constant 2^32*w mod q (== the Montgomery-path U table).
  * Each of the four stage matrices carries its own digit width (s1.xb=7
    vs s2.xb=6 at n=4096/30-bit) — the kernel digitizes per stage.
  * Values are assembled with jnp.concatenate (never scratch write-then-
    read, and no per-digit weight splits): scratch roundtrips and the
    split-matmul formulation have both been observed to hang the Mosaic
    compile on this runtime at large unroll factors.

Role in the reference: this is the counterpart of the batched radix-8
device NTT the reference's campaigns drive (reliability_test/ntt_test.cu:95,
`nwt_2d_radix8_forward_inplace`), rebuilt as one fused TPU kernel.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FusedNtt"]

# per-program VMEM total (v5e has 16 MB/core; _block_bb subtracts the
# double-buffered per-limb table blocks, which grow with n, before sizing
# the poly block).  Device-measured sweep (v5e, 2026-08):
#   n=4096/L21:  bb=8 36.7% -> bb=24 42.7% of int8 peak (bb=32 regresses)
#   n=16384/L6:  bb=8 57.1%
#   n=65536/L6:  bb=1 57.7% (bb=2 44.8%: more grid steps pipeline the
#                table streaming better once a single poly fills VMEM)
_VMEM_TOTAL = 14 * 1024 * 1024
_MAX_BB = 24         # kernel unrolls the poly loop; cap the unroll factor


@dataclass(frozen=True)
class FusedNtt:
    """Pre-split tables for the fused kernel, derived from an MxuNttPlan."""

    n: int
    n1: int
    n2: int
    # per-stage digit parameters (xb, nd_x, nd_w, pair) — the four
    # ConstMatPlans choose digit widths independently (contraction-size
    # dependent), so the kernel must digitize per stage:
    ps_small_f: Tuple[int, int, int, bool]     # s1  (fwd per-poly stage)
    ps_big_f: Tuple[int, int, int, bool]       # s2  (fwd batched stage)
    ps_big_i: Tuple[int, int, int, bool]       # s1i (inv batched stage)
    ps_small_i: Tuple[int, int, int, bool]     # s2i (inv per-poly stage)
    # forward
    W1: jnp.ndarray                  # (L, nd_w*n2, nd_x*n2) int8 (stage-1 left)
    W2: jnp.ndarray                  # (L, nd_x*n1, nd_w*n1) int8 (stage-2 right)
    Vf: jnp.ndarray                  # (G1, L, n2, n1) u32 folded twiddle (plain)
    Vfs: jnp.ndarray                 # Shoup companions
    Cf: jnp.ndarray                  # 2^32*Vf mod q (negative-acc fix)
    sc2: np.ndarray                  # (L, 3*G2) u32 SMEM table [V2 | V2s | C2]
    # inverse
    W1i: jnp.ndarray                 # (L, nd_x*n1, nd_w*n1) int8 (i-stage-1 right)
    W2i: jnp.ndarray                 # (L, nd_w*n2, nd_x*n2) int8 (i-stage-2 left)
    Vi: jnp.ndarray
    Vis: jnp.ndarray
    Ci: jnp.ndarray
    sc2i: np.ndarray
    q_col: np.ndarray                # (L, 1) u32 SMEM

    @classmethod
    def make(cls, n: int, n1: int, n2: int, s1, s2, Uf, s1i, s2i, Ui,
             primes) -> "FusedNtt":
        qs = [int(q) for q in primes]
        L = len(qs)
        R = 1 << 32

        def folded_shoup(U):
            """U = V*R mod q (Montgomery-folded) -> (V, V_shoup, C=U)."""
            Ux = np.asarray(U, dtype=np.uint64)
            V = np.empty_like(Ux)
            Vs = np.empty_like(Ux)
            from ..numth import mod_inv
            for li, q in enumerate(qs):
                rinv = mod_inv(R % q, q)
                v = (Ux[:, li] * rinv) % q
                V[:, li] = v
                Vs[:, li] = (v << 32) // q
            return (jnp.asarray(V.astype(np.uint32)),
                    jnp.asarray(Vs.astype(np.uint32)),
                    jnp.asarray(np.asarray(U)))

        def scalar_table(plan):
            starts = plan.group_starts
            G = len(starts)
            t = np.empty((L, 3 * G), dtype=np.uint32)
            for g, st in enumerate(starts):
                for li, q in enumerate(qs):
                    v = pow(2, 8 * st, q)
                    t[li, g] = v
                    t[li, G + g] = (v << 32) // q
                    t[li, 2 * G + g] = (v * R) % q
            return t

        Vf, Vfs, Cf = folded_shoup(Uf)
        Vi, Vis, Ci = folded_shoup(Ui)
        ps = lambda s: (s.xb, s.nd_x, s.nd_w, s.pair)
        return cls(
            n=n, n1=n1, n2=n2,
            ps_small_f=ps(s1), ps_big_f=ps(s2),
            ps_big_i=ps(s1i), ps_small_i=ps(s2i),
            W1=s1.Wd, W2=s2.Wd, Vf=Vf, Vfs=Vfs, Cf=Cf,
            sc2=scalar_table(s2),
            W1i=s1i.Wd, W2i=s2i.Wd, Vi=Vi, Vis=Vis, Ci=Ci,
            sc2i=scalar_table(s2i),
            q_col=np.asarray(qs, dtype=np.uint32).reshape(L, 1),
        )

    @property
    def L(self) -> int:
        return int(self.q_col.shape[0])

    def take(self, idx) -> "FusedNtt":
        idx = np.asarray(idx)
        return FusedNtt(
            n=self.n, n1=self.n1, n2=self.n2,
            ps_small_f=self.ps_small_f, ps_big_f=self.ps_big_f,
            ps_big_i=self.ps_big_i, ps_small_i=self.ps_small_i,
            W1=self.W1[idx], W2=self.W2[idx],
            Vf=self.Vf[:, idx], Vfs=self.Vfs[:, idx], Cf=self.Cf[:, idx],
            sc2=self.sc2[idx],
            W1i=self.W1i[idx], W2i=self.W2i[idx],
            Vi=self.Vi[:, idx], Vis=self.Vis[:, idx], Ci=self.Ci[:, idx],
            sc2i=self.sc2i[idx],
            q_col=self.q_col[idx],
        )

    # ------------------------------------------------------------------
    def fwd(self, x: jnp.ndarray) -> jnp.ndarray:
        return _dispatch(self, x, inverse=False)

    def inv(self, y: jnp.ndarray) -> jnp.ndarray:
        return _dispatch(self, y, inverse=True)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _mulhi32(a, b):
    M16 = 0xFFFF
    al = a & M16
    ah = a >> 16
    bl = b & M16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    mid = (ll >> 16) + (lh & M16) + (hl & M16)
    return ah * bh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def _shoup_term(g_acc, v, vs, c, q):
    """(bits(g_acc) * v) mod q with the 2^32 fix for negative int32 accs.
    v < q, any bits; result in [0, q)."""
    x = g_acc.astype(jnp.uint32)
    hi = _mulhi32(x, vs)
    r = x * v - hi * q
    r = jnp.where(r >= q, r - q, r)
    corr = jnp.where(g_acc < 0, c, jnp.uint32(0))
    d = r - corr
    return jnp.where(corr > r, d + q, d)


def _add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _groups_of(ps) -> List[int]:
    xb, nd_x, nd_w, pair = ps
    return list(range(0, nd_w, 2 if pair else 1))


def _small_stage(A, w_ref, V, Vs, C, q, ps, n2):
    """Per-poly stage: digitize (n2, n1) along sublanes, one left matmul
    against the full stage matrix, per-element Shoup recombination.
    V/Vs/C: (G, n2, n1) slices for this limb."""
    xb, nd_x, nd_w, pair = ps
    mask = (1 << xb) - 1
    digs = [((A >> (xb * j)) & mask).astype(jnp.int8) for j in range(nd_x)]
    Ad = jnp.concatenate(digs, axis=0)                     # (nd_x*n2, n1)
    p = jnp.dot(w_ref, Ad, preferred_element_type=jnp.int32)
    acc = None
    for g, i in enumerate(_groups_of(ps)):
        gacc = p[i * n2:(i + 1) * n2]
        if pair and i + 1 < nd_w:
            gacc = gacc + (p[(i + 1) * n2:(i + 2) * n2] << 8)
        t = _shoup_term(gacc, V[g], Vs[g], C[g], q)
        acc = t if acc is None else _add_mod(acc, t, q)
    return acc                                             # (n2, n1) u32


def _big_stage_matmul(X, w_ref, ps):
    """Batched stage: digitize (rows, n1) -> (rows, nd_x*n1) int8 (lane
    concat), one right matmul.  Returns (rows, nd_w*n1) int32."""
    xb, nd_x, nd_w, pair = ps
    mask = (1 << xb) - 1
    digs = [((X >> (xb * j)) & mask).astype(jnp.int8) for j in range(nd_x)]
    Xd = jnp.concatenate(digs, axis=1)
    return jnp.dot(Xd, w_ref, preferred_element_type=jnp.int32)


def _scalar_recombine(p, sc_ref, l, n1, q, ps):
    """Columns [i*n1:(i+1)*n1] of p are digit-i accumulators; combine with
    the scalar Shoup table sc = [V | Vs | C] for this limb."""
    xb, nd_x, nd_w, pair = ps
    G = len(_groups_of(ps))
    out = None
    for g, i in enumerate(_groups_of(ps)):
        gacc = p[:, i * n1:(i + 1) * n1]
        if pair and i + 1 < nd_w:
            gacc = gacc + (p[:, (i + 1) * n1:(i + 2) * n1] << 8)
        t = _shoup_term(gacc, sc_ref[l, g], sc_ref[l, G + g],
                        sc_ref[l, 2 * G + g], q)
        out = t if out is None else _add_mod(out, t, q)
    return out


def _fwd_kernel(ft: FusedNtt, Bb: int):
    n1, n2 = ft.n1, ft.n2

    def kernel(q_ref, sc2_ref, x_ref, w1_ref, vf_ref, vfs_ref, cf_ref,
               w2_ref, y_ref):
        l = pl.program_id(0)
        q = q_ref[l, 0]
        rows = []
        for b in range(Bb):
            A = x_ref[0, 0, b].reshape(n2, n1)
            rows.append(_small_stage(A, w1_ref[0], vf_ref[:, 0],
                                     vfs_ref[:, 0], cf_ref[:, 0], q,
                                     ft.ps_small_f, n2))
        Bm = jnp.concatenate(rows, axis=0) if Bb > 1 else rows[0]
        p2 = _big_stage_matmul(Bm, w2_ref[0], ft.ps_big_f)
        y_ref[0, 0] = _scalar_recombine(p2, sc2_ref, l, n1, q, ft.ps_big_f)

    return kernel


def _inv_kernel(ft: FusedNtt, Bb: int):
    n1, n2 = ft.n1, ft.n2
    ps_big, ps_small = ft.ps_big_i, ft.ps_small_i

    def kernel(q_ref, sc2_ref, y_ref, w2i_ref, vi_ref, vis_ref, ci_ref,
               w1i_ref, x_ref):
        l = pl.program_id(0)
        q = q_ref[l, 0]
        Y = y_ref[0, 0].reshape(Bb * n2, n1)
        p = _big_stage_matmul(Y, w1i_ref[0], ps_big)
        # per-element folded twiddle recombination, tiled over the Bb polys
        xb_b, nd_x_b, nd_w_b, pair_b = ps_big
        acc = None
        for g, i in enumerate(_groups_of(ps_big)):
            gacc = p[:, i * n1:(i + 1) * n1]
            if pair_b and i + 1 < nd_w_b:
                gacc = gacc + (p[:, (i + 1) * n1:(i + 2) * n1] << 8)
            u = vi_ref[g, 0]
            us = vis_ref[g, 0]
            uc = ci_ref[g, 0]
            if Bb > 1:
                u = jnp.concatenate([u] * Bb, axis=0)
                us = jnp.concatenate([us] * Bb, axis=0)
                uc = jnp.concatenate([uc] * Bb, axis=0)
            t = _shoup_term(gacc, u, us, uc, q)
            acc = t if acc is None else _add_mod(acc, t, q)
        # second stage: per-poly left matmuls contracting k2
        xb_s, nd_x_s, nd_w_s, pair_s = ps_small
        G2 = len(_groups_of(ps_small))
        mask = (1 << xb_s) - 1
        for b in range(Bb):
            D = acc[b * n2:(b + 1) * n2]
            digs = [((D >> (xb_s * j)) & mask).astype(jnp.int8)
                    for j in range(nd_x_s)]
            Dd = jnp.concatenate(digs, axis=0)
            p2 = jnp.dot(w2i_ref[0], Dd, preferred_element_type=jnp.int32)
            out = None
            for g, i in enumerate(_groups_of(ps_small)):
                gacc = p2[i * n2:(i + 1) * n2]
                if pair_s and i + 1 < nd_w_s:
                    gacc = gacc + (p2[(i + 1) * n2:(i + 2) * n2] << 8)
                t = _shoup_term(gacc, sc2_ref[l, g], sc2_ref[l, G2 + g],
                                sc2_ref[l, 2 * G2 + g], q)
                out = t if out is None else _add_mod(out, t, q)
            x_ref[0, 0, b * n2:(b + 1) * n2] = out

    return kernel


# deferred imports so interpret-mode tests work without a TPU runtime
from jax.experimental import pallas as pl                     # noqa: E402
from jax.experimental.pallas import tpu as pltpu              # noqa: E402

import os                                                     # noqa: E402

# interpret mode (CPU): exercises the kernel logic without Mosaic; used by
# tests/test_ntt_fused.py so kernel correctness is covered in the CPU suite
_INTERPRET = os.environ.get("RFHE_TPU_PALLAS_INTERPRET", "0") == "1"


def _block_bb(ft: FusedNtt, B: int) -> int:
    """Largest poly-block size that fits the VMEM budget (and divides B if
    possible; otherwise the wrapper pads)."""
    n = ft.n
    L = ft.L
    # per-poly VMEM (measured shape accounting at n=65536): x + out + Bm
    # (u32) + stage int32 accumulators (2 * nd_w * n * 4) + int8 digit
    # operands (~2 * nd_x * n); ~42 bytes/coefficient total
    per_b = n * 42
    # the streamed per-limb table blocks (both weight matrices + the three
    # twiddle tables, double-buffered) come out of the same 16 MB and grow
    # with n — ignoring them OOMed the n=32768 21-limb keyswitch by 212 KB
    per_limb_tab = max(
        ft.W1.nbytes + ft.W2.nbytes + 3 * ft.Vf.nbytes,
        ft.W1i.nbytes + ft.W2i.nbytes + 3 * ft.Vi.nbytes) // max(1, L)
    budget = max(per_b, _VMEM_TOTAL - 2 * per_limb_tab)
    cap = max(1, min(_MAX_BB, budget // per_b))
    if n >= 65536:
        cap = 1          # measured: bb=1 beats bb=2 by 1.3x at n=65536

    if B <= cap:
        return B
    for bb in range(cap, 0, -1):
        if B % bb == 0:
            return bb
    return cap


def _dispatch(ft: FusedNtt, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    L = ft.L
    n, n1, n2 = ft.n, ft.n1, ft.n2
    assert x.shape[-1] == n and x.shape[-2] == L, (x.shape, L, n)
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    xb3 = x.reshape((B, L, n))
    xt = jnp.moveaxis(xb3, 1, 0)                     # (L, B, n)
    Bb = _block_bb(ft, B)
    nb = -(-B // Bb)
    if nb * Bb != B:
        xt = jnp.pad(xt, ((0, 0), (0, nb * Bb - B), (0, 0)))
    # poly-block axis becomes its own dim so every BlockSpec's trailing two
    # dims equal the full array dims (Mosaic layout constraint)
    xt = xt.reshape(L, nb, Bb, n)
    y = _call(ft, xt, Bb, nb, inverse)
    y = y.reshape(L, nb * Bb, n)[:, :B]
    out = jnp.moveaxis(y, 0, 1)
    return out.reshape(lead + (L, n)) if lead else out.reshape(L, n)


def _call(ft: FusedNtt, xt: jnp.ndarray, Bb: int, nb: int, inverse: bool):
    L, n, n1, n2 = ft.L, ft.n, ft.n1, ft.n2

    def vspec(shape3, imap):
        return pl.BlockSpec(shape3, imap, memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if inverse:
        kernel = _inv_kernel(ft, Bb)
        big_w, small_w = ft.W1i, ft.W2i
        V, Vs, C = ft.Vi, ft.Vis, ft.Ci
        sc = ft.sc2i
    else:
        kernel = _fwd_kernel(ft, Bb)
        big_w, small_w = ft.W2, ft.W1
        V, Vs, C = ft.Vf, ft.Vfs, ft.Cf
        sc = ft.sc2
    # Digit-group count of the folded-twiddle tables for THIS direction.
    # (Vf and Vi group counts can differ — e.g. 31-bit primes where the
    # inverse big stage needs 5 weight digits but the forward small stage
    # packs into 4; using Vf's count for the inverse BlockSpec read past the
    # block and silently corrupted the recombination.)
    G1 = V.shape[0]
    in_specs = [
        smem, smem,
        vspec((1, 1, Bb, n), lambda l, bb: (l, bb, 0, 0)),
        vspec((1,) + small_w.shape[1:], lambda l, bb: (l, 0, 0)),
        vspec((G1, 1, n2, n1), lambda l, bb: (0, l, 0, 0)),
        vspec((G1, 1, n2, n1), lambda l, bb: (0, l, 0, 0)),
        vspec((G1, 1, n2, n1), lambda l, bb: (0, l, 0, 0)),
        vspec((1,) + big_w.shape[1:], lambda l, bb: (l, 0, 0)),
    ]
    out_spec = pl.BlockSpec((1, 1, Bb * n2, n1), lambda l, bb: (l, bb, 0, 0),
                            memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(L, nb),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((L, nb, Bb * n2, n1), jnp.uint32),
        interpret=_INTERPRET,
    )
    return fn(ft.q_col, sc, xt, small_w, V, Vs, C, big_w)
