"""Protected CKKS evaluator: the ABFT detectors running on the production
kernels (VERDICT round-2 item #2).

The reference's end-to-end overhead story is a cost model
(profile_framewk/draw_scripts/draw_atom_opt_cost.py:11-15: NTT x1.009-1.033,
BaseConv ~x1.000, ModMul x1.1406, Others x2) — its detectors were never
integrated into SEAL's evaluator.  This module integrates them: every phase
of the hybrid-GHS keyswitch (the hot path of rotation and relinearization,
fhe/keys.py:keyswitch) runs with a matched detector, inside ONE jitted
program, on the same MxuNttPlan / fused-Pallas kernels the plain evaluator
uses:

  PERMUTE    duplicated gather behind an optimization_barrier (Others x2,
             draw_atom_opt_cost.py:15)
  INTT/NTT   NttGuard end-to-end random projection (protect/ntt_guard.py;
             the production-path analog of relia_ntt_sim.py:179-219's
             stage projections), miss probability ~1/q
  BASECONV   appended-checksum ECC in the exact-integer form: the per-limb
             digit extension is linear over Z mod each target modulus, so
             sum(dig[g,i]) mod q_i must equal the exact 64-bit input sum
             reduced mod q_i (the rebuild of baseConv.py:42-98's checksum
             row for the residue-extension algorithm)
  MULTEVK    intra fold product check on every dyadic Montgomery product
             (barrett_final.py:137-142) + digit tree-sum recomputed in
             reversed order behind a barrier
  MODDOWN    NttGuard on the special-limb INTT and the delta NTT + the
             centered-lift checksum (sum(delta_i) == S - q_sp*n_over mod q_i)

Scope: every keyswitch configuration the plain evaluators run — per-limb
or dnum-grouped digits, one or multiple special primes, CKKS (t=None) and
BGV (t-aware mod-down).  The digit path is SHARED with the plain evaluator
(fhe/keys.py:compute_digits with_ecc=True), so the protected and plain
keyswitches cannot silently diverge.

Returned flags are per-phase booleans; `all_ok(flags)` reduces them.  The
flip campaign (faults/evaluator_campaign.py) injects single-bit faults into
each intermediate and verifies the matching detector fires.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u32
from ..ops.modring import sum_mod
from ..protect.checks import mont_mul_checked, sum_u64_exact
from ..protect.ntt_guard import NttGuard
from .ckks import Ciphertext, CkksContext
from .keys import _basis_plan, compute_digits
from .rns import RnsPoly, _mont_qinv, _mont_r2, lift_to_limbs, limb_plan


@dataclass(frozen=True)
class Fault:
    """Single-bit flip injected into a named keyswitch intermediate.

    stage is static (one compile per stage); limb/idx/bit may be Python ints
    or traced scalars (campaigns sweep them without recompiling)."""
    stage: str            # c1_perm | intt_out | digits | digits_ntt |
                          # prod0 | acc0 | ks_out
    limb: object = 0
    idx: object = 0
    bit: object = 0


def _flip2(x: jnp.ndarray, limb, idx, bit) -> jnp.ndarray:
    """XOR bit into element [limb, idx] of a (L, N) array.

    Formulated as a one-hot XOR mask, NOT a scatter: vmapped scatters with
    traced indices into a trial-invariant operand have been observed to
    silently DROP updates at batch >= ~1024 on this TPU runtime (diff
    pattern: the faulted output equaled the clean one bit-for-bit — the
    flip vanished, it did not cancel).  The mask form lowers to pure
    elementwise ops and is immune; cost is one L*N compare per flip."""
    onehot = (jnp.arange(x.shape[0])[:, None] == limb) \
        & (jnp.arange(x.shape[1])[None, :] == idx)
    mask = jnp.where(onehot, jnp.uint32(1) << jnp.asarray(bit, jnp.uint32),
                     jnp.uint32(0))
    return x ^ mask


def all_ok(flags: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    acc = None
    for v in flags.values():
        r = jnp.all(v)
        acc = r if acc is None else acc & r
    return acc


class ProtectedCkks:
    """Detector-instrumented evaluator over an existing CkksContext.

    rotate(ct, r) / multiply_relin(a, b) mirror the plain evaluator's
    results bit-for-bit (tests/test_protected.py) and additionally return
    the per-phase ok flags."""

    def __init__(self, ckks: CkksContext):
        self.ckks = ckks
        self.guard = NttGuard.make(ckks.ctx.plan)
        self._ks_t = getattr(ckks, "_ks_t", None)    # None for CKKS
        self._jits: Dict = {}

    def _jit(self, name, fn):
        if name not in self._jits:
            from ..utils.jitcache import hoisted_jit
            self._jits[name] = hoisted_jit(fn)
        return self._jits[name]

    # ------------------------------------------------------------------
    # protected keyswitch core (per-limb digits, one special prime)
    # ------------------------------------------------------------------
    def _keyswitch_protected(self, d: jnp.ndarray, level: int,
                             ksk_b: jnp.ndarray, ksk_a: jnp.ndarray,
                             flags: Dict, fault: Optional[Fault]):
        """Full protected hybrid keyswitch: digits (shared implementation,
        fhe/keys.py:compute_digits with the appended-checksum ECC), guarded
        NTT, checked dyadic MACs, checked tree-sum, guarded multi-special
        mod-down.  Supports every (dnum, n_special, t) configuration the
        plain fhe/keys.py:keyswitch does — same algebra, same tables."""
        ctx = self.ckks.ctx
        L = self.ckks.L
        dnum = self.ckks.dnum
        n_sp = len(ctx.moduli) - L
        sp_idx = list(range(L, L + n_sp))
        active = level + 1
        # BASECONV: the production digit path + exact-sum checksum refs
        dig, used, lim, refs = compute_digits(d, level, ctx, L, dnum,
                                              with_ecc=True)
        if fault is not None and fault.stage == "digits":
            dig = dig.at[0].set(_flip2(dig[0], fault.limb, fault.idx,
                                       fault.bit))
        moduli = ctx.moduli
        ecc = [sum_mod(dig[:, ii], moduli[i], axis=-1) == refs[:, ii]
               for ii, i in enumerate(lim)]
        flags["baseconv"] = jnp.stack(ecc)

        sub_plan = _basis_plan(ctx, lim)
        g_sub = self.guard.take(lim)
        q_lim = sub_plan.q_arr[:, None]
        qinv_lim = sub_plan.qinv_arr[:, None]

        # NTT of all digits (guarded)
        from ..ops.ntt_pease import negacyclic_ntt
        dig_ntt = negacyclic_ntt(dig, sub_plan)
        if fault is not None and fault.stage == "digits_ntt":
            dig_ntt = dig_ntt.at[0].set(_flip2(dig_ntt[0], fault.limb,
                                               fault.idx, fault.bit))
        flags["ntt"] = g_sub.check_fwd(dig, dig_ntt)

        # MULTEVK: dyadic MACs with the intra fold check
        lim_idx = jnp.asarray(lim)
        used_idx = jnp.asarray(used)
        kb = ksk_b[used_idx][:, lim_idx]
        ka = ksk_a[used_idx][:, lim_idx]
        t0, ok0 = mont_mul_checked(dig_ntt, kb, q_lim, qinv_lim)
        t1, ok1 = mont_mul_checked(dig_ntt, ka, q_lim, qinv_lim)
        if fault is not None and fault.stage == "prod0":
            # post-check storage flip: a documented miss window (the stage
            # detectors bound COMPUTE faults; storage faults between the
            # last invariant and the consumer are the LazyChecker gap the
            # control campaign measures, faults/ntt_control.py)
            t0 = t0.at[0].set(_flip2(t0[0], fault.limb, fault.idx, fault.bit))
        flags["multevk"] = jnp.all(ok0, axis=(-1, -2)) \
            & jnp.all(ok1, axis=(-1, -2))
        acc0 = _tree_sum_checked(t0, q_lim, flags, "sum0")
        acc1 = _tree_sum_checked(t1, q_lim, flags, "sum1")
        if fault is not None and fault.stage == "acc0":
            acc0 = _flip2(acc0, fault.limb, fault.idx, fault.bit)

        # MODDOWN by each special prime (t-aware in BGV), guarded — both
        # accumulators ride one batched call (mirrors fhe/keys.py:keyswitch:
        # the special-limb INTT and delta NTT amortize over the batch)
        acc = jnp.stack([acc0, acc1])
        for k_i in range(n_sp - 1, -1, -1):
            keep = list(range(active)) + sp_idx[:k_i]
            acc = self._drop_limb_protected(acc, sp_idx[k_i], keep, flags,
                                            f"md{k_i}" if k_i else "md",
                                            t=self._ks_t)
        if fault is not None and fault.stage == "ks_out":
            acc = acc.at[0].set(_flip2(acc[0], fault.limb, fault.idx,
                                       fault.bit))
        return acc[0], acc[1]

    def _drop_limb_protected(self, data: jnp.ndarray, src_k: int, keep,
                             flags: Dict, tag: str,
                             t: Optional[int] = None) -> jnp.ndarray:
        """rns.drop_limb with guarded transforms and the centered-lift
        checksum.  data may carry leading batch dims (..., nk+1, N) — the
        keyswitch stacks both accumulators.  t given = BGV mode: the lift
        is δ = [c]_c − q_src·[[c]_c·q_src^{-1}]_t, and the checksum tracks
        both exact sums (rns.drop_limb:215-258 is the unprotected twin)."""
        ctx = self.ckks.ctx
        nk = len(keep)
        lp = limb_plan(ctx, src_k)
        g_src = self.guard.take([src_k])
        from ..ops.ntt_pease import negacyclic_intt, negacyclic_ntt
        src_row = negacyclic_intt(data[..., nk:nk + 1, :], lp)
        flags[f"{tag}_intt"] = g_src.check_inv(data[..., nk:nk + 1, :],
                                               src_row)
        ck = src_row[..., 0, :]
        q_src = ctx.moduli[src_k]
        delta = lift_to_limbs(ck, src_k, keep, ctx, centered=True)
        # checksum ref: sum(delta_i) == (S - q_src*n_over) mod q_i, S exact
        s_hi, s_lo = sum_u64_exact(ck)
        n_over = jnp.sum((ck > (q_src // 2)).astype(jnp.uint32), axis=-1)
        if t is not None:
            # BGV correction r = [ck_c * q_src^{-1}]_t (centered), applied
            # per kept limb as delta -= q_src*r_c; checksum follows suit
            from ..numth import barrett_constants, mod_inv
            over = ck > (q_src // 2)
            mu_t, k_t = barrett_constants(t)
            inv_t = mod_inv(q_src, t)
            hi, lo = u32.mul32_parts(ck, jnp.uint32(inv_t))
            r = u32.barrett_reduce64(hi, lo, t, mu_t, k_t)
            r = jnp.where(over, u32.sub_mod(r, jnp.uint32(1), t), r)
            r_over = r > (t // 2)
            sr_hi, sr_lo = sum_u64_exact(r)
            n_r_over = jnp.sum(r_over.astype(jnp.uint32), axis=-1)
        oks = []
        rows = []
        for ri, i in enumerate(keep):
            qi = ctx.moduli[i]
            ref = u32.barrett_reduce64(s_hi, s_lo, qi, ctx.barrett_mu[i],
                                       ctx.barrett_k[i])
            corr = u32.mul_mod(jnp.uint32(q_src % qi),
                               u32.barrett_reduce64(
                                   jnp.zeros_like(n_over), n_over, qi,
                                   ctx.barrett_mu[i], ctx.barrett_k[i]),
                               qi, _mont_qinv(qi), _mont_r2(qi))
            ref = u32.sub_mod(ref, corr, jnp.uint32(qi))
            d_i = delta[..., ri, :]
            if t is not None:
                r_c = jnp.where(r_over, u32.sub_mod(
                    r, jnp.uint32(t % qi), qi), r)
                qs_r = u32.mul_mod(jnp.uint32(q_src % qi), r_c, qi,
                                   _mont_qinv(qi), _mont_r2(qi))
                d_i = u32.sub_mod(d_i, qs_r, qi)
                # ref -= q_src * (S_r - t*n_r_over) mod q_i
                sr_red = u32.barrett_reduce64(sr_hi, sr_lo, qi,
                                              ctx.barrett_mu[i],
                                              ctx.barrett_k[i])
                tn = u32.mul_mod(jnp.uint32(t % qi),
                                 u32.barrett_reduce64(
                                     jnp.zeros_like(n_r_over), n_r_over, qi,
                                     ctx.barrett_mu[i], ctx.barrett_k[i]),
                                 qi, _mont_qinv(qi), _mont_r2(qi))
                s_rc = u32.sub_mod(sr_red, tn, jnp.uint32(qi))
                ref = u32.sub_mod(ref, u32.mul_mod(
                    jnp.uint32(q_src % qi), s_rc, qi, _mont_qinv(qi),
                    _mont_r2(qi)), jnp.uint32(qi))
            oks.append(sum_mod(d_i, qi, axis=-1) == ref)
            rows.append(d_i)
        delta = jnp.stack(rows, axis=-2)
        flags[f"{tag}_lift"] = jnp.stack(oks)
        keep_plan = ctx.plan.take(keep)
        delta_ntt = negacyclic_ntt(delta, keep_plan)
        flags[f"{tag}_ntt"] = self.guard.take(keep).check_fwd(delta, delta_ntt)
        keep_idx = np.asarray(keep)
        q_lo = ctx.plan.q_arr[keep_idx, None]
        num = u32.sub_mod(data[..., :nk, :], delta_ntt, q_lo)
        out = u32.mul_mod_shoup(num, ctx.qk_inv[src_k][keep_idx, None],
                                ctx.qk_inv_shoup[src_k][keep_idx, None], q_lo)
        flags[f"{tag}_range"] = jnp.all(out < q_lo)
        return out

    # ------------------------------------------------------------------
    # public protected ops
    # ------------------------------------------------------------------
    def _galois_impl(self, ct: Ciphertext, ksk, g: int, level: int,
                     fault: Optional[Fault]):
        ckks, ctx = self.ckks, self.ckks.ctx
        flags: Dict[str, jnp.ndarray] = {}
        perm = jnp.asarray(ctx.galois_perm(g))
        active = level + 1
        plan = ctx.plan.slice(active)
        c0, c1 = ct.c[0].data, ct.c[1].data
        c0g = c0[:, perm]
        c1g = c1[:, perm]
        # Others x2: duplicated gather on barriered inputs (CSE-proof)
        c0b, c1b = jax.lax.optimization_barrier((c0, c1))
        flags["permute"] = jnp.all(c0b[:, perm] == c0g) \
            & jnp.all(c1b[:, perm] == c1g)
        if fault is not None and fault.stage == "c1_perm":
            c1g = _flip2(c1g, fault.limb, fault.idx, fault.bit)
        from ..ops.ntt_pease import negacyclic_intt
        d = negacyclic_intt(c1g, plan)
        if fault is not None and fault.stage == "intt_out":
            d = _flip2(d, fault.limb, fault.idx, fault.bit)
        flags["intt"] = self.guard.slice(active).check_inv(c1g, d)
        k0, k1 = self._keyswitch_protected(d, level, ksk.b, ksk.a, flags,
                                           fault)
        qb = plan.q_arr[:, None]
        c0_out = u32.add_mod(c0g, k0, qb)
        return (Ciphertext([RnsPoly(c0_out, True), RnsPoly(k1, True)],
                           ct.scale, correction=ct.correction), flags)

    def apply_galois(self, ct: Ciphertext, g: int,
                     fault: Optional[Fault] = None
                     ) -> Tuple[Ciphertext, Dict]:
        assert ct.size == 2
        ksk = self.ckks.galois_key(g)
        lvl = ct.level
        key = ("pgalois", g, lvl, fault.stage if fault else None)
        if fault is None:
            fn = self._jit(key, lambda c, k: self._galois_impl(
                c, k, g, lvl, None))
            return fn(ct, ksk)
        fn = self._jit(key, lambda c, k, li, ix, bi: self._galois_impl(
            c, k, g, lvl,
            Fault(fault.stage, li, ix, bi)))
        return fn(ct, ksk, jnp.asarray(fault.limb), jnp.asarray(fault.idx),
                  jnp.asarray(fault.bit))

    def rotate(self, ct: Ciphertext, r: int,
               fault: Optional[Fault] = None) -> Tuple[Ciphertext, Dict]:
        return self.apply_galois(
            ct, self.ckks.rotation_galois_element(r), fault)

    def multiply_relin(self, a: Ciphertext, b: Ciphertext,
                       fault: Optional[Fault] = None
                       ) -> Tuple[Ciphertext, Dict]:
        """Tensor product (checked dyadic products) + protected relin."""
        assert a.size == 2 and b.size == 2 and a.level == b.level
        ckks = self.ckks
        lvl = a.level
        rlk = ckks.rlk

        def impl(ac, bc, kb, ka, *dyn):
            ctx = ckks.ctx
            plan = ctx.plan.slice(lvl + 1)
            qb = plan.q_arr[:, None]
            qinvb = plan.qinv_arr[:, None]
            flags: Dict[str, jnp.ndarray] = {}
            f = None
            if dyn:
                f = Fault(fault.stage, *dyn)
            prods = []
            oks = []
            for (x, y) in ((ac[0], bc[0]), (ac[0], bc[1]), (ac[1], bc[0]),
                           (ac[1], bc[1])):
                p, ok = mont_mul_checked(x, y, qb, qinvb)
                prods.append(p)
                oks.append(jnp.all(ok))
            flags["dyadic"] = jnp.stack(oks)
            d0 = prods[0]
            d1 = u32.add_mod(prods[1], prods[2], qb)
            d2 = prods[3]
            from ..ops.ntt_pease import negacyclic_intt
            d2c = negacyclic_intt(d2, plan)
            if f is not None and f.stage == "intt_out":
                d2c = _flip2(d2c, f.limb, f.idx, f.bit)
            flags["intt"] = self.guard.slice(lvl + 1).check_inv(d2, d2c)
            k0, k1 = self._keyswitch_protected(d2c, lvl, kb, ka, flags, f)
            c0 = u32.add_mod(d0, k0, qb)
            c1 = u32.add_mod(d1, k1, qb)
            corr = ((a.correction * b.correction) % self._ks_t
                    if self._ks_t else 1)
            return (Ciphertext([RnsPoly(c0, True), RnsPoly(c1, True)],
                               a.scale * b.scale, correction=corr), flags)

        key = ("pmulrelin", lvl, fault.stage if fault else None)
        if fault is None:
            fn = self._jit(key, lambda ac, bc, kb, ka: impl(ac, bc, kb, ka))
            return fn([c.data for c in a.c], [c.data for c in b.c],
                      rlk.b, rlk.a)
        fn = self._jit(key, impl)
        return fn([c.data for c in a.c], [c.data for c in b.c],
                  rlk.b, rlk.a, jnp.asarray(fault.limb),
                  jnp.asarray(fault.idx), jnp.asarray(fault.bit))


class ProtectedBgv(ProtectedCkks):
    """Detector-instrumented BGV evaluator: the same protected keyswitch
    with the t-aware mod-down (δ ≡ 0 mod t; rns.drop_limb BGV branch) and
    decryption corrections tracked as in fhe/bgv.py.  rotate_rows and
    multiply_relin mirror BgvContext's results bit-for-bit
    (tests/test_protected.py)."""

    def __init__(self, bgv):
        # BgvContext exposes the same surface the protected core needs:
        # .ctx, .L, .dnum, .galois_key, .rlk
        self.ckks = bgv
        self.guard = NttGuard.make(bgv.ctx.plan)
        self._ks_t = bgv.t
        self._jits: Dict = {}

    def rotate_rows(self, ct: Ciphertext, r: int,
                    fault: Optional[Fault] = None) -> Tuple[Ciphertext, Dict]:
        n = self.ckks.params.n
        return self.apply_galois(ct, pow(5, r % (n // 2), 2 * n), fault)


def _tree_sum_checked(t: jnp.ndarray, qb: jnp.ndarray, flags: Dict,
                      tag: str) -> jnp.ndarray:
    """Digit tree-sum + independent reversed-order re-sum behind a barrier
    (duplicate-execution check on the accumulation, Others-class)."""
    from .keys import _sum_digits
    acc = _sum_digits(t, qb)
    t2 = jax.lax.optimization_barrier(t)
    acc2 = _sum_digits(t2[::-1], qb)
    flags[tag] = jnp.all(acc == acc2)
    return acc
