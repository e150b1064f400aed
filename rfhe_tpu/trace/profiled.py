"""Phase-decomposed profiled evaluator ops (L6).

The reference obtains per-kernel cost breakdowns by patching SEAL to print
[NTT]/[MODREDUCTION]/[MULTEVK] timings inside each frontend op
(build/sample.txt) and aggregating with sum_trace.  Under XLA we can't time
inside one fused program, so the profiled rotation executes the SAME math as
fhe.keys.keyswitch but split into separately-jitted phases, each timed with
block_until_ready and emitted in the reference's kernel-line format:

  PERMUTE   galois slot permutation           (apply_galois)
  INTT      c1 back to coefficient domain
  BASECONV  digit extension to the (Q, p) basis
  NTT       forward NTTs of all digits
  MULTEVK   dyadic MAC against the key + digit tree-sum
  MODDOWN   divide-and-round by the special prime (itself 1 INTT + 1 NTT +
            scalar work; counted under MODDOWN)

Phase timings feed figures/draw_rotation (the eva_4-class breakdown).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..fhe.ckks import Ciphertext, CkksContext
from ..fhe.keys import _basis_plan, _sum_digits, compute_digits
from ..fhe.rns import RnsPoly, drop_limb
from ..ops import u32
from ..ops.ntt_pease import negacyclic_intt, negacyclic_ntt
from .markers import TraceCollector


class ProfiledRotation:
    def __init__(self, ckks: CkksContext):
        self.ckks = ckks
        self._jits: Dict = {}

    def _jit(self, name, fn):
        if name not in self._jits:
            from ..utils.jitcache import hoisted_jit
            self._jits[name] = hoisted_jit(fn)
        return self._jits[name]

    def rotate(self, ct: Ciphertext, r: int,
               collector: Optional[TraceCollector] = None) -> Ciphertext:
        ckks = self.ckks
        ctx = ckks.ctx
        col = collector if collector is not None else TraceCollector()
        g = ckks.rotation_galois_element(r)
        ksk = ckks.galois_key(g)
        level = ct.level
        L_sp = ckks.L
        n_sp = len(ctx.moduli) - ckks.L
        sp_idx = list(range(ckks.L, ckks.L + n_sp))
        lim = list(range(level + 1)) + sp_idx
        sub_plan = _basis_plan(ctx, lim)
        perm = jnp.asarray(ctx.galois_perm(g))
        lim_idx = jnp.asarray(lim)

        def sync(x):
            jax.block_until_ready(x)
            return x

        with col.scope("ROTATE"):
            with col.kernel("PERMUTE"):
                f = self._jit("perm", lambda c0, c1: (c0[:, perm], c1[:, perm]))
                c0g, c1g = sync(f(ct.c[0].data, ct.c[1].data))
            with col.kernel("INTT"):
                f = self._jit(("intt", level), lambda x: negacyclic_intt(
                    x, ctx.plan.slice(level + 1)))
                d = sync(f(c1g))
            with col.kernel("BASECONV"):
                def extend(dc):
                    dig_, _, _ = compute_digits(dc, level, ctx, ckks.L,
                                                ckks.dnum)
                    return dig_
                f = self._jit(("ext", level), extend)
                dig = sync(f(d))
                _, used, _ = compute_digits(
                    jnp.zeros_like(d), level, ctx, ckks.L, ckks.dnum)
                used_idx = jnp.asarray(used)
            with col.kernel("NTT"):
                f = self._jit(("ntt", level),
                              lambda x: negacyclic_ntt(x, sub_plan))
                dig_ntt = sync(f(dig))
            with col.kernel("MULTEVK"):
                def mac(dn, kb, ka):
                    q = sub_plan.q_arr[:, None]
                    qinv = sub_plan.qinv_arr[:, None]
                    t0 = u32.mont_mul(dn, kb, q, qinv)
                    t1 = u32.mont_mul(dn, ka, q, qinv)
                    return _sum_digits(t0, q), _sum_digits(t1, q)
                f = self._jit(("mac", level), mac)
                acc0, acc1 = sync(f(dig_ntt, ksk.b[used_idx][:, lim_idx],
                                    ksk.a[used_idx][:, lim_idx]))
            with col.kernel("MODDOWN"):
                def moddown(a0, a1, c0):
                    for k_i in range(n_sp - 1, -1, -1):
                        keep = list(range(level + 1)) + sp_idx[:k_i]
                        a0 = drop_limb(a0, sp_idx[k_i], keep, ctx)
                        a1 = drop_limb(a1, sp_idx[k_i], keep, ctx)
                    q = ctx.plan.q_arr[:level + 1, None]
                    return u32.add_mod(c0, a0, q), a1
                f = self._jit(("moddown", level), moddown)
                c0, c1 = sync(f(acc0, acc1, c0g))
        out = Ciphertext([RnsPoly(c0, True), RnsPoly(c1, True)], ct.scale)
        self.last_collector = col
        return out

    def breakdown(self) -> Dict[str, float]:
        """Phase shares mapped onto the reference's rotation categories
        (draw_rotation.py: NTT / ModMul / BaseConv / Others)."""
        tot = self.last_collector.totals()
        ntt = tot.get("NTT", 0) + tot.get("INTT", 0)
        modmul = tot.get("MULTEVK", 0)
        baseconv = tot.get("BASECONV", 0)
        others = tot.get("PERMUTE", 0) + tot.get("MODDOWN", 0)
        s = ntt + modmul + baseconv + others
        return {
            "NTT": ntt / s, "ModMul": modmul / s,
            "BaseConv": baseconv / s, "Others": others / s,
            "total_us": tot.get("ROTATE", s),
        }
