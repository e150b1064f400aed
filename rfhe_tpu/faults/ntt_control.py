"""Non-four-step (standard NTT) control campaign — the reference's control
experiment (rfhe_framewk/src/ntt_test/non_four_step_ntt_sim.cpp): a standard
radix-2 NTT protected only by

  LazyChecker     √n buckets accumulating (actual, recomputed-true) butterfly
                  products, verified mod Q at the end (:135-158).  A fault
                  injected AT a multiply always desynchronizes its bucket
                  (δ ≢ 0 mod Q), so multiplier faults are caught; a storage
                  fault BETWEEN ops corrupts the recomputed-true side
                  consistently and is invisible to the buckets.
  Global ABFT     random-projection <ŵ, x> == <w, NTT(x)> (:220-235), which
                  catches any corruption with probability 1 − 1/q.

This gives the paper's control comparison: without the four-step factorization
the layered detectors collapse to a single 1/q-collision projection for
storage faults (draw_non_4step_ntt.py figure).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.modring import ModArith
from ..ops.ntt import NttPlan, ntt
from .inject import inject_kind


def _ntt_with_stage_injection(x, plan: NttPlan, stage_sel, kind: str,
                              key, q: int):
    """Standard (cyclic) NTT with a fault injected into the working array
    after stage `stage_sel` (a traced int; -1 = inject into the input —
    a pure storage fault before any butterflies)."""
    n = plan.n
    log_n = n.bit_length() - 1
    bw = q.bit_length()
    shape = x.shape
    x = jnp.where(stage_sel == -1, inject_kind(kind, key, x, q, bw), x)
    for s in range(log_n):
        m = n >> s
        half = m // 2
        xr = x.reshape(shape[:-1] + (n // m, m))
        a = xr[..., :half]
        b = xr[..., half:]
        from ..ops.u32 import add_mod, sub_mod, mul_mod_shoup
        u = add_mod(a, b, q)
        w, ws = plan.stage_w(s)
        v = mul_mod_shoup(sub_mod(a, b, q), w, ws, q)
        x = jnp.concatenate([u, v], axis=-1).reshape(shape)
        x = jnp.where(stage_sel == s, inject_kind(kind, key, x, q, bw), x)
    return x


def standard_ntt_campaign(kind: str, target: str, trials: int, n: int,
                          q: int, seed: int = 42) -> Dict:
    """target: 'mult' (fault at a butterfly multiply — LazyChecker territory)
    or 'storage' (fault written into the array between stages — only the
    global ABFT projection can see it)."""
    plan = NttPlan.make(n, q)
    arith = ModArith.make(q)

    def trial(key):
        ks = jax.random.split(key, 4)
        x = jax.random.randint(ks[0], (n,), 0, q, dtype=jnp.uint32)
        y_clean = ntt(x, plan)
        if target == "mult":
            # a fault at a multiply desynchronizes (actual, true) in its
            # bucket by δ ≠ 0 (mod q): the lazy checker always fires; model
            # the faulty value flowing onward like the reference does
            stage = jax.random.randint(ks[1], (), 0, n.bit_length() - 1)
            y = _ntt_with_stage_injection(x, plan, stage, kind, ks[2], q)
            lazy_detect = jnp.any(y != y_clean) | True   # δ ≢ 0 mod q always
        else:
            stage = jax.random.randint(ks[1], (), -1, n.bit_length() - 1)
            y = _ntt_with_stage_injection(x, plan, stage, kind, ks[2], q)
            lazy_detect = jnp.asarray(False)             # invisible to buckets
        # global ABFT: <w, y> == <(W·P)w, x> where P is the bit-reverse
        # permutation of our DIF output; (W·P)w = bitrev(NTT(bitrev(w)))
        # since W is symmetric and P an involution
        from ..ops.ntt import bit_reverse_indices
        rev = jnp.asarray(bit_reverse_indices(n))
        w = jax.random.randint(ks[3], (n,), 0, q, dtype=jnp.uint32)
        w_hat = ntt(w[rev], plan)[rev]
        lhs = arith.dot(w_hat, x)
        rhs = arith.dot(w, y)
        abft_detect = lhs != rhs
        harmful = jnp.any(y != y_clean)
        return harmful, lazy_detect, abft_detect

    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    harmful, lazy, abft = jax.jit(jax.vmap(trial))(keys)
    harmful = np.asarray(harmful)
    lazy = np.asarray(lazy)
    abft = np.asarray(abft)
    det = lazy | abft
    miss = float((harmful & ~det).sum() / max(1, harmful.sum()))
    return {
        "miss_rate": miss,
        "harmful": int(harmful.sum()),
        "lazy_catch": int((harmful & lazy).sum()),
        "abft_catch": int((harmful & abft & ~lazy).sum()),
        "abft_only_miss": float((harmful & ~abft).sum() / max(1, harmful.sum())),
    }
