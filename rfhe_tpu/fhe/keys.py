"""Key generation and hybrid keyswitching (L4).

Keyswitch design: hybrid GHS with one special prime p and per-limb digits
(dnum = L, α = 1) — the production-grade construction the reference's
substrate libraries (SEAL/Phantom `switch_key`, BASELINE.md: 19.8% of
rotation) implement, re-derived for the TPU stack:

  digits are plain limb residues  D_j(c) = [c]_{q_j}
  ksk_j = (b_j, a_j) over basis (q_0..q_{L-1}, p):
      b_j = −a_j·s + e_j + p·ẽ_j·s'   where [p·ẽ_j]_{q_i} = p·δ_ij
  KS(c) = Σ_j NTT(extend(D_j(c))) ⊙ ksk_j, then mod-down by p.

The CRT idempotents ẽ_j satisfy [ẽ_j]_{q_i} = δ_ij at EVERY level, so one
key serves all levels (slice limbs).  Noise after KS ≈ Σ_j q_j·e_j / p ≈ L·e.

Key material is test-grade (ternary secrets, σ=3.2 gaussians) — the
reference likewise uses library defaults for its fault campaigns
(reliability_test/dotprod_test.cu:73-75).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u32
from .rns import (
    RnsContext, RnsPoly, base_extend_digit, drop_limb, lift_to_limbs,
    negacyclic_ntt, poly_ntt,
)


@dataclass
class SecretKey:
    s_ntt: jnp.ndarray       # (L_full, N) NTT/Montgomery domain incl. special
    s_coeff: np.ndarray      # (N,) ternary in {-1, 0, 1} (host, for debugging)


@dataclass
class PublicKey:
    b: jnp.ndarray           # (L_ct, N) NTT domain (ciphertext primes only)
    a: jnp.ndarray


@jax.tree_util.register_pytree_node_class
@dataclass
class KeySwitchKey:
    """b, a: (n_digits, L_full, N) NTT domain over (q_0..q_{L-1}, p)."""
    b: jnp.ndarray
    a: jnp.ndarray

    def tree_flatten(self):
        return (self.b, self.a), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(b=children[0], a=children[1])


def _rns_from_signed(coeffs: np.ndarray, moduli) -> np.ndarray:
    """Signed integer coefficients -> (L, N) uint32 residues."""
    out = np.empty((len(moduli), coeffs.shape[-1]), dtype=np.uint32)
    for i, q in enumerate(moduli):
        out[i] = np.mod(coeffs.astype(np.int64), q).astype(np.uint32)
    return out


def _sample_ternary(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(-1, 2, size=n).astype(np.int64)


def _sample_gaussian(rng: np.random.Generator, n: int, sigma: float) -> np.ndarray:
    return np.round(rng.normal(0.0, sigma, size=n)).astype(np.int64)


def _sample_uniform_rns(rng: np.random.Generator, moduli, n: int) -> np.ndarray:
    return np.stack([
        rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
        for q in moduli
    ])


@dataclass
class KeyGen:
    ctx: RnsContext              # full basis: ciphertext primes + special
    n_ct_limbs: int              # number of ciphertext primes (excl. special)
    sigma: float = 3.2

    def gen_secret(self, rng: np.random.Generator) -> SecretKey:
        s = _sample_ternary(rng, self.ctx.n)
        s_rns = _rns_from_signed(s, self.ctx.moduli)
        s_ntt = negacyclic_ntt(jnp.asarray(s_rns), self.ctx.plan)
        return SecretKey(s_ntt=s_ntt, s_coeff=s)

    def gen_public(self, sk: SecretKey, rng: np.random.Generator) -> PublicKey:
        L = self.n_ct_limbs
        moduli = self.ctx.moduli[:L]
        a = jnp.asarray(_sample_uniform_rns(rng, moduli, self.ctx.n))
        e = _rns_from_signed(_sample_gaussian(rng, self.ctx.n, self.sigma), moduli)
        e_ntt = negacyclic_ntt(jnp.asarray(e), self.ctx.plan.slice(L))
        q = self.ctx.plan.q_arr[:L, None]
        qinv = self.ctx.plan.qinv_arr[:L, None]
        b = u32.sub_mod(e_ntt, u32.mont_mul(a, sk.s_ntt[:L], q, qinv), q)
        return PublicKey(b=b, a=a)

    def gen_keyswitch(self, sk: SecretKey, s_prime_ntt: jnp.ndarray,
                      rng: np.random.Generator,
                      noise_factor: int = 1) -> KeySwitchKey:
        """Key switching s' -> s.  s_prime_ntt: (L_full, N) NTT domain.
        noise_factor scales the gaussian noise (t for BGV keys).

        Vectorized over digits and jit-compiled: one traced program builds
        all L digit pairs (the eager per-op path was ~100x slower over the
        TPU tunnel)."""
        ctx = self.ctx
        L = self.n_ct_limbs
        n = ctx.n
        p_sp = ctx.moduli[L]
        from ..numth import shoup_precompute
        # host sampling (stacked): a (L, Lf, N) uniform; e (L, N) gaussian
        a = np.stack([_sample_uniform_rns(rng, ctx.moduli, n) for _ in range(L)])
        e = np.stack([
            _rns_from_signed(
                noise_factor * _sample_gaussian(rng, n, self.sigma), ctx.moduli)
            for _ in range(L)
        ])
        pj = np.array([p_sp % ctx.moduli[j] for j in range(L)], dtype=np.uint32)
        pj_s = np.array([shoup_precompute(int(pj[j]), ctx.moduli[j])
                         for j in range(L)], dtype=np.uint32)
        qj = np.array(ctx.moduli[:L], dtype=np.uint32)

        b, a = self._build_jit()(jnp.asarray(a), jnp.asarray(e), sk.s_ntt,
                                 s_prime_ntt, jnp.asarray(pj),
                                 jnp.asarray(pj_s), jnp.asarray(qj))
        return KeySwitchKey(b=b, a=a)

    def _build_jit(self):
        """Cached jitted key-pair builder (one compile per KeyGen)."""
        if not hasattr(self, "_build_fn"):
            ctx = self.ctx
            L = self.n_ct_limbs

            def build(a, e, s_ntt, s_prime, pj, pj_s, qj):
                q = ctx.plan.q_arr[:, None]
                qinv = ctx.plan.qinv_arr[:, None]
                e_ntt = negacyclic_ntt(e, ctx.plan)
                b = u32.sub_mod(e_ntt, u32.mont_mul(a, s_ntt, q, qinv), q)
                # + p·ẽ_j·s' on the (j, j) diagonal limbs
                add_d = u32.mul_mod_shoup(s_prime[:L], pj[:, None],
                                          pj_s[:, None], qj[:, None])
                diag = jnp.arange(L)
                return b.at[diag, diag].set(
                    u32.add_mod(b[diag, diag], add_d, qj[:, None])), a

            object.__setattr__(self, "_build_fn", jax.jit(build))
        return self._build_fn

    def gen_relin(self, sk: SecretKey, rng: np.random.Generator) -> KeySwitchKey:
        """Relinearization key: s' = s^2."""
        q = self.ctx.plan.q_arr[:, None]
        qinv = self.ctx.plan.qinv_arr[:, None]
        s2 = u32.mont_mul(sk.s_ntt, sk.s_ntt, q, qinv)
        return self.gen_keyswitch(sk, s2, rng)

    def gen_galois(self, sk: SecretKey, g: int,
                   rng: np.random.Generator) -> KeySwitchKey:
        """Galois key for automorphism X -> X^g: s' = σ_g(s)."""
        perm = jnp.asarray(self.ctx.galois_perm(g))
        s_g = sk.s_ntt[:, perm]
        return self.gen_keyswitch(sk, s_g, rng)


def keyswitch(d_coeff: jnp.ndarray, ksk: KeySwitchKey, level: int,
              ctx: RnsContext, n_ct_limbs: int,
              t: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a keyswitch key to a coeff-domain poly d (level+1, N).

    Returns (c0_delta, c1_delta) in NTT domain over limbs 0..level — the
    correction pair to add to a ciphertext.  This is the `switch_key` hot path
    (≈20% of a rotation in the reference profile, draw_pie_chart.py:8): per
    digit, one base extension + stacked NTT + dyadic MAC, then one mod-down.
    """
    L_sp = n_ct_limbs                       # index of the special prime
    lim = list(range(level + 1)) + [L_sp]
    digits = []
    for j in range(level + 1):
        ext = []
        v = d_coeff[j]
        zeros = jnp.zeros_like(v)
        for i in lim:
            if i == j:
                ext.append(v)
            elif ctx.moduli[i] > ctx.moduli[j]:
                ext.append(v)
            else:
                ext.append(u32.barrett_reduce64(
                    zeros, v, ctx.moduli[i], ctx.barrett_mu[i],
                    ctx.barrett_k[i]))
        digits.append(jnp.stack(ext))
    dig = jnp.stack(digits)                 # (n_dig, n_lim, N) coeff domain
    # stacked NTT over the sliced basis
    sub_plan = _basis_plan(ctx, lim)
    dig_ntt = negacyclic_ntt(dig, sub_plan)
    # dyadic MAC against the key (slice key limbs to the active basis)
    lim_idx = jnp.asarray(lim)
    kb = ksk.b[:level + 1][:, lim_idx]
    ka = ksk.a[:level + 1][:, lim_idx]
    q = sub_plan.q_arr[:, None]
    qinv = sub_plan.qinv_arr[:, None]
    from ..ops.modring import sum_mod  # local import to avoid cycles
    t0 = u32.mont_mul(dig_ntt, kb, q, qinv)
    t1 = u32.mont_mul(dig_ntt, ka, q, qinv)
    acc0 = _sum_digits(t0, q)
    acc1 = _sum_digits(t1, q)
    # mod-down by the special prime (t-aware in BGV so the rounding noise
    # stays ≡ 0 mod t)
    c0 = drop_limb(acc0, L_sp, level + 1, ctx, t)
    c1 = drop_limb(acc1, L_sp, level + 1, ctx, t)
    return c0, c1


def _sum_digits(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Tree-sum over the digit axis (axis 0) mod q."""
    while t.shape[0] > 1:
        h = t.shape[0] // 2
        rest = t[2 * h:]
        t = u32.add_mod(t[:h], t[h:2 * h], q)
        if rest.shape[0]:
            t = jnp.concatenate([t, rest], axis=0)
    return t[0]


def _basis_plan(ctx: RnsContext, lim: List[int]):
    """Plan restricted to an arbitrary subset of limbs."""
    return ctx.plan.take(lim)
