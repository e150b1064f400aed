"""Monte-Carlo campaigns for protected Barrett / Montgomery reduction with
wide primes (multi-limb arithmetic) — the detector-rate experiments behind
draw_barrett.py and the {intra,range,sum}.txt tables.

Reproduced semantics:
  barrett_scheme_campaign    barret_modmul.py:112-232 — vector Barrett with
    T-stage fold ECC, SN-stage fold ECC, final range window; faults =
    bit flips within bit_length(value) of chosen elements at the T or SN
    stage (50/50); detection rate = TP/(TP+FN) over harmful faults.
  montgomery_campaign        montgomery.py:76-190 — REDC with fold ECC on the
    m = lowT·m' products, fold ECC on m·p, and the final (T+mp) ≡ 0 mod R
    check.
  barrett_final_campaign     barrett_final.py:118-167 — Intra (2^s+1 fold of
    products vs fold(a)·fold(b)), Range (windows inside Barrett), Sum
    (Σ reduced == Σ products mod Q) under 4 fault models.

All trials run as jit(vmap(trial)) over fold-in keys.
"""
from __future__ import annotations

import random as _random
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..numth import barrett_constants, find_prime_with_bitlen, next_prime_ge
from ..ops import bigint
from ..ops.modring import sum_mod


def _limbs(bits: int) -> int:
    return -(-bits // 32)


def _uniform_below(key, shape, p: int, limbs: int) -> jnp.ndarray:
    """Uniform values < p as (..., limbs) via 2·bitlen(p) random bits mod p."""
    raw_limbs = _limbs(2 * p.bit_length())
    raw = jax.random.bits(key, shape + (raw_limbs,), dtype=jnp.uint32)
    mu, k = barrett_constants(p)
    return bigint.barrett_reduce_big(raw, p, mu, k, limbs)


def _rand_below(key, bound: jnp.ndarray) -> jnp.ndarray:
    """Uniform integer in [0, bound) for traced bound (mulhi trick)."""
    r = jax.random.bits(key, bound.shape, dtype=jnp.uint32)
    from ..ops.u32 import mulhi32
    return mulhi32(r, bound)


def _flip_bits_in_elements(key, vals: jnp.ndarray, elem_count: int,
                           bits_per_elem: int) -> jnp.ndarray:
    """Corrupt elem_count distinct elements, flipping bits_per_elem distinct
    bit positions within each value's bit_length (barret_modmul.py:81-109)."""
    n = vals.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.choice(k1, n, shape=(elem_count,), replace=False)
    chosen = vals[idx]
    bl = jnp.maximum(bigint.bit_length(chosen), 1)
    b1 = _rand_below(k2, bl)
    out = bigint.xor_bit(chosen, b1)
    if bits_per_elem >= 2:
        # distinct second position via the shifted-sample trick
        b2 = _rand_below(k3, jnp.maximum(bl - 1, 1))
        b2 = b2 + (b2 >= b1).astype(jnp.uint32)
        out = jnp.where((bl >= 2)[..., None], bigint.xor_bit(out, b2), out)
    return vals.at[idx].set(out)


def _randomize_elements(key, vals: jnp.ndarray, elem_count: int) -> jnp.ndarray:
    """Replace elem_count distinct elements with uniform values of the same
    bit length (MOF: the fault mix behind the measured draw_barrett.py
    tables — the delta is then uniform mod the fold modulus, producing the
    1/M collision ramp the reference's curves show; a pure ±2^j bit-flip
    delta can never be ≡ 0 mod 2^w−1, which would flatline the sweep)."""
    n = vals.shape[0]
    k1, k2 = jax.random.split(key)
    idx = jax.random.choice(k1, n, shape=(elem_count,), replace=False)
    chosen = vals[idx]
    bl = jnp.maximum(bigint.bit_length(chosen), 1)
    rnd = jax.random.bits(k2, chosen.shape, dtype=jnp.uint32)
    rnd = bigint.mask_to_bits(rnd, bl)
    return vals.at[idx].set(rnd)


# ---------------------------------------------------------------------------
# Barrett scheme campaign (T-check / SN-check / final-range)
# ---------------------------------------------------------------------------

def barrett_scheme_campaign(fold_width: int, scheme: Tuple[bool, bool, bool],
                            trials: int, pbits: int = 37, vec_len: int = 8192,
                            elem_count: int = 1, bits_per_elem: int = 1,
                            seed: int = 42, fault: str = "BF") -> Dict:
    """fault: 'BF' flips bits_per_elem distinct bits in elem_count elements
    (barret_modmul.py:81-109 committed defaults); 'MOF' randomizes
    elem_count elements within their bit length — the mix that reproduces
    the reference's fold-width detection ramp (draw_barrett.py:10-80:
    SN-check = 1 − 1/M, T-check ≈ (1 − 1/M)/2)."""
    use_t, use_sn, use_final = scheme
    host_rng = _random.Random(seed)
    p = find_prime_with_bitlen(pbits, host_rng)
    mu, k = barrett_constants(p)
    Lp = _limbs(pbits)
    Lx = _limbs(2 * pbits)
    Lmu = _limbs(mu.bit_length())
    Lt = Lx + Lmu
    Ls = _limbs(2 * pbits - 2 * k + Lmu * 32)  # s = t >> 2k
    Ls = max(Ls, Lp)
    Lsn = Ls + Lp
    mu_l = jnp.asarray(bigint.from_int(mu, Lmu))
    p_l = jnp.asarray(bigint.from_int(p, Lp))
    p2_l = jnp.asarray(bigint.from_int(2 * p, Lx))
    M = (1 << fold_width) - 1

    def trial(key):
        ks = jax.random.split(key, 4)
        a = _uniform_below(ks[0], (vec_len,), p, Lp)
        b = _uniform_below(ks[1], (vec_len,), p, Lp)
        x = bigint.mul(a, b)                      # (vec, Lx)
        t = bigint.mul(x, mu_l)                   # (vec, Lt)
        ecc_t_before = sum_mod(bigint.fold_mod(t, fold_width), M)
        s = bigint.shift_right(t, 2 * k, Ls)
        sn = bigint.mul(s, p_l)                   # (vec, Lsn)
        ecc_sn_before = sum_mod(bigint.fold_mod(sn, fold_width), M)

        inject_t = jax.random.bernoulli(ks[2])
        if fault == "MOF":
            t_f = _randomize_elements(ks[3], t, elem_count)
            sn_f = _randomize_elements(ks[3], sn, elem_count)
        else:
            t_f = _flip_bits_in_elements(ks[3], t, elem_count, bits_per_elem)
            sn_f = _flip_bits_in_elements(ks[3], sn, elem_count, bits_per_elem)
        t_used = jnp.where(inject_t, t_f, t)
        s_used = bigint.shift_right(t_used, 2 * k, Ls)
        sn_from_t = bigint.mul(s_used, p_l)
        sn_used = jnp.where(inject_t, sn_from_t, sn_f)

        detect_t = jnp.where(
            inject_t,
            sum_mod(bigint.fold_mod(t_used, fold_width), M) != ecc_t_before,
            False) if use_t else jnp.asarray(False)
        detect_sn = (sum_mod(bigint.fold_mod(sn_used, fold_width), M)
                     != ecc_sn_before) if use_sn else jnp.asarray(False)

        # final stage: c = x - sn, range window 0 <= c < 2p, one cond-sub
        c, borrow = bigint.sub(bigint._fit(x, Lsn), sn_used)
        in_window = (borrow == 0) & bigint.cmp_ge(
            bigint._fit(p2_l, Lsn), bigint.add(c, jnp.asarray(
                bigint.from_int(1, Lsn))))
        final_flag = ~in_window if use_final else jnp.zeros_like(in_window)
        c_red = bigint.cond_sub_big(c, bigint._fit(p_l, Lsn))

        # golden path
        c_ok, _ = bigint.sub(bigint._fit(x, Lsn), bigint._fit(sn, Lsn))
        c_ok = bigint.cond_sub_big(c_ok, bigint._fit(p_l, Lsn))
        harmful = jnp.any(jnp.any(c_red != c_ok, axis=-1))
        detected = detect_t | detect_sn | jnp.any(final_flag)
        return harmful, detected

    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    harmful, detected = jax.jit(jax.vmap(trial))(keys)
    harmful = np.asarray(harmful)
    detected = np.asarray(detected)
    TP = int((harmful & detected).sum())
    FN = int((harmful & ~detected).sum())
    FP = int((~harmful & detected).sum())
    TN = int((~harmful & ~detected).sum())
    rate = TP / (TP + FN) if TP + FN else 1.0
    return {"detection_rate": rate, "TP": TP, "FP": FP, "TN": TN, "FN": FN,
            "p": p}


# ---------------------------------------------------------------------------
# Montgomery campaign
# ---------------------------------------------------------------------------

def montgomery_campaign(fold_width: int, scheme: Tuple[bool, bool, bool],
                        trials: int, pbits: int = 37, vec_len: int = 8192,
                        flip_count: int = 2, seed: int = 42) -> Dict:
    use_m, use_mp, use_final = scheme
    host_rng = _random.Random(seed)
    M = (1 << fold_width) - 1

    def make_trial(p):
        kbits = p.bit_length()
        Lp = _limbs(kbits)
        LT = _limbs(2 * kbits)
        R = 1 << kbits
        m_prime = (-pow(p, -1, R)) % R
        Lmp = _limbs(kbits)
        Lprod = Lp + Lmp
        mp_l = jnp.asarray(bigint.from_int(m_prime, Lmp))
        p_l = jnp.asarray(bigint.from_int(p, Lp))

        def mask_R(v):
            # v mod 2^kbits, keeping Lp limbs
            out = bigint._fit(v, Lp)
            rem = kbits % 32
            if rem:
                hi_mask = jnp.uint32((1 << rem) - 1)
                out = out.at[..., Lp - 1].set(out[..., Lp - 1] & hi_mask)
            return out

        def trial(key):
            ks = jax.random.split(key, 4)
            a = _uniform_below(ks[0], (vec_len,), p, Lp)
            b = _uniform_below(ks[1], (vec_len,), p, Lp)
            T = bigint.mul(a, b)                          # (vec, LT)
            lowT = mask_R(T)
            prod_m = bigint.mul(lowT, mp_l)               # (vec, Lprod)
            ecc_m_before = sum_mod(bigint.fold_mod(prod_m, fold_width), M)
            m_val = mask_R(prod_m)
            prod_mp = bigint.mul(m_val, p_l)              # (vec, Lprod)
            ecc_mp_before = sum_mod(bigint.fold_mod(prod_mp, fold_width), M)

            inject_m = jax.random.bernoulli(ks[2])
            prod_m_f = _flip_bits_in_elements(ks[3], prod_m, 1, flip_count)
            prod_m_used = jnp.where(inject_m, prod_m_f, prod_m)
            m_used = mask_R(prod_m_used)
            prod_mp_from_m = bigint.mul(m_used, p_l)
            prod_mp_f = _flip_bits_in_elements(ks[3], prod_mp, 1, flip_count)
            prod_mp_used = jnp.where(inject_m, prod_mp_from_m, prod_mp_f)

            det_m = jnp.where(
                inject_m,
                sum_mod(bigint.fold_mod(prod_m_used, fold_width), M)
                != ecc_m_before, False) if use_m else jnp.asarray(False)
            det_mp = (sum_mod(bigint.fold_mod(prod_mp_used, fold_width), M)
                      != ecc_mp_before) if use_mp else jnp.asarray(False)

            Tv = bigint._fit(T, Lprod + 1)
            total = bigint.add(Tv, bigint._fit(prod_mp_used, Lprod + 1))
            low_nonzero = jnp.any(mask_R(total) != 0, axis=-1)
            det_final = jnp.any(low_nonzero) if use_final else jnp.asarray(False)

            u = bigint.shift_right(total, kbits, Lp + 1)
            u = bigint.cond_sub_big(u, bigint._fit(p_l, Lp + 1))
            # golden
            tot_ok = bigint.add(Tv, bigint._fit(prod_mp, Lprod + 1))
            u_ok = bigint.cond_sub_big(
                bigint.shift_right(tot_ok, kbits, Lp + 1),
                bigint._fit(p_l, Lp + 1))
            harmful = jnp.any(jnp.any(u != u_ok, axis=-1))
            detected = det_m | det_mp | det_final
            return harmful, detected
        return trial

    TP = FN = 0
    p = find_prime_with_bitlen(pbits, host_rng)
    trial = make_trial(p)
    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    harmful, detected = jax.jit(jax.vmap(trial))(keys)
    harmful = np.asarray(harmful)
    detected = np.asarray(detected)
    TP = int((harmful & detected).sum())
    FN = int((harmful & ~detected).sum())
    rate = TP / (TP + FN) if TP + FN else 1.0
    return {"detection_rate": rate, "TP": TP, "FN": FN, "p": p}


# ---------------------------------------------------------------------------
# barrett_final-style campaign: Intra / Range / Sum under 4 fault models
# ---------------------------------------------------------------------------

def barrett_final_campaign(s_bits: int, fault_model: int, trials: int,
                           pbits: int = 37, vec_len: int = 8192,
                           use_intra: bool = True, use_range: bool = True,
                           use_sum: bool = True, seed: int = 1) -> Dict:
    """Fault models (barrett_final.py:57-80): 1 randomize one element,
    2 randomize two, 3 flip two bits of one element, 4 flip one bit of two."""
    Q = next_prime_ge(1 << (pbits - 1))
    mu, K = barrett_constants(Q)
    K = (Q - 1).bit_length()
    mu = (1 << (2 * K)) // Q
    Lq = _limbs(pbits)
    Lx = _limbs(2 * pbits)
    Ms = (1 << s_bits) + 1

    def trial(key):
        ks = jax.random.split(key, 5)
        a = _uniform_below(ks[0], (vec_len,), Q, Lq)
        b = _uniform_below(ks[1], (vec_len,), Q, Lq)
        c_true = bigint.mul(a, b, Lx)                   # unreduced products
        sum_red_ref = bigint.sum_mod_big(
            bigint.barrett_reduce_big(c_true, Q, mu, K, Lq), Q)

        # inject (randomize within bit_length(value)+1 bits, matching
        # barrett_final.py:61 getrandbits(bit_length+1))
        if fault_model == 1:
            idx = jax.random.randint(ks[2], (), 0, vec_len)
            bl = bigint.bit_length(c_true[idx]) + 1
            rnd = bigint.mask_to_bits(
                jax.random.bits(ks[3], (Lx,), dtype=jnp.uint32), bl)
            c_f = c_true.at[idx].set(rnd)
        elif fault_model == 2:
            idx = jax.random.choice(ks[2], vec_len, shape=(2,), replace=False)
            bl = bigint.bit_length(c_true[idx]) + 1
            rnd = bigint.mask_to_bits(
                jax.random.bits(ks[3], (2, Lx), dtype=jnp.uint32), bl)
            c_f = c_true.at[idx].set(rnd)
        elif fault_model == 3:
            c_f = _flip_bits_in_elements(ks[2], c_true, 1, 2)
        else:
            c_f = _flip_bits_in_elements(ks[2], c_true, 2, 1)

        intra_ok = jnp.asarray(True)
        if use_intra:
            fa = bigint.fold_2s1(a, s_bits)
            fb = bigint.fold_2s1(b, s_bits)
            from ..ops.u32 import mul32_parts
            hi, lo = mul32_parts(fa, fb)
            prod_fold = bigint.fold_2s1(jnp.stack([lo, hi], axis=-1), s_bits)
            intra_ok = jnp.all(bigint.fold_2s1(c_f, s_bits) == prod_fold)

        # Barrett reduce each faulty product with range windows
        t = bigint.mul(c_f, jnp.asarray(bigint.from_int(mu, _limbs(mu.bit_length()))))
        s_ = bigint.shift_right(t, 2 * K, Lq + 1)
        sn = bigint.mul(s_, jnp.asarray(bigint.from_int(Q, Lq)), Lx + 1)
        ci, borrow = bigint.sub(bigint._fit(c_f, Lx + 1), sn)
        lt2q = ~bigint.cmp_ge(ci, bigint._fit(
            jnp.asarray(bigint.from_int(2 * Q, Lx)), Lx + 1))
        pre_ok = (borrow == 0) & lt2q
        ci_red = bigint.cond_sub_big(ci, bigint._fit(
            jnp.asarray(bigint.from_int(Q, Lq)), Lx + 1))
        post_ok = ~bigint.cmp_ge(ci_red, bigint._fit(
            jnp.asarray(bigint.from_int(Q, Lq)), Lx + 1))
        range_ok = jnp.all(pre_ok & post_ok) if use_range else jnp.asarray(True)

        sum_ok = jnp.asarray(True)
        if use_sum:
            sum_red = bigint.sum_mod_big(bigint._fit(ci_red, Lq), Q)
            sum_ok = jnp.all(sum_red == sum_red_ref)

        inter_ok = range_ok & sum_ok
        detected = (~intra_ok) | (~inter_ok)
        return detected, ~intra_ok, ~inter_ok

    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    detected, intra_det, inter_det = jax.jit(jax.vmap(trial))(keys)
    detected = np.asarray(detected)
    miss = float((~detected).mean())
    return {
        "miss_rate": miss,
        "det_intra_only": int((np.asarray(intra_det) & ~np.asarray(inter_det)).sum()),
        "det_sum_only": int((~np.asarray(intra_det) & np.asarray(inter_det)).sum()),
        "det_both": int((np.asarray(intra_det) & np.asarray(inter_det)).sum()),
        "undetected": int((~detected).sum()),
        "Q": Q,
    }


# ---------------------------------------------------------------------------
# outer_check-style campaign: intra vs inter folds, 8 fault modes
# (barrett_test/outer_check.py:14-125)
# ---------------------------------------------------------------------------

OUTER_MODES = ("SBF", "DBF", "SBF+SBF", "SBF+DBF", "MOF1", "MOF2",
               "MOF+SBF", "MOF+DBF")


def outer_check_campaign(fold_k: int, mode: str, trials: int,
                         qbits: int = 37, vec_len: int = 4096,
                         word_bits: int = 64, seed: int = 4) -> Dict:
    """Products modeled as uniform word_bits-wide values; faults act on the
    low qbits.  Detectors over M = 2^k + 1 (alternating fold):
      intra: any per-element fold(c'_i) != fold(c_i)
      inter: Σ fold(c'_i) != Σ fold(c_i)  (mod M)
    Returns miss rates for intra-only, inter-only, and combined."""
    assert mode in OUTER_MODES
    Lw = _limbs(word_bits)
    M = (1 << fold_k) + 1

    def flip1(key, c, idx):
        b = jax.random.randint(key, (), 0, qbits, dtype=jnp.uint32)
        return c.at[idx].set(bigint.xor_bit(c[idx], b))

    def flip2(key, c, idx):
        k1, k2 = jax.random.split(key)
        b1 = jax.random.randint(k1, (), 0, qbits, dtype=jnp.uint32)
        b2 = jax.random.randint(k2, (), 0, qbits - 1, dtype=jnp.uint32)
        b2 = b2 + (b2 >= b1).astype(jnp.uint32)
        v = bigint.xor_bit(bigint.xor_bit(c[idx], b1), b2)
        return c.at[idx].set(v)

    def randomize(key, c, idx):
        rnd = jax.random.bits(key, (Lw,), dtype=jnp.uint32)
        rnd = bigint.mask_to_bits(rnd, jnp.uint32(qbits))
        hi_keep = bigint.mask_to_bits(c[idx], jnp.uint32(qbits))
        new = c[idx] ^ hi_keep ^ rnd       # replace low qbits, keep high bits
        return c.at[idx].set(new)

    ops = {
        "SBF": [flip1], "DBF": [flip2], "SBF+SBF": [flip1, flip1],
        "SBF+DBF": [flip1, flip2], "MOF1": [randomize],
        "MOF2": [randomize, randomize], "MOF+SBF": [randomize, flip1],
        "MOF+DBF": [randomize, flip2],
    }[mode]

    def trial(key):
        ks = jax.random.split(key, 2 + len(ops))
        c = jax.random.bits(ks[0], (vec_len, Lw), dtype=jnp.uint32)
        base_folds = bigint.fold_2s1(c, fold_k)
        base_sum = sum_mod(base_folds, M)
        idx = jax.random.choice(ks[1], vec_len, shape=(len(ops),),
                                replace=False)
        cf = c
        for oi, op in enumerate(ops):
            cf = op(ks[2 + oi], cf, idx[oi])
        folds = bigint.fold_2s1(cf, fold_k)
        intra = jnp.any(folds != base_folds)
        inter = sum_mod(folds, M) != base_sum
        harmful = jnp.any(cf != c)
        return harmful, intra, inter

    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    harmful, intra, inter = jax.jit(jax.vmap(trial))(keys)
    harmful = np.asarray(harmful)
    intra = np.asarray(intra)
    inter = np.asarray(inter)
    nh = max(1, int(harmful.sum()))
    return {
        "miss_intra": float((harmful & ~intra).sum() / nh),
        "miss_inter": float((harmful & ~inter).sum() / nh),
        "miss_both": float((harmful & ~intra & ~inter).sum() / nh),
        "harmful": int(harmful.sum()),
    }
