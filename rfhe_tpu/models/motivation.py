"""Motivation demos (reference motivation/, modulo_test/, lattigo-error-demo/):
tiny experiments showing that a single fault in transform/RNS domain smears
across every output slot — the observation that motivates ABFT protection.

  ntt_smear            motivation/ntt.py:8-85 — one noisy coefficient before
                       the NTT disturbs (essentially) all outputs
  fft_smear            motivation/fft.py:6-53 — complex-FFT analog
  bsgs_block_smear     motivation/bsgs.py:39-115 — block-diagonal Hadamard
                       matvec with per-block NTT→noise→INTT corruption
  baseconv_smear       motivation/baseConv.py — a flipped RNS residue
                       corrupts the reconstructed value everywhere downstream
  grouped_crt_check    modulo_test/baseConv.py:24-50 — grouped-CRT
                       reconstruction consistency assertion
  plaintext_perturb    lattigo-error-demo/main.go:39-77 + seal_pmult.cpp:38 —
                       +1 on ONE NTT-domain plaintext coefficient before an
                       encrypted multiply disturbs every product slot
"""
from __future__ import annotations

import random
from typing import Dict

import numpy as np

from .. import numth, oracle


def ntt_smear(n: int = 256, qbits: int = 20, noise_idx: int = 3,
              seed: int = 0) -> Dict:
    q = numth.find_ntt_prime(n, qbits)
    w = numth.root_of_unity(n, q)
    rng = random.Random(seed)
    a = [rng.randrange(q) for _ in range(n)]
    clean = oracle.ntt(a, w, q)
    a_noisy = list(a)
    a_noisy[noise_idx] = (a_noisy[noise_idx] + 1) % q
    noisy = oracle.ntt(a_noisy, w, q)
    disturbed = sum(1 for x, y in zip(clean, noisy) if x != y)
    return {"n": n, "disturbed": disturbed, "fraction": disturbed / n}


def fft_smear(n: int = 256, noise: float = 1e-3, seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    a = rng.normal(size=n)
    clean = np.fft.fft(a)
    a2 = a.copy()
    a2[3] += noise
    noisy = np.fft.fft(a2)
    disturbed = int((np.abs(clean - noisy) > 1e-12).sum())
    return {"n": n, "disturbed": disturbed, "fraction": disturbed / n}


def bsgs_block_smear(dim: int = 64, block: int = 16, qbits: int = 20,
                     seed: int = 0) -> Dict:
    """Block-diagonal matvec where one block's NTT domain is perturbed: the
    corruption is confined to that block but total within it."""
    q = numth.find_ntt_prime(block, qbits)
    psi = numth.psi_negacyclic(block, q)
    rng = random.Random(seed)
    x = [rng.randrange(q) for _ in range(dim)]
    out_clean, out_noisy = [], []
    for b0 in range(0, dim, block):
        blk = x[b0:b0 + block]
        h = oracle.negacyclic_ntt(blk, psi, q)
        out_clean += oracle.negacyclic_intt(h, psi, q)
        h2 = list(h)
        if b0 == 0:
            h2[0] = (h2[0] + 1) % q
        out_noisy += oracle.negacyclic_intt(h2, psi, q)
    disturbed = sum(1 for a, b in zip(out_clean, out_noisy) if a != b)
    return {"dim": dim, "block": block, "disturbed": disturbed,
            "confined_to_block": disturbed <= block}


def baseconv_smear(limbs: int = 4, bits: int = 12, n_el: int = 32,
                   seed: int = 0) -> Dict:
    rng = random.Random(seed)
    moduli = numth.generate_crt_primes(limbs, bits, rng)
    import math
    P = math.prod(moduli)
    xs = [rng.randrange(P) for _ in range(n_el)]
    residues = [[x % p for x in xs] for p in moduli]
    out_moduli = numth.generate_crt_primes(2, 2 * bits, rng)
    clean = oracle.base_conv(residues, moduli, out_moduli)
    residues[1][5] ^= 4                      # flip one residue bit
    noisy = oracle.base_conv(residues, moduli, out_moduli)
    per_elem = [clean[i] != noisy[i] for i in range(n_el)]
    return {"elements_disturbed": sum(per_elem),
            "confined_to_element": sum(per_elem) == 1,
            "all_out_limbs_disturbed": noisy[5] != clean[5]}


def grouped_crt_check(limbs: int = 6, group: int = 2, bits: int = 20,
                      seed: int = 0) -> Dict:
    """modulo_test/baseConv.py: reconstruct x from grouped moduli and verify
    x mod Q_k == grouped residue."""
    rng = random.Random(seed)
    moduli = numth.generate_crt_primes(limbs, bits, rng)
    import math
    P = math.prod(moduli)
    x = rng.randrange(P)
    groups = [math.prod(moduli[i:i + group])
              for i in range(0, limbs, group)]
    ok = all(
        (x % Qk) == oracle.base_conv([[x % p] for p in moduli], moduli,
                                     [Qk])[0][0] % Qk
        for Qk in groups
    )
    return {"groups": len(groups), "consistent": ok}


def plaintext_perturb(n: int = 256, seed: int = 5) -> Dict:
    """+1 on one NTT-domain plaintext coefficient before homomorphic
    plaintext-multiply: count disturbed slots after decryption."""
    from ..fhe.params import BgvParams
    from ..fhe.bgv import BgvContext
    from ..fhe.rns import RnsPoly, poly_ntt
    import jax.numpy as jnp
    bgv = BgvContext(BgvParams.make(n=n, levels=1, q_bits=30, t_bits=16),
                     seed=seed)
    rng = np.random.default_rng(seed)
    m1 = rng.integers(0, bgv.t, (2, n // 2), dtype=np.uint32)
    m2 = rng.integers(0, bgv.t, (2, n // 2), dtype=np.uint32)
    ct = bgv.encrypt(bgv.encode(m1))
    pt = bgv.encode(m2)
    pt_ntt = poly_ntt(RnsPoly(pt.data, False), bgv.ctx)
    clean = bgv.decrypt_decode(bgv.multiply_plain(ct, pt_ntt))
    # perturb ONE NTT-domain plaintext slot on one limb (+1)
    data = pt_ntt.data
    q0 = bgv.params.moduli[0]
    data = data.at[0, 0].set((int(data[0, 0]) + 1) % q0)
    noisy = bgv.decrypt_decode(
        bgv.multiply_plain(ct, RnsPoly(data, True)))
    disturbed = int((clean != noisy).sum())
    return {"slots": n, "disturbed": disturbed,
            "fraction": disturbed / n}


def main() -> None:
    print("ntt_smear:", ntt_smear())
    print("fft_smear:", fft_smear())
    print("bsgs_block_smear:", bsgs_block_smear())
    print("baseconv_smear:", baseconv_smear())
    print("grouped_crt_check:", grouped_crt_check())
    print("plaintext_perturb:", plaintext_perturb())


if __name__ == "__main__":
    main()
