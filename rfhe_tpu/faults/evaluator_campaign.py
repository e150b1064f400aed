"""Ciphertext-flip campaign against the PROTECTED evaluator (VERDICT
round-2 item #2 'done' criterion; the production-path analog of
reliability_test/dotprod_test.cu:109-148's device-buffer flips).

For each keyswitch stage, inject single-bit flips at random (limb, coeff,
bit) into that intermediate of a protected rotation (fhe/protected.py) and
record whether (a) the output ciphertext actually changed (flips can land
on dead values), (b) a detector fired, and (c) which one.  Compute-stage
flips (intt_out / digits / digits_ntt) must be detected; post-check
storage flips (prod0 / acc0 / ks_out) are the documented miss window the
detectors do not claim (the same compute-vs-storage split the LazyChecker
control campaign measures, faults/ntt_control.py).

All trials for one stage run in ONE vmapped jit program — fault coordinates
are traced scalars, so there is exactly one compile per stage.

Usage: python -m rfhe_tpu.faults.evaluator_campaign [--n 1024] [--levels 3]
           [--trials 256] [--csv results/evaluator_flips.csv]
"""
from __future__ import annotations

import argparse
import csv
import sys
from typing import Dict

STAGES = ("intt_out", "digits", "digits_ntt", "prod0", "acc0", "ks_out")
COMPUTE_STAGES = ("intt_out", "digits", "digits_ntt")


def stage_campaign(prot, ct, r: int, stage: str, trials: int,
                   seed: int = 0) -> Dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ..fhe.protected import Fault

    ckks = prot.ckks
    clean, _ = prot.rotate(ct, r)
    g = ckks.rotation_galois_element(r)
    ksk = ckks.galois_key(g)
    lvl = ct.level
    rng = np.random.default_rng(seed)
    li = jnp.asarray(rng.integers(0, lvl + 1, trials))
    ix = jnp.asarray(rng.integers(0, ckks.params.n, trials))
    bi = jnp.asarray(rng.integers(0, 30, trials))

    def one(l, i, b):
        out, flags = prot._galois_impl(ct, ksk, g, lvl, Fault(stage, l, i, b))
        changed = jnp.any(out.c[0].data != clean.c[0].data) \
            | jnp.any(out.c[1].data != clean.c[1].data)
        fired = {k: ~jnp.all(v) for k, v in flags.items()}
        detected = jnp.any(jnp.stack(list(fired.values())))
        return changed, detected, fired

    changed, detected, fired = jax.jit(jax.vmap(one))(li, ix, bi)
    changed = np.asarray(changed)
    detected = np.asarray(detected)
    n_changed = int(changed.sum())
    n_det = int(detected.sum())
    n_miss = int((changed & ~detected).sum())
    by_detector = {k: int(np.asarray(v).sum()) for k, v in fired.items()
                   if int(np.asarray(v).sum())}
    top = max(by_detector, key=by_detector.get) if by_detector else ""
    return {
        "stage": stage, "trials": trials, "changed": n_changed,
        "detected": n_det, "missed": n_miss,
        "detect_rate": round(n_det / trials, 6),
        "miss_rate": round(n_miss / max(1, n_changed), 6),
        "top_detector": top,
    }


def run(n: int = 1024, levels: int = 3, trials: int = 256, seed: int = 0):
    import numpy as np
    from ..fhe.ckks import CkksContext
    from ..fhe.params import CkksParams
    from ..fhe.protected import ProtectedCkks

    params = CkksParams.make(n=n, levels=levels)
    ckks = CkksContext(params, seed=3)
    prot = ProtectedCkks(ckks)
    rng = np.random.default_rng(7)
    z = rng.normal(size=n // 2)
    pt, sc = ckks.encode(z)
    ct = ckks.encrypt(pt, sc)
    rows = []
    for stage in STAGES:
        row = stage_campaign(prot, ct, 1, stage, trials, seed)
        rows.append(row)
        print(row, file=sys.stderr, flush=True)
    return rows


def main(argv=None) -> None:
    from ..utils.compilecache import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--trials", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)
    rows = run(args.n, args.levels, args.trials, args.seed)
    cols = list(rows[0].keys())
    w = csv.DictWriter(sys.stdout, fieldnames=cols)
    w.writeheader()
    for r in rows:
        w.writerow(r)
    if args.csv:
        with open(args.csv, "w", newline="") as f:
            wf = csv.DictWriter(f, fieldnames=cols)
            wf.writeheader()
            for r in rows:
                wf.writerow(r)


if __name__ == "__main__":
    main()
