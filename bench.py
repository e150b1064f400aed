"""Headline benchmark: batched negacyclic NTT throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): SEAL 4.1 CPU rotation at N=4096 with 21
RNS limbs costs 14,377 µs, of which ntt+intt = 61.44% (draw_pie_chart.py:8)
across ≈ 2·(dnum+1) + 2 ≈ 44 limb-transforms per keyswitch, giving ≈ 200 µs
per limb-NTT, i.e. ≈ 5,000 limb-transforms/s on the reference's CPU.
vs_baseline = our transforms/s ÷ 5,000 (higher is better).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_TRANSFORMS_PER_S = 5_000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rfhe_tpu import numth
    from rfhe_tpu.ops.ntt import NttPlan, negacyclic_ntt

    n = 4096
    q = numth.find_ntt_prime(n, 30)
    plan = NttPlan.make(n, q)
    batch = 21 * 8  # 21 RNS limbs x 8 polys in flight
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, size=(batch, n), dtype=np.uint32))

    f = jax.jit(lambda v: negacyclic_ntt(v, plan))
    f(x).block_until_ready()  # compile
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    y.block_until_ready()
    dt = time.perf_counter() - t0
    transforms_per_s = batch * iters / dt
    print(json.dumps({
        "metric": f"negacyclic_ntt_n{n}_throughput",
        "value": round(transforms_per_s, 1),
        "unit": "transforms/s",
        "vs_baseline": round(transforms_per_s / BASELINE_TRANSFORMS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
