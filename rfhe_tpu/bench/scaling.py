"""Scaling-efficiency harness (BASELINE north star: ≥80% ops/s efficiency
from 1 chip to multi-chip/multi-host).

Real multi-chip hardware is unavailable in this environment, so this harness
validates the *mechanics* — mesh construction, sharded four-step NTT with
its all_to_all transpose, limb-sharded evaluator — and measures throughput
at varying device counts.  On the virtual CPU mesh the absolute numbers only
validate the harness; on a real slice the same driver measures ICI scaling.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python -m rfhe_tpu.bench.scaling [--n 4096] [--limbs 8]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def measure(n: int = 1024, limbs: int = 8, iters: int = 20) -> list:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from .. import numth
    from ..transform import FourStepPlan
    from ..transform.distributed import four_step_ntt_sharded

    q = numth.find_ntt_prime(n, 28)
    plan = FourStepPlan.make(n, q)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=(limbs, n), dtype=np.uint32)
    devs = jax.devices()
    rows = []
    d = 1
    while d <= len(devs) and plan.n1 % d == 0:
        mesh = Mesh(np.array(devs[:d]), ("fft",))
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
        f = jax.jit(lambda v: four_step_ntt_sharded(v, plan, mesh))
        f(xs).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(xs)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        ops = limbs / dt
        rows.append({"devices": d, "limb_transforms_per_s": ops})
        d *= 2
    base = rows[0]["limb_transforms_per_s"]
    for r in rows:
        r["efficiency"] = r["limb_transforms_per_s"] / (base * r["devices"])
    return rows


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--limbs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)
    for r in measure(args.n, args.limbs, args.iters):
        print(f"devices={r['devices']}: {r['limb_transforms_per_s']:.0f} "
              f"transforms/s, efficiency={r['efficiency']:.2f}")


if __name__ == "__main__":
    main()
