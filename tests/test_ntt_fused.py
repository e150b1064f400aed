"""Fused Pallas NTT kernel (ops/ntt_fused.py) vs the XLA four-step path.

Runs the kernel in Pallas interpret mode on CPU so the kernel *logic*
(per-stage digit widths, Shoup recombination, batch blocking) is covered by
the default suite; Mosaic-lowered bit-exactness on a real chip is checked by
bench.py's verification preamble and the /verify flow.

Reference role: the batched device NTT driven by the reference campaigns
(reliability_test/ntt_test.cu:95)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

os.environ.setdefault("RFHE_TPU_PALLAS_INTERPRET", "1")

from rfhe_tpu import numth
from rfhe_tpu.ops import ntt_fused
from rfhe_tpu.ops.ntt_mxu import MxuNttPlan

pytestmark = pytest.mark.skipif(
    not ntt_fused._INTERPRET, reason="interpret mode disabled by env")


@pytest.fixture(scope="module", params=[256, 2048])
def plan(request):
    n = request.param
    primes = numth.find_ntt_primes(n, 30, 3)
    return MxuNttPlan.make(n, primes)


@pytest.mark.parametrize("batch", [None, 1, 3])
def test_fused_fwd_inv_bit_exact(plan, batch):
    rng = np.random.default_rng(7)
    shape = ((batch,) if batch else ()) + (plan.L, plan.n)
    qmin = int(np.asarray(plan.q_arr).min())
    x = jnp.asarray(rng.integers(0, qmin, shape, dtype=np.uint32))
    y_xla = plan.fwd(x)                 # CPU backend -> XLA composition
    y_fused = plan.fused.fwd(x)
    assert np.array_equal(np.asarray(y_xla), np.asarray(y_fused))
    x_xla = plan.inv(y_xla)
    x_fused = plan.fused.inv(y_xla)
    assert np.array_equal(np.asarray(x_xla), np.asarray(x_fused))
    assert np.array_equal(np.asarray(x_fused), np.asarray(x))


def test_fused_batch_blocking_pads(plan):
    """A batch bigger than the unroll cap exercises the (grid, pad) path."""
    rng = np.random.default_rng(8)
    B = ntt_fused._MAX_BB + 3           # forces nb > 1 with padding
    qmin = int(np.asarray(plan.q_arr).min())
    x = jnp.asarray(rng.integers(0, qmin, (B, plan.L, plan.n),
                                 dtype=np.uint32))
    assert np.array_equal(np.asarray(plan.fwd(x)),
                          np.asarray(plan.fused.fwd(x)))


def test_fused_take_slice(plan):
    rng = np.random.default_rng(9)
    sub = plan.take(np.array([0, 2]))
    qmin = int(np.asarray(sub.q_arr).min())
    x = jnp.asarray(rng.integers(0, qmin, (2, sub.n), dtype=np.uint32))
    assert np.array_equal(np.asarray(sub.fwd(x)),
                          np.asarray(sub.fused.fwd(x)))


def test_stage_params_differ_and_are_respected():
    """n=4096/30-bit is the config where s1.xb != s2.xb — the bug class this
    test pins down (digitizing stage 2 with stage 1's width)."""
    primes = numth.find_ntt_primes(4096, 30, 2)
    plan = MxuNttPlan.make(4096, primes)
    ft = plan.fused
    assert ft.ps_small_f[0] != ft.ps_big_f[0]     # 7 vs 6 today
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.integers(0, min(primes), (plan.L, plan.n),
                                 dtype=np.uint32))
    assert np.array_equal(np.asarray(plan.fwd(x)),
                          np.asarray(ft.fwd(x)))
