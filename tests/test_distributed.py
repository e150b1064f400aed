import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfhe_tpu import numth
from rfhe_tpu.transform import FourStepPlan, four_step_ntt
from rfhe_tpu.transform.distributed import (
    make_mesh, four_step_ntt_sharded, four_step_ntt_sharded_protected)

N = 256  # n1 = n2 = 16, divisible by 8 devices
Q = numth.find_ntt_prime(N, 25)
PLAN = FourStepPlan.make(N, Q)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_matches_single(mesh, rng):
    a = rng.integers(0, Q, size=N, dtype=np.uint32)
    single = np.asarray(four_step_ntt(jnp.asarray(a), PLAN))
    sharded = np.asarray(jax.jit(
        lambda x: four_step_ntt_sharded(x, PLAN, mesh))(jnp.asarray(a)))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_batched(mesh, rng):
    a = rng.integers(0, Q, size=(3, N), dtype=np.uint32)
    single = np.asarray(four_step_ntt(jnp.asarray(a), PLAN))
    sharded = np.asarray(jax.jit(
        lambda x: four_step_ntt_sharded(x, PLAN, mesh))(jnp.asarray(a)))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_protected_clean(mesh, rng):
    a = rng.integers(0, Q, size=N, dtype=np.uint32)
    res = jax.jit(lambda x, k: four_step_ntt_sharded_protected(x, PLAN, mesh, k))(
        jnp.asarray(a), jax.random.PRNGKey(0))
    single = np.asarray(four_step_ntt(jnp.asarray(a), PLAN))
    np.testing.assert_array_equal(np.asarray(res.y), single)
    assert bool(res.batch1_ok) and bool(res.inter_ok) and bool(res.batch2_ok)
