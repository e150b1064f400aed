import numpy as np
import jax
import jax.numpy as jnp

from rfhe_tpu import numth, oracle
from rfhe_tpu.transform import (
    FourStepPlan, four_step_ntt, four_step_intt, four_step_ntt_stages)

N = 64
Q = numth.find_ntt_prime(N, 20)
PLAN = FourStepPlan.make(N, Q)


def test_four_step_matches_direct(rng):
    a = rng.integers(0, Q, size=N, dtype=np.uint32)
    got = np.asarray(four_step_ntt(jnp.asarray(a), PLAN))
    w = numth.root_of_unity(N, Q)
    expect = np.array(oracle.ntt_direct(list(map(int, a)), w, Q), dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_four_step_nonsquare(rng):
    n = 128  # n1=8, n2=16
    q = numth.find_ntt_prime(n, 20)
    plan = FourStepPlan.make(n, q)
    a = rng.integers(0, q, size=n, dtype=np.uint32)
    got = np.asarray(four_step_ntt(jnp.asarray(a), plan))
    w = numth.root_of_unity(n, q)
    expect = np.array(oracle.ntt_direct(list(map(int, a)), w, q), dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_four_step_roundtrip(rng):
    a = rng.integers(0, Q, size=(3, N), dtype=np.uint32)
    y = four_step_ntt(jnp.asarray(a), PLAN)
    back = np.asarray(four_step_intt(y, PLAN))
    np.testing.assert_array_equal(back, a)


def test_four_step_large(rng):
    n = 4096
    q = numth.find_ntt_prime(n, 30)
    plan = FourStepPlan.make(n, q)
    a = rng.integers(0, q, size=n, dtype=np.uint32)
    got = np.asarray(jax.jit(lambda x: four_step_ntt(x, plan))(jnp.asarray(a)))
    w = numth.root_of_unity(n, q)
    expect = np.array(oracle.ntt(list(map(int, a)), w, q), dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)
    back = np.asarray(jax.jit(lambda x: four_step_intt(x, plan))(jnp.asarray(got)))
    np.testing.assert_array_equal(back, a)


def test_stages_compose(rng):
    a = rng.integers(0, Q, size=N, dtype=np.uint32)
    A, B1, B2, Y = four_step_ntt_stages(jnp.asarray(a), PLAN)
    full = np.asarray(four_step_ntt(jnp.asarray(a), PLAN))
    out = np.asarray(jnp.swapaxes(Y, -1, -2).reshape(-1))
    np.testing.assert_array_equal(out, full)
