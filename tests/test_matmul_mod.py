import numpy as np
import jax.numpy as jnp

from rfhe_tpu import numth
from rfhe_tpu.ops.matmul_mod import DigitPlan, matmul_mod, np_matmul_mod

Q = numth.find_ntt_prime(4096, 30)
_, QINV, _ = numth.montgomery_constants(Q, 32)


def _check(plan, rng, m, k, n, batch=()):
    a = rng.integers(0, Q, size=batch + (m, k), dtype=np.uint32)
    b = rng.integers(0, Q, size=batch + (k, n), dtype=np.uint32)
    got = np.asarray(matmul_mod(jnp.asarray(a), jnp.asarray(b), plan))
    if batch:
        for idx in np.ndindex(*batch):
            np.testing.assert_array_equal(got[idx], np_matmul_mod(a[idx], b[idx], Q))
    else:
        np.testing.assert_array_equal(got, np_matmul_mod(a, b, Q))


def test_matmul_mod_int8(rng):
    plan = DigitPlan.make(Q, QINV, "int8")
    _check(plan, rng, 16, 16, 16)
    _check(plan, rng, 64, 64, 64)
    _check(plan, rng, 8, 128, 8)


def test_matmul_mod_f32(rng):
    plan = DigitPlan.make(Q, QINV, "f32")
    _check(plan, rng, 64, 64, 64)


def test_matmul_mod_batched(rng):
    plan = DigitPlan.make(Q, QINV, "int8")
    _check(plan, rng, 16, 16, 16, batch=(3,))


def test_matmul_mod_chunked(rng):
    """Contraction larger than max_k triggers chunking."""
    plan = DigitPlan.make(Q, QINV, "f32")  # max_k = 256
    _check(plan, rng, 8, 600, 8)


def test_q31_boundary(rng):
    q = 2147483629  # prime near 2^31
    _, qinv, _ = numth.montgomery_constants(q, 32)
    plan = DigitPlan.make(q, qinv, "int8")
    a = rng.integers(0, q, size=(32, 32), dtype=np.uint32)
    b = rng.integers(0, q, size=(32, 32), dtype=np.uint32)
    got = np.asarray(matmul_mod(jnp.asarray(a), jnp.asarray(b), plan))
    np.testing.assert_array_equal(got, np_matmul_mod(a, b, q))
