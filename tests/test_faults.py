import numpy as np
import jax
import jax.numpy as jnp

from rfhe_tpu import numth
from rfhe_tpu.ops.modring import ModArith
from rfhe_tpu.faults import (
    inject_sbf, inject_dbf, inject_mbu, inject_mof1, inject_cte,
    inject_cle_matrix, inject_cle_vector, inject_kind,
)

Q = numth.find_ntt_prime(64, 20)
BW = Q.bit_length()


def test_sbf_flips_one_element(rng):
    x = rng.integers(0, Q, size=64, dtype=np.uint32)
    for seed in range(20):
        y = np.asarray(inject_sbf(jax.random.PRNGKey(seed), jnp.asarray(x), Q, BW))
        diff = np.nonzero(y != x)[0]
        assert len(diff) <= 1
        assert (y < Q).all()
        if len(diff) == 1:
            i = diff[0]
            # value differs by a (possibly wrapped) single-bit xor
            raw = int(x[i]) ^ int(y[i])
            assert raw != 0


def test_dbf_and_mbu_stay_in_range(rng):
    x = rng.integers(0, Q, size=64, dtype=np.uint32)
    for seed in range(10):
        for fn in (inject_dbf, inject_mbu, inject_cte):
            y = np.asarray(fn(jax.random.PRNGKey(seed), jnp.asarray(x), Q, BW))
            assert (y < Q).all()
            assert np.count_nonzero(y != x) <= 1


def test_mof1(rng):
    x = rng.integers(0, Q, size=64, dtype=np.uint32)
    y = np.asarray(inject_mof1(jax.random.PRNGKey(3), jnp.asarray(x), Q))
    assert (y < Q).all()
    assert np.count_nonzero(y != x) <= 1


def test_cle_matrix_corrupts_row(rng):
    arith = ModArith.make(Q)
    A = rng.integers(0, Q, size=(8, 8), dtype=np.uint32)
    B = rng.integers(0, Q, size=(8, 8), dtype=np.uint32)
    C = np.array((A.astype(object) @ B.astype(object)) % Q, dtype=np.uint32)
    Cf = np.asarray(inject_cle_matrix(
        jax.random.PRNGKey(5), jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), arith))
    rows_changed = np.unique(np.nonzero(Cf != C)[0])
    assert len(rows_changed) <= 1
    assert (Cf < Q).all()


def test_cle_vector(rng):
    M = (1 << 8) - 1
    X = rng.integers(0, M, size=32, dtype=np.uint32)
    T = rng.integers(0, M, size=32, dtype=np.uint32)
    Y = ((X.astype(np.uint64) * T) % M).astype(np.uint32)
    Yf = np.asarray(inject_cle_vector(
        jax.random.PRNGKey(6), jnp.asarray(X), jnp.asarray(T), jnp.asarray(Y), M))
    diff = np.nonzero(Yf != Y)[0]
    assert len(diff) <= 1
    assert (Yf < M).all()
    if len(diff) == 1:
        i = diff[0]
        expected_set = {(int(X[i]) * int(T[i]) * k) % M for k in (M - 1, 2, M - 2)}
        assert int(Yf[i]) in expected_set


def test_inject_kind_dispatch(rng):
    x = rng.integers(0, Q, size=16, dtype=np.uint32)
    for kind in ("SBF", "DBF", "MOF1", "SCF-BF", "SCF-MBU", "MCF-PPE", "MCF-CTE"):
        y = np.asarray(inject_kind(kind, jax.random.PRNGKey(1), jnp.asarray(x), Q, BW))
        assert (y < Q).all()


def test_vmapped_injection(rng):
    """Campaigns vmap injections over trial keys."""
    x = rng.integers(0, Q, size=64, dtype=np.uint32)
    keys = jax.random.split(jax.random.PRNGKey(0), 100)
    ys = jax.vmap(lambda k: inject_sbf(k, jnp.asarray(x), Q, BW))(keys)
    ys = np.asarray(ys)
    assert ys.shape == (100, 64)
    changed = (ys != x).sum(axis=1)
    assert (changed <= 1).all()
    assert changed.sum() > 50  # most flips actually change the value
