"""BFV scheme tests: BEHZ full-RNS multiply, batching, rotations.

Mirrors the op surface the reference's BFV perf test exercises
(profile_framewk/src/framewk.cpp bfv_performance_test: encode/decode,
encrypt/decrypt, add, multiply, square, relinearize, multiply_plain,
rotate rows/columns) plus the rotate-fold dot product of dotprod_bfv.cpp.
"""
import numpy as np
import pytest

from rfhe_tpu.fhe.bfv import BfvContext, BehzPlan
from rfhe_tpu.fhe.params import BfvParams


@pytest.fixture(scope="module")
def bfv():
    params = BfvParams.make(n=256, levels=3, q_bits=30, t_bits=16)
    return BfvContext(params, seed=3)


@pytest.fixture(scope="module")
def msgs(bfv):
    rng = np.random.default_rng(7)
    t = bfv.t
    return (rng.integers(0, t, (2, 128)), rng.integers(0, t, (2, 128)))


def test_encode_decode_roundtrip(bfv, msgs):
    m1, _ = msgs
    assert np.array_equal(bfv.decode(bfv.encode(m1)), m1 % bfv.t)


def test_encrypt_decrypt(bfv, msgs):
    m1, _ = msgs
    ct = bfv.encrypt(bfv.encode(m1))
    assert np.array_equal(bfv.decrypt_decode(ct), m1 % bfv.t)


def test_add_sub(bfv, msgs):
    m1, m2 = msgs
    c1, c2 = bfv.encrypt(bfv.encode(m1)), bfv.encrypt(bfv.encode(m2))
    assert np.array_equal(bfv.decrypt_decode(bfv.add(c1, c2)),
                          (m1 + m2) % bfv.t)
    assert np.array_equal(bfv.decrypt_decode(bfv.sub(c1, c2)),
                          (m1 - m2) % bfv.t)


def test_multiply_relinearize(bfv, msgs):
    m1, m2 = msgs
    c1, c2 = bfv.encrypt(bfv.encode(m1)), bfv.encrypt(bfv.encode(m2))
    prod = bfv.multiply(c1, c2)
    assert prod.size == 3
    out = bfv.decrypt_decode(bfv.relinearize(prod))
    assert np.array_equal(out, (m1.astype(object) * m2) % bfv.t)


def test_square(bfv, msgs):
    m1, _ = msgs
    c1 = bfv.encrypt(bfv.encode(m1))
    out = bfv.decrypt_decode(bfv.relinearize(bfv.square(c1)))
    assert np.array_equal(out, (m1.astype(object) ** 2) % bfv.t)


def test_multiply_plain(bfv, msgs):
    m1, m2 = msgs
    c1 = bfv.encrypt(bfv.encode(m1))
    out = bfv.decrypt_decode(bfv.multiply_plain(c1, bfv.encode(m2)))
    assert np.array_equal(out, (m1.astype(object) * m2) % bfv.t)


def test_depth_two(bfv, msgs):
    m1, m2 = msgs
    c1, c2 = bfv.encrypt(bfv.encode(m1)), bfv.encrypt(bfv.encode(m2))
    p1 = bfv.multiply_relin(c1, c2)
    p2 = bfv.multiply_relin(p1, c1)
    assert np.array_equal(bfv.decrypt_decode(p2),
                          (m1.astype(object) * m2 * m1) % bfv.t)


def test_rotate_rows(bfv, msgs):
    m1, _ = msgs
    c1 = bfv.encrypt(bfv.encode(m1))
    for r in (1, 3, 64):
        out = bfv.decrypt_decode(bfv.rotate_rows(c1, r))
        assert np.array_equal(out, np.roll(m1, -r, axis=1)), r


def test_rotate_columns(bfv, msgs):
    m1, _ = msgs
    c1 = bfv.encrypt(bfv.encode(m1))
    out = bfv.decrypt_decode(bfv.rotate_columns(c1))
    assert np.array_equal(out, m1[::-1])


def test_rotate_fold_dot_product(bfv):
    """dotprod_bfv.cpp:48-65 rotate-rows/columns fold: sum of all slots."""
    rng = np.random.default_rng(11)
    m = rng.integers(0, 100, (2, 128))
    ct = bfv.encrypt(bfv.encode(m))
    step = 128 // 2
    while step >= 1:
        ct = bfv.add(ct, bfv.rotate_rows(ct, step))
        step //= 2
    ct = bfv.add(ct, bfv.rotate_columns(ct))
    out = bfv.decrypt_decode(ct)
    assert int(out[0, 0]) == int(m.sum()) % bfv.t


def test_behz_extend_exact():
    """extend_to_bsk yields x + u·Q with u ∈ {0, ±1} — verify residues."""
    import jax.numpy as jnp
    import math
    params = BfvParams.make(n=256, levels=2, q_bits=30, t_bits=16)
    ctx = BfvContext(params, seed=5)
    bp = ctx.behz(params.L - 1)
    Q = math.prod(params.moduli)
    rng = np.random.default_rng(3)
    xs = rng.integers(0, Q, 256, dtype=object) if False else \
        np.array([int(v) for v in rng.integers(0, 2**62, 256)], dtype=object) % Q
    res = np.stack([np.array([int(x) % q for x in xs], dtype=np.uint32)
                    for q in params.moduli])
    ext = np.asarray(bp.extend_to_bsk(jnp.asarray(res),
                                      ctx.ctx.plan.q_arr[:params.L]))
    for bi, b in enumerate(bp.bsk):
        got = ext[bi].astype(object)
        ok = np.array([g in (int(x) % b, (int(x) + Q) % b, (int(x) - Q) % b)
                       for g, x in zip(got, xs)])
        assert ok.all()


def test_dnum_multiply(bfv, msgs):
    """Grouped-digit (dnum) keyswitching works for BFV relin/rotation."""
    params = BfvParams.make(n=256, levels=3, q_bits=30, t_bits=16)
    ctx = BfvContext(params, seed=9, dnum=2)
    rng = np.random.default_rng(13)
    m1 = rng.integers(0, ctx.t, (2, 128))
    m2 = rng.integers(0, ctx.t, (2, 128))
    c1, c2 = ctx.encrypt(ctx.encode(m1)), ctx.encrypt(ctx.encode(m2))
    out = ctx.decrypt_decode(ctx.multiply_relin(c1, c2))
    assert np.array_equal(out, (m1.astype(object) * m2) % ctx.t)
    out = ctx.decrypt_decode(ctx.rotate_rows(c1, 5))
    assert np.array_equal(out, np.roll(m1, -5, axis=1))
