import numpy as np
import pytest

from rfhe_tpu.fhe import CkksContext, CkksParams
from rfhe_tpu.fhe.params import BgvParams
from rfhe_tpu.fhe.bgv import BgvContext
from rfhe_tpu.models.dotprod import dot_product_ckks, dot_product_bgv
from rfhe_tpu.models.bsgs import matvec_naive, matvec_bsgs, _embed


@pytest.fixture(scope="module")
def ckks():
    return CkksContext(CkksParams.make(n=256, levels=2, q0_bits=30,
                                       scale_bits=26), seed=3)


@pytest.fixture(scope="module")
def bgv():
    return BgvContext(BgvParams.make(n=256, levels=2, q_bits=30, t_bits=16),
                      seed=5)


def test_dot_product_ckks(ckks, rng):
    n2 = ckks.params.n // 2
    x = rng.uniform(-1, 1, n2)
    y = rng.uniform(-1, 1, n2)
    ct = dot_product_ckks(ckks, ckks.encrypt(*ckks.encode(x + 0j)),
                          ckks.encrypt(*ckks.encode(y + 0j)))
    got = ckks.decrypt_decode(ct)
    expect = np.dot(x, y)
    np.testing.assert_allclose(got.real, expect, atol=0.5 * n2 * 1e-2)


def test_dot_product_bgv(bgv, rng):
    m1 = rng.integers(0, bgv.t, (2, bgv.params.n // 2), dtype=np.uint32)
    m2 = rng.integers(0, bgv.t, (2, bgv.params.n // 2), dtype=np.uint32)
    ct = dot_product_bgv(bgv, bgv.encrypt(bgv.encode(m1)),
                         bgv.encrypt(bgv.encode(m2)))
    got = bgv.decrypt_decode(ct)
    expect = int((m1.astype(object) * m2.astype(object)).sum()) % bgv.t
    assert int(got[0, 0]) == expect
    assert (got == expect).all()


def test_matvec_naive(ckks, rng):
    d = 8
    M = rng.uniform(-1, 1, (d, d))
    x = rng.uniform(-1, 1, d)
    ct = ckks.encrypt(*ckks.encode(_embed(ckks, x) + 0j))
    out = ckks.decrypt_decode(matvec_naive(ckks, M, ct))
    np.testing.assert_allclose(out.real[:d], M @ x, atol=5e-2)


def test_matvec_bsgs_matches_naive(ckks, rng):
    d = 16
    M = rng.uniform(-1, 1, (d, d))
    x = rng.uniform(-1, 1, d)
    ct = ckks.encrypt(*ckks.encode(_embed(ckks, x) + 0j))
    out = ckks.decrypt_decode(matvec_bsgs(ckks, M, ct))
    np.testing.assert_allclose(out.real[:d], M @ x, atol=5e-2)
