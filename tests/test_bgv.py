import numpy as np
import pytest

from rfhe_tpu.fhe.params import BgvParams
from rfhe_tpu.fhe.bgv import BgvContext


@pytest.fixture(scope="module")
def bgv():
    params = BgvParams.make(n=1024, levels=2, q_bits=30, t_bits=16)
    return BgvContext(params, seed=5)


def _mat(bgv, rng):
    return rng.integers(0, bgv.t, size=(2, bgv.params.n // 2), dtype=np.uint32)


def test_encode_decode(bgv, rng):
    m = _mat(bgv, rng)
    pt = bgv.encode(m)
    coeffs = np.asarray(pt.data)
    # decode from the limb-0 residues reduced mod t? use exact path:
    from rfhe_tpu.fhe.ckks import rns_to_signed
    signed = rns_to_signed(coeffs, bgv.params.moduli)
    ct_coeffs = np.array([int(x) % bgv.t for x in signed], dtype=np.uint32)
    np.testing.assert_array_equal(bgv.decode(ct_coeffs), m)


def test_encrypt_decrypt(bgv, rng):
    m = _mat(bgv, rng)
    ct = bgv.encrypt(bgv.encode(m))
    np.testing.assert_array_equal(bgv.decrypt_decode(ct), m)


def test_add(bgv, rng):
    m1, m2 = _mat(bgv, rng), _mat(bgv, rng)
    ct = bgv.add(bgv.encrypt(bgv.encode(m1)), bgv.encrypt(bgv.encode(m2)))
    np.testing.assert_array_equal(
        bgv.decrypt_decode(ct), (m1.astype(np.uint64) + m2) % bgv.t)


def test_multiply_relin(bgv, rng):
    m1, m2 = _mat(bgv, rng), _mat(bgv, rng)
    ct = bgv.multiply_relin(bgv.encrypt(bgv.encode(m1)),
                            bgv.encrypt(bgv.encode(m2)))
    assert ct.size == 2
    np.testing.assert_array_equal(
        bgv.decrypt_decode(ct), (m1.astype(np.uint64) * m2) % bgv.t)


def test_multiply_plain(bgv, rng):
    m1, m2 = _mat(bgv, rng), _mat(bgv, rng)
    out = bgv.multiply_plain(bgv.encrypt(bgv.encode(m1)), bgv.encode(m2))
    np.testing.assert_array_equal(
        bgv.decrypt_decode(out), (m1.astype(np.uint64) * m2) % bgv.t)


def test_mod_switch(bgv, rng):
    m1, m2 = _mat(bgv, rng), _mat(bgv, rng)
    ct = bgv.multiply_relin(bgv.encrypt(bgv.encode(m1)),
                            bgv.encrypt(bgv.encode(m2)))
    ct2 = bgv.mod_switch_to_next(ct)
    assert ct2.level == ct.level - 1
    np.testing.assert_array_equal(
        bgv.decrypt_decode(ct2), (m1.astype(np.uint64) * m2) % bgv.t)


def test_rotate_rows(bgv, rng):
    m = _mat(bgv, rng)
    ct = bgv.encrypt(bgv.encode(m))
    got = bgv.decrypt_decode(bgv.rotate_rows(ct, 1))
    # row rotation by 1: each row cycles by one position (direction is an
    # implementation convention; accept either)
    left = np.stack([np.roll(m[0], -1), np.roll(m[1], -1)])
    right = np.stack([np.roll(m[0], 1), np.roll(m[1], 1)])
    assert np.array_equal(got, left) or np.array_equal(got, right)


def test_rotate_columns(bgv, rng):
    m = _mat(bgv, rng)
    ct = bgv.encrypt(bgv.encode(m))
    got = bgv.decrypt_decode(bgv.rotate_columns(ct))
    np.testing.assert_array_equal(got, m[::-1])
