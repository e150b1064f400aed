import numpy as np
import pytest

from rfhe_tpu.fhe import CkksContext, CkksParams


@pytest.fixture(scope="module")
def ckks():
    params = CkksParams.make(n=1024, levels=2, q0_bits=30, scale_bits=26)
    return CkksContext(params, special_bits=31, seed=3)


def _slots(ckks, rng, lo=-1.0, hi=1.0):
    n2 = ckks.params.n // 2
    return (rng.uniform(lo, hi, n2) + 1j * rng.uniform(lo, hi, n2))


def test_encode_decode_roundtrip(ckks, rng):
    z = _slots(ckks, rng)
    pt, scale = ckks.encode(z)
    from rfhe_tpu.fhe.ckks import rns_to_signed, decode
    signed = rns_to_signed(np.asarray(pt.data),
                           ckks.params.moduli[:pt.level + 1])
    back = decode(signed.astype(np.float64), ckks.params.n, scale)
    np.testing.assert_allclose(back, z, atol=1e-5)


def test_encrypt_decrypt(ckks, rng):
    z = _slots(ckks, rng)
    pt, scale = ckks.encode(z)
    ct = ckks.encrypt(pt, scale)
    back = ckks.decrypt_decode(ct)
    np.testing.assert_allclose(back, z, atol=1e-3)


def test_add_sub(ckks, rng):
    z1, z2 = _slots(ckks, rng), _slots(ckks, rng)
    ct1 = ckks.encrypt(*ckks.encode(z1))
    ct2 = ckks.encrypt(*ckks.encode(z2))
    np.testing.assert_allclose(ckks.decrypt_decode(ckks.add(ct1, ct2)),
                               z1 + z2, atol=1e-3)
    np.testing.assert_allclose(ckks.decrypt_decode(ckks.sub(ct1, ct2)),
                               z1 - z2, atol=1e-3)


def test_multiply_relin_rescale(ckks, rng):
    z1, z2 = _slots(ckks, rng), _slots(ckks, rng)
    ct1 = ckks.encrypt(*ckks.encode(z1))
    ct2 = ckks.encrypt(*ckks.encode(z2))
    ct3 = ckks.multiply_relin(ct1, ct2)
    assert ct3.size == 2
    back = ckks.decrypt_decode(ct3)
    np.testing.assert_allclose(back, z1 * z2, atol=1e-2)
    ct4 = ckks.rescale(ct3)
    assert ct4.level == ct3.level - 1
    back = ckks.decrypt_decode(ct4)
    np.testing.assert_allclose(back, z1 * z2, atol=1e-2)


def test_multiply_no_relin_decrypts(ckks, rng):
    z1, z2 = _slots(ckks, rng), _slots(ckks, rng)
    ct1 = ckks.encrypt(*ckks.encode(z1))
    ct2 = ckks.encrypt(*ckks.encode(z2))
    ct3 = ckks.multiply(ct1, ct2)
    assert ct3.size == 3
    back = ckks.decrypt_decode(ct3)
    np.testing.assert_allclose(back, z1 * z2, atol=1e-2)


def test_multiply_plain(ckks, rng):
    z1, z2 = _slots(ckks, rng), _slots(ckks, rng)
    ct = ckks.encrypt(*ckks.encode(z1))
    pt, psc = ckks.encode(z2)
    out = ckks.multiply_plain(ct, pt, psc)
    np.testing.assert_allclose(ckks.decrypt_decode(out), z1 * z2, atol=1e-2)


def test_rotate(ckks, rng):
    z = _slots(ckks, rng)
    ct = ckks.encrypt(*ckks.encode(z))
    for r in (1, 2, 5):
        rot = ckks.rotate(ct, r)
        back = ckks.decrypt_decode(rot)
        expect = np.roll(z, -r)
        if not np.allclose(back, expect, atol=1e-2):
            expect = np.roll(z, r)
        np.testing.assert_allclose(back, expect, atol=1e-2)


def test_conjugate(ckks, rng):
    z = _slots(ckks, rng)
    ct = ckks.encrypt(*ckks.encode(z))
    back = ckks.decrypt_decode(ckks.conjugate(ct))
    np.testing.assert_allclose(back, np.conj(z), atol=1e-2)


def test_depth2(ckks, rng):
    """Two multiplications with rescale in between."""
    z = _slots(ckks, rng, 0.5, 1.0).real + 0j
    ct = ckks.encrypt(*ckks.encode(z))
    sq = ckks.rescale(ckks.multiply_relin(ct, ct))
    sq2 = ckks.rescale(ckks.multiply_relin(sq, sq))
    back = ckks.decrypt_decode(sq2)
    np.testing.assert_allclose(back, z ** 4, atol=5e-2)


def test_composite_scale_precision():
    """scale_bits > 30 switches to the two-prime composite scale (alpha=2):
    SEAL-class precision (the reference's 50-60-bit-limb regime) out of u32
    limbs.  Precision jumps from ~1e-3 (single 28-bit scale) to ~1e-9."""
    from rfhe_tpu.fhe import CkksContext, CkksParams
    params = CkksParams.make(n=512, levels=2, q0_bits=31, scale_bits=56)
    assert params.alpha == 2 and len(params.moduli) == 6
    ckks = CkksContext(params, seed=7)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, 256) + 1j * rng.uniform(-1, 1, 256)
    ct = ckks.encrypt(*ckks.encode(z))
    m = ckks.rescale(ckks.multiply_relin(ct, ct))
    assert m.level == ct.level - 2
    np.testing.assert_allclose(ckks.decrypt_decode(m), z * z, atol=1e-9)
    r = ckks.rotate(ct, 5)
    np.testing.assert_allclose(ckks.decrypt_decode(r), np.roll(z, -5),
                               atol=1e-9)
    m2 = ckks.rescale(ckks.multiply_relin(m, m))
    np.testing.assert_allclose(ckks.decrypt_decode(m2), (z * z) ** 2,
                               atol=1e-8)
