"""Serialization roundtrips + compression modes (framewk.cpp serialize rows)."""
import numpy as np
import pytest

from rfhe_tpu.fhe import CkksContext, CkksParams
from rfhe_tpu.fhe import serialize as ser


@pytest.fixture(scope="module")
def ckks():
    return CkksContext(CkksParams.make(n=64, levels=2, q0_bits=30,
                                       scale_bits=26), seed=11)


@pytest.fixture(scope="module")
def ct(ckks):
    z = np.random.default_rng(0).uniform(-1, 1, 32) + 0j
    return ckks.encrypt(*ckks.encode(z)), z


@pytest.mark.parametrize("comp", ["none", "zlib", "lzma"])
def test_ciphertext_roundtrip(ckks, ct, comp):
    c, z = ct
    blob = ser.serialize_ciphertext(c, compression=comp)
    back = ser.deserialize_ciphertext(blob)
    assert back.scale == c.scale and back.correction == c.correction
    for p, q in zip(c.c, back.c):
        assert p.is_ntt == q.is_ntt
        assert np.array_equal(np.asarray(p.data), np.asarray(q.data))
    # still decrypts
    err = np.abs(ckks.decrypt_decode(back) - z).max()
    assert err < 1e-2


def test_compression_shrinks(ckks, ct):
    c, _ = ct
    raw = len(ser.serialize_ciphertext(c, "none"))
    zl = len(ser.serialize_ciphertext(c, "zlib"))
    # uniform RNS residues barely compress, but 30-bit limbs in u32 leave
    # headroom; mostly this asserts the envelope stays well-formed
    assert zl <= raw


def test_public_and_keyswitch_key_roundtrip(ckks):
    blob = ser.serialize_public_key(ckks.pk, "zlib")
    pk = ser.deserialize_public_key(blob)
    assert np.array_equal(np.asarray(pk.b), np.asarray(ckks.pk.b))
    assert np.array_equal(np.asarray(pk.a), np.asarray(ckks.pk.a))
    rlk = ckks.rlk
    blob = ser.serialize_keyswitch_key(rlk, "lzma")
    back = ser.deserialize_keyswitch_key(blob)
    assert np.array_equal(np.asarray(back.b), np.asarray(rlk.b))
    assert np.array_equal(np.asarray(back.a), np.asarray(rlk.a))


def test_kind_mismatch_raises(ckks, ct):
    blob = ser.serialize_public_key(ckks.pk)
    with pytest.raises(ValueError):
        ser.deserialize_ciphertext(blob)


def test_seeded_ciphertext_halves_wire_size(ckks):
    """SEAL Serializable<Ciphertext> analog: encrypt_seeded ships c0+seed,
    the blob regenerates c1 exactly, and the plaintext still decrypts."""
    seed = 1234
    rng = np.random.default_rng(9)
    z = rng.uniform(-1, 1, ckks.params.n // 2) + 0j
    fresh = ckks.encrypt_seeded(*ckks.encode(z), seed=seed)
    blob_full = ser.serialize_ciphertext(fresh)
    blob_seed = ser.serialize_ciphertext_seeded(fresh, seed,
                                                ckks.params.moduli)
    assert len(blob_seed) < 0.6 * len(blob_full)
    back = ser.deserialize_ciphertext_seeded(blob_seed, ckks.params.moduli)
    for p, q in zip(fresh.c, back.c):
        assert np.array_equal(np.asarray(p.data), np.asarray(q.data))
    np.testing.assert_allclose(ckks.decrypt_decode(back), z, atol=1e-3)


def test_seeded_serialize_rejects_nonseeded(ckks, ct):
    """A public-key encryption's c1 is not seed-expandable: refuse loudly
    instead of silently shipping a blob that decrypts to garbage."""
    import pytest
    c, _ = ct
    with pytest.raises(ValueError, match="seed does not regenerate"):
        ser.serialize_ciphertext_seeded(c, 1234, ckks.params.moduli)
