import numpy as np
import jax
import pytest

from rfhe_tpu.fhe import CkksContext, CkksParams
from rfhe_tpu.parallel.mesh import make_mesh, shard_ciphertext


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 4
    ckks = CkksContext(CkksParams.make(n=512, levels=3, q0_bits=30,
                                       scale_bits=26), seed=3)
    mesh = make_mesh(4, axis="limb")
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, 256) + 0j
    ct = ckks.encrypt(*ckks.encode(z))
    return ckks, mesh, ct, z


def test_sharded_rotate_bit_identical(setup):
    ckks, mesh, ct, z = setup
    ct_sh = shard_ciphertext(ct, mesh)
    a = ckks.rotate(ct, 1)
    b = ckks.rotate(ct_sh, 1)
    np.testing.assert_array_equal(np.asarray(a.c[0].data),
                                  np.asarray(b.c[0].data))
    np.testing.assert_array_equal(np.asarray(a.c[1].data),
                                  np.asarray(b.c[1].data))
    # output stays limb-sharded
    assert "limb" in str(b.c[0].data.sharding)


def test_sharded_mult_relin_rescale(setup):
    ckks, mesh, ct, z = setup
    ct_sh = shard_ciphertext(ct, mesh)
    a = ckks.rescale(ckks.multiply_relin(ct, ct))
    b = ckks.rescale(ckks.multiply_relin(ct_sh, ct_sh))
    np.testing.assert_array_equal(np.asarray(a.c[0].data),
                                  np.asarray(b.c[0].data))
    out = ckks.decrypt_decode(b)
    np.testing.assert_allclose(out, z * z, atol=5e-2)
