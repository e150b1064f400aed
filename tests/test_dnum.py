import numpy as np
import pytest

from rfhe_tpu.fhe import CkksContext, CkksParams
from rfhe_tpu.fhe.params import BgvParams
from rfhe_tpu.fhe.bgv import BgvContext


@pytest.mark.parametrize("dnum", [2, 3])
def test_ckks_dnum_multiply_rotate(dnum):
    """Grouped-digit hybrid keyswitch (alpha = ceil(L/dnum) special primes)
    must decrypt correctly for relinearization and rotation."""
    params = CkksParams.make(n=512, levels=5, q0_bits=30, scale_bits=26)
    ckks = CkksContext(params, seed=3, dnum=dnum)
    rng = np.random.default_rng(0)
    z1 = rng.uniform(-1, 1, 256) + 0j
    z2 = rng.uniform(-1, 1, 256) + 0j
    ct1 = ckks.encrypt(*ckks.encode(z1))
    ct2 = ckks.encrypt(*ckks.encode(z2))
    out = ckks.decrypt_decode(ckks.multiply_relin(ct1, ct2))
    np.testing.assert_allclose(out, z1 * z2, atol=5e-2)
    rot = ckks.decrypt_decode(ckks.rotate(ct1, 1))
    ok = min(np.abs(rot - np.roll(z1, -1)).max(),
             np.abs(rot - np.roll(z1, 1)).max())
    assert ok < 5e-2


def test_ckks_dnum_after_rescale():
    """Partial last group at lower levels must still keyswitch correctly."""
    params = CkksParams.make(n=512, levels=5, q0_bits=30, scale_bits=26)
    ckks = CkksContext(params, seed=3, dnum=2)
    rng = np.random.default_rng(1)
    z = rng.uniform(0.3, 1, 256) + 0j
    ct = ckks.encrypt(*ckks.encode(z))
    sq = ckks.rescale(ckks.multiply_relin(ct, ct))       # level drops by 1
    sq2 = ckks.rescale(ckks.multiply_relin(sq, sq))      # drops again
    out = ckks.decrypt_decode(sq2)
    np.testing.assert_allclose(out, z ** 4, atol=1e-1)


def test_bgv_dnum_exact():
    params = BgvParams.make(n=512, levels=3, q_bits=30, t_bits=16)
    bgv = BgvContext(params, seed=5, dnum=2)
    rng = np.random.default_rng(2)
    m1 = rng.integers(0, bgv.t, (2, 256), dtype=np.uint32)
    m2 = rng.integers(0, bgv.t, (2, 256), dtype=np.uint32)
    ct = bgv.multiply_relin(bgv.encrypt(bgv.encode(m1)),
                            bgv.encrypt(bgv.encode(m2)))
    got = bgv.decrypt_decode(ct)
    np.testing.assert_array_equal(got, (m1.astype(np.uint64) * m2) % bgv.t)
