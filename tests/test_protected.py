"""Protected evaluator: bit-exact vs the plain path, detectors fire on
injected flips (VERDICT round-2 item #2)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rfhe_tpu.fhe.ckks import CkksContext
from rfhe_tpu.fhe.params import CkksParams
from rfhe_tpu.fhe.protected import Fault, ProtectedCkks, all_ok


@pytest.fixture(scope="module")
def setup():
    params = CkksParams.make(n=256, levels=3, scale_bits=25)
    ckks = CkksContext(params, seed=3)
    prot = ProtectedCkks(ckks)
    rng = np.random.default_rng(5)
    z = rng.normal(size=params.n // 2) + 1j * rng.normal(size=params.n // 2)
    pt, sc = ckks.encode(z)
    ct = ckks.encrypt(pt, sc)
    return ckks, prot, ct, z


def test_rotate_matches_plain(setup):
    ckks, prot, ct, _ = setup
    ref = ckks.rotate(ct, 3)
    out, flags = prot.rotate(ct, 3)
    for c_ref, c_out in zip(ref.c, out.c):
        assert jnp.array_equal(c_ref.data, c_out.data)
    assert bool(all_ok(flags))


def test_multiply_relin_matches_plain(setup):
    ckks, prot, ct, _ = setup
    ref = ckks.multiply_relin(ct, ct)
    out, flags = prot.multiply_relin(ct, ct)
    for c_ref, c_out in zip(ref.c, out.c):
        assert jnp.array_equal(c_ref.data, c_out.data)
    assert bool(all_ok(flags))


def test_rotate_decrypts_correctly(setup):
    ckks, prot, ct, z = setup
    out, flags = prot.rotate(ct, 1)
    got = ckks.decrypt_decode(out)
    np.testing.assert_allclose(got, np.roll(z, -1), atol=1e-2)


@pytest.mark.parametrize("stage,flag_keys", [
    ("intt_out", ("intt",)),
    ("digits", ("baseconv",)),
    ("digits_ntt", ("ntt",)),
])
def test_rotate_flip_detected(setup, stage, flag_keys):
    _, prot, ct, _ = setup
    _, flags = prot.rotate(ct, 2, fault=Fault(stage, limb=1, idx=17, bit=9))
    assert not bool(all_ok(flags)), stage
    fired = [k for k in flag_keys if not bool(jnp.all(flags[k]))]
    assert fired, f"{stage}: expected one of {flag_keys} to fire: " \
        f"{ {k: bool(jnp.all(v)) for k, v in flags.items()} }"


def test_storage_fault_window_documented(setup):
    """Flips after the last invariant (prod0/acc0) are the honest miss
    window — stage detectors bound compute faults, not downstream storage
    (same distinction as the LazyChecker storage-miss case,
    tests/test_ntt_control_outer.py)."""
    _, prot, ct, _ = setup
    _, flags = prot.rotate(ct, 2, fault=Fault("acc0", limb=0, idx=3, bit=4))
    assert bool(all_ok(flags))


def test_flip_campaign_sweep(setup):
    """Mini ciphertext-flip campaign: every compute-stage injection across
    random (limb, idx, bit) is detected; clean runs never false-alarm."""
    _, prot, ct, _ = setup
    rng = np.random.default_rng(11)
    n = prot.ckks.params.n
    for stage in ("intt_out", "digits", "digits_ntt"):
        for _ in range(5):
            f = Fault(stage, limb=int(rng.integers(0, ct.level + 1)),
                      idx=int(rng.integers(0, n)),
                      bit=int(rng.integers(0, 30)))
            _, flags = prot.rotate(ct, 2, fault=f)
            assert not bool(all_ok(flags)), (stage, f)
    for _ in range(3):
        _, flags = prot.rotate(ct, 2)
        assert bool(all_ok(flags))
