"""Protected evaluator: bit-exact vs the plain path across every
(scheme, dnum) configuration, detectors fire on injected flips (VERDICT
round-4 items #1/#3)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rfhe_tpu.fhe.bgv import BgvContext
from rfhe_tpu.fhe.ckks import CkksContext
from rfhe_tpu.fhe.params import BgvParams, CkksParams
from rfhe_tpu.fhe.protected import Fault, ProtectedBgv, ProtectedCkks, all_ok

# (scheme, dnum): dnum=None -> per-limb digits / one special prime;
# dnum=2 with L=4 limbs -> two-limb digit groups / two special primes —
# the multi-special mod-down chain and the grouped fast base extension
# (fhe/keys.py:compute_digits) both run under protection.
CONFIGS = [("ckks", None), ("ckks", 2), ("bgv", None), ("bgv", 2)]


@pytest.fixture(scope="module", params=CONFIGS,
                ids=[f"{s}-dnum{d}" for s, d in CONFIGS])
def setup(request):
    scheme, dnum = request.param
    if scheme == "ckks":
        params = CkksParams.make(n=256, levels=3, scale_bits=25)
        ev = CkksContext(params, seed=3, dnum=dnum)
        prot = ProtectedCkks(ev)
        rng = np.random.default_rng(5)
        z = rng.normal(size=params.n // 2) \
            + 1j * rng.normal(size=params.n // 2)
        pt, sc = ev.encode(z)
        ct = ev.encrypt(pt, sc)
    else:
        # t_bits=14: the smallest width with an NTT prime ≡ 1 (mod 2n)
        # at n=256 (12289)
        params = BgvParams.make(n=256, levels=3, q_bits=28, t_bits=14)
        ev = BgvContext(params, seed=3, dnum=dnum)
        prot = ProtectedBgv(ev)
        rng = np.random.default_rng(5)
        z = rng.integers(0, ev.t, size=(2, params.n // 2), dtype=np.uint32)
        ct = ev.encrypt(ev.encode(z))
    return scheme, ev, prot, ct, z


def _rotate_pair(scheme, ev, prot, ct, r, fault=None):
    if scheme == "ckks":
        return ev.rotate(ct, r), prot.rotate(ct, r, fault)
    return ev.rotate_rows(ct, r), prot.rotate_rows(ct, r, fault)


def test_rotate_matches_plain(setup):
    scheme, ev, prot, ct, _ = setup
    ref, (out, flags) = _rotate_pair(scheme, ev, prot, ct, 3)
    for c_ref, c_out in zip(ref.c, out.c):
        assert jnp.array_equal(c_ref.data, c_out.data)
    assert out.correction == ref.correction
    assert bool(all_ok(flags))


def test_multiply_relin_matches_plain(setup):
    scheme, ev, prot, ct, _ = setup
    ref = ev.multiply_relin(ct, ct)
    out, flags = prot.multiply_relin(ct, ct)
    for c_ref, c_out in zip(ref.c, out.c):
        assert jnp.array_equal(c_ref.data, c_out.data)
    assert out.correction == ref.correction
    assert bool(all_ok(flags))


def test_rotate_decrypts_correctly(setup):
    scheme, ev, prot, ct, z = setup
    if scheme == "ckks":
        out, flags = prot.rotate(ct, 1)
        got = ev.decrypt_decode(out)
        np.testing.assert_allclose(got, np.roll(z, -1), atol=1e-2)
    else:
        out, flags = prot.rotate_rows(ct, 1)
        got = ev.decrypt_decode(out)
        left = np.stack([np.roll(z[0], -1), np.roll(z[1], -1)])
        right = np.stack([np.roll(z[0], 1), np.roll(z[1], 1)])
        assert np.array_equal(got, left) or np.array_equal(got, right)
    assert bool(all_ok(flags))


# The KS-CORE projection spans digits → NTT → ⊙ksk → Σ_digits, so the
# prod0/acc0 storage stages that rounds 2-4 documented as miss windows are
# now covered (fhe/protected.py module docstring).
@pytest.mark.parametrize("stage,flag_keys", [
    ("c1_perm", ("intt",)),
    ("intt_out", ("intt",)),
    ("digits", ("baseconv",)),
    ("digits_ntt", ("ks_core",)),
    ("prod0", ("ks_core",)),
    ("acc0", ("ks_core",)),
])
def test_rotate_flip_detected(setup, stage, flag_keys):
    scheme, ev, prot, ct, _ = setup
    _, (_, flags) = _rotate_pair(scheme, ev, prot, ct, 2,
                                 Fault(stage, limb=1, idx=17, bit=9))
    assert not bool(all_ok(flags)), stage
    fired = [k for k in flag_keys if not bool(jnp.all(flags[k]))]
    assert fired, f"{stage}: expected one of {flag_keys} to fire: " \
        f"{ {k: bool(jnp.all(v)) for k, v in flags.items()} }"


def test_ks_out_window_documented(setup):
    """A flip into the final keyswitch output lands after the last
    detector read — the one remaining designed miss window (the same
    compute-vs-storage boundary the LazyChecker control campaign measures,
    tests/test_ntt_control_outer.py)."""
    scheme, ev, prot, ct, _ = setup
    _, (_, flags) = _rotate_pair(scheme, ev, prot, ct, 2,
                                 Fault("ks_out", limb=0, idx=3, bit=4))
    assert bool(all_ok(flags))


def test_flip_campaign_sweep(setup):
    """Mini ciphertext-flip campaign: every covered-stage injection across
    random (limb, idx, bit) is detected; clean runs never false-alarm."""
    scheme, ev, prot, ct, _ = setup
    rng = np.random.default_rng(11)
    n = prot.ckks.params.n
    for stage in ("intt_out", "digits", "digits_ntt", "prod0", "acc0"):
        for _ in range(3):
            f = Fault(stage, limb=int(rng.integers(0, ct.level + 1)),
                      idx=int(rng.integers(0, n)),
                      bit=int(rng.integers(0, 25)))
            _, (_, flags) = _rotate_pair(scheme, ev, prot, ct, 2, f)
            assert not bool(all_ok(flags)), (stage, f)
    for _ in range(2):
        _, (_, flags) = _rotate_pair(scheme, ev, prot, ct, 2)
        assert bool(all_ok(flags))


def test_multiply_flip_detected(setup):
    """The same stage coverage holds on the multiply+relin path (the BGV
    branch exercises the t-aware _drop_limb_protected checksum)."""
    scheme, ev, prot, ct, _ = setup
    for stage, keys in (("digits_ntt", ("ks_core",)),
                        ("acc0", ("ks_core",)),
                        ("intt_out", ("intt",))):
        _, flags = prot.multiply_relin(
            ct, ct, fault=Fault(stage, limb=0, idx=11, bit=7))
        fired = [k for k in keys if not bool(jnp.all(flags[k]))]
        assert fired, (stage, {k: bool(jnp.all(v))
                               for k, v in flags.items()})
