"""Device fixed-point CRT reconstruction (ops/crt64.py): exactness across
the ±2^62 window and agreement of fast vs exact scheme decryption."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from rfhe_tpu.fhe.params import make_prime_chain
from rfhe_tpu.ops.crt64 import Crt64Plan, crt_to_words, words_to_signed


def test_crt64_exact_window():
    moduli = make_prime_chain(256, [30] * 8)
    plan = Crt64Plan.make(moduli)
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.integers(-2**61, 2**61, 512),
        [0, 1, -1, 2**61, -2**61, 2**62 - 1, -(2**62 - 1)],
    ]).astype(object)
    res = np.stack([np.array([int(v) % q for v in vals], dtype=np.uint32)
                    for q in moduli])
    hi, lo = jax.jit(lambda x: crt_to_words(x, plan))(jnp.asarray(res))
    got = words_to_signed(np.asarray(hi), np.asarray(lo))
    assert np.array_equal(got, np.array([int(v) for v in vals],
                                        dtype=np.int64))


def test_crt64_single_limb_and_small_q():
    """When Q < 2^62 every centered value is in-window (k=1, k=2)."""
    rng = np.random.default_rng(1)
    for k in (1, 2):
        moduli = make_prime_chain(128, [30] * k)
        Q = math.prod(moduli)
        plan = Crt64Plan.make(moduli)
        vals = [int(v) for v in rng.integers(0, Q, 64, dtype=np.uint64)]
        centered = [v - Q if v > Q // 2 else v for v in vals]
        res = np.stack([np.array([v % q for v in vals], dtype=np.uint32)
                        for q in moduli])
        hi, lo = crt_to_words(jnp.asarray(res), plan)
        got = words_to_signed(np.asarray(hi), np.asarray(lo))
        assert np.array_equal(got, np.array(centered, dtype=np.int64)), k


def test_ckks_fast_vs_exact_decrypt():
    from rfhe_tpu.fhe import CkksContext, CkksParams
    params = CkksParams.make(n=256, levels=2, q0_bits=30, scale_bits=26)
    ckks = CkksContext(params, seed=7)
    rng = np.random.default_rng(2)
    z = rng.uniform(-1, 1, 128) + 1j * rng.uniform(-1, 1, 128)
    ct = ckks.encrypt(*ckks.encode(z))
    fast = ckks.decrypt_decode(ct)
    exact = ckks.decrypt_decode(ct, exact=True)
    np.testing.assert_allclose(fast, exact, rtol=0, atol=1e-9)


def test_bgv_fast_vs_exact_decrypt():
    from rfhe_tpu.fhe.bgv import BgvContext
    from rfhe_tpu.fhe.params import BgvParams
    params = BgvParams.make(n=256, levels=2, q_bits=30, t_bits=16)
    bgv = BgvContext(params, seed=11)
    rng = np.random.default_rng(3)
    m = rng.integers(0, bgv.t, (2, 128))
    ct = bgv.encrypt(bgv.encode(m))
    ct = bgv.mod_switch_to_next(ct)   # exercises the correction factor
    fast = bgv.decrypt_coeffs_t(ct)
    exact = bgv.decrypt_coeffs_t(ct, exact=True)
    assert np.array_equal(fast, exact)
