import numpy as np
import pytest

from rfhe_tpu import numth
from rfhe_tpu.ops.ntt import StackedNttPlan
from rfhe_tpu.faults.hardware import (
    ntt_flip_campaign, ntt_real_test, ciphertext_flip, dotprod_fault_campaign,
    compare_buffers)


def _plan():
    primes = numth.find_ntt_primes(256, 30, 4)
    return StackedNttPlan.make(256, primes)


def test_ntt_flip_campaign_propagates():
    """A single flipped input symbol smears across the whole limb's outputs
    (the error-propagation motivation: exp_log.txt symbol error = one full
    limb corrupted)."""
    plan = _plan()
    stats, info = ntt_flip_campaign(plan, batch=2, num_flips=2,
                                    num_target_symbols=1, seed=1)
    assert info["input_symbols_corrupted"] == 1
    # the fault smears: far more output symbols corrupted than inputs
    assert stats.symbol_errors > 100
    # but confined to one (batch, limb) row of n symbols
    assert stats.symbol_errors <= plan.n
    assert 0 < stats.bit_error_rate < 1


def test_ntt_real_test_clean():
    plan = _plan()
    stats = ntt_real_test(plan, batch=2, seed=0)
    assert stats.hamming_bits == 0      # no silent faults on this run
    assert stats.symbol_errors == 0


def test_compare_buffers_counts():
    import jax.numpy as jnp
    a = jnp.zeros(16, dtype=jnp.uint32)
    b = a.at[3].set(jnp.uint32(0b101))
    s = compare_buffers(a, b)
    assert s.hamming_bits == 2 and s.symbol_errors == 1
    assert s.total_symbols == 16


def test_ciphertext_flip():
    import jax.numpy as jnp
    x = jnp.zeros((2, 8), dtype=jnp.uint32)
    y = ciphertext_flip(x, 32 * 9 + 5)
    assert int(np.asarray(y).reshape(-1)[9]) == 32


def test_dotprod_fault_campaign():
    from rfhe_tpu.fhe.params import BgvParams
    from rfhe_tpu.fhe.bgv import BgvContext
    # levels=2 so the post-multiply mod-switch lands at Q ~ 2^60, leaving
    # noise budget for the rotation tree (a single 30-bit prime cannot hold
    # t=2^16 keyswitch noise)
    bgv = BgvContext(BgvParams.make(n=256, levels=2, q_bits=30, t_bits=16),
                     seed=5)
    res = dotprod_fault_campaign(bgv, bits_per_symbol=1, num_symbols=1, seed=2)
    assert res["clean_product_ok"]
    assert res["clean_dot_ok"]
    # a single ciphertext bit flip corrupts (essentially) every product slot
    assert res["symbol_errors"] > res["total_symbols"] // 2
