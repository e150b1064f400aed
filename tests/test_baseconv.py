import random

import numpy as np
import jax.numpy as jnp

from rfhe_tpu import numth, oracle
from rfhe_tpu.ops.baseconv import BaseConvPlan, base_conv


def test_base_conv_matches_oracle(rng):
    r = random.Random(10)
    moduli_in = numth.generate_crt_primes(4, 20, r)
    moduli_out = numth.generate_crt_primes(3, 30, r)
    plan = BaseConvPlan.make(moduli_in, moduli_out)
    n = 64
    residues = np.stack(
        [rng.integers(0, p, size=n, dtype=np.uint32) for p in moduli_in])
    got = np.asarray(base_conv(jnp.asarray(residues), plan))
    expect = oracle.base_conv(
        [list(map(int, row)) for row in residues], moduli_in, moduli_out)
    for k in range(len(moduli_out)):
        np.testing.assert_array_equal(
            got[k], np.array([expect[i][k] for i in range(n)], dtype=np.uint32))


def test_base_conv_31bit_out(rng):
    r = random.Random(11)
    moduli_in = numth.generate_crt_primes(8, 30, r)
    moduli_out = numth.generate_crt_primes(2, 31, r)
    plan = BaseConvPlan.make(moduli_in, moduli_out)
    n = 128
    residues = np.stack(
        [rng.integers(0, p, size=n, dtype=np.uint32) for p in moduli_in])
    got = np.asarray(base_conv(jnp.asarray(residues), plan))
    expect = oracle.base_conv(
        [list(map(int, row)) for row in residues], moduli_in, moduli_out)
    for k in range(len(moduli_out)):
        np.testing.assert_array_equal(
            got[k], np.array([expect[i][k] for i in range(n)], dtype=np.uint32))


def test_base_conv_batched(rng):
    r = random.Random(12)
    moduli_in = numth.generate_crt_primes(3, 20, r)
    moduli_out = numth.generate_crt_primes(2, 25, r)
    plan = BaseConvPlan.make(moduli_in, moduli_out)
    n = 16
    residues = np.stack([
        np.stack([rng.integers(0, p, size=n, dtype=np.uint32) for p in moduli_in])
        for _ in range(3)
    ])
    got = np.asarray(base_conv(jnp.asarray(residues), plan))
    for b in range(3):
        expect = oracle.base_conv(
            [list(map(int, row)) for row in residues[b]], moduli_in, moduli_out)
        for k in range(len(moduli_out)):
            np.testing.assert_array_equal(
                got[b, k],
                np.array([expect[i][k] for i in range(n)], dtype=np.uint32))
