import random

import numpy as np
import jax.numpy as jnp

from rfhe_tpu.ops import bigint


def _rand_vals(r, bits, count, limbs):
    xs = [r.getrandbits(bits) for _ in range(count)]
    arr = np.stack([bigint.from_int(x, limbs) for x in xs])
    return xs, jnp.asarray(arr)


def test_roundtrip():
    r = random.Random(0)
    for bits, limbs in ((30, 1), (64, 2), (100, 4), (128, 4)):
        x = r.getrandbits(bits)
        assert bigint.to_int(bigint.from_int(x, limbs)) == x


def test_add_sub():
    r = random.Random(1)
    xs, a = _rand_vals(r, 90, 50, 4)
    ys, b = _rand_vals(r, 90, 50, 4)
    s = bigint.add(a, b)
    for i in range(50):
        assert bigint.to_int(np.asarray(s)[i]) == xs[i] + ys[i]
    d, borrow = bigint.sub(a, b)
    for i in range(50):
        if xs[i] >= ys[i]:
            assert int(np.asarray(borrow)[i]) == 0
            assert bigint.to_int(np.asarray(d)[i]) == xs[i] - ys[i]
        else:
            assert int(np.asarray(borrow)[i]) == 1
    ge = np.asarray(bigint.cmp_ge(a, b))
    for i in range(50):
        assert bool(ge[i]) == (xs[i] >= ys[i])


def test_mul():
    r = random.Random(2)
    for bits_a, la, bits_b, lb in ((60, 2, 60, 2), (74, 3, 38, 2), (100, 4, 30, 1)):
        xs, a = _rand_vals(r, bits_a, 30, la)
        ys, b = _rand_vals(r, bits_b, 30, lb)
        p = bigint.mul(a, b)
        for i in range(30):
            assert bigint.to_int(np.asarray(p)[i]) == xs[i] * ys[i], (bits_a, bits_b, i)


def test_shift_right():
    r = random.Random(3)
    xs, a = _rand_vals(r, 112, 30, 4)
    for sh in (1, 31, 32, 74, 100):
        s = bigint.shift_right(a, sh)
        for i in range(30):
            assert bigint.to_int(np.asarray(s)[i]) == xs[i] >> sh, sh


def test_xor_bit():
    r = random.Random(4)
    xs, a = _rand_vals(r, 100, 20, 4)
    pos = jnp.asarray(np.array([r.randrange(110) for _ in range(20)],
                               dtype=np.uint32))
    y = bigint.xor_bit(a, pos)
    for i in range(20):
        assert bigint.to_int(np.asarray(y)[i]) == xs[i] ^ (1 << int(pos[i]))


def test_bit_length():
    r = random.Random(5)
    xs, a = _rand_vals(r, 100, 30, 4)
    bl = np.asarray(bigint.bit_length(a))
    for i in range(30):
        assert int(bl[i]) == xs[i].bit_length()
    assert int(np.asarray(bigint.bit_length(jnp.zeros((1, 4), jnp.uint32)))[0]) == 0


def test_folds():
    r = random.Random(6)
    xs, a = _rand_vals(r, 112, 40, 4)
    for w in (4, 8, 16, 24, 26, 31, 32):
        f = np.asarray(bigint.fold_mod(a, w))
        for i in range(40):
            assert int(f[i]) == xs[i] % ((1 << w) - 1), w
    for w in (4, 8, 16, 24, 27, 30):
        f = np.asarray(bigint.fold_2s1(a, w))
        for i in range(40):
            assert int(f[i]) == xs[i] % ((1 << w) + 1), w


def test_mod_small():
    r = random.Random(7)
    xs, a = _rand_vals(r, 112, 40, 4)
    for m in (998244353, (1 << 30) + 3**5, 2147483629):
        got = np.asarray(bigint.mod_small(a, m))
        for i in range(40):
            assert int(got[i]) == xs[i] % m
