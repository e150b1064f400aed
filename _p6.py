import time, jax, jax.numpy as jnp, numpy as np
from rfhe_tpu import numth
from rfhe_tpu.ops.ntt_mxu import MxuNttPlan
from rfhe_tpu.ops import ntt_pease, u32

def reptime(body, x, rep, iters=8):
    @jax.jit
    def f(v):
        return jax.lax.fori_loop(0, rep, lambda i, a: body(a), v)
    y = f(x); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters): y = f(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters

def slope(body, x, r1=16, r2=128):
    t1, t2 = reptime(body, x, r1), reptime(body, x, r2)
    return (t2 - t1) / (r2 - r1) * 1e6

n, L, B = 4096, 21, 8
primes = numth.find_ntt_primes(n, 30, L)
mp = MxuNttPlan.make(n, primes)
pp = ntt_pease.PeaseNttPlan.make(n, primes)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, min(primes), (B, L, n), dtype=np.uint32))
tr = B * L

t = slope(lambda a: u32.add_mod(a, a, mp.qb(1)), x)
print(f"add_mod   dev: {t:8.2f} us ({2*x.nbytes/(t*1e-6)/1e9:5.0f} GB/s)")
t = slope(lambda a: u32.mont_mul(a, a, mp.qb(1), mp.qinvb(1)), x)
print(f"mont_mul  dev: {t:8.2f} us")
t = slope(mp.fwd, x)
print(f"mxu fwd   dev: {t:8.2f} us -> {tr/(t*1e-6):12.0f} tr/s")
t = slope(lambda a: ntt_pease.negacyclic_ntt(a, pp), x)
print(f"pease fwd dev: {t:8.2f} us -> {tr/(t*1e-6):12.0f} tr/s")
