from rfhe_tpu.bench.perf_suite import (
    ckks_performance_test, bgv_performance_test, bfv_performance_test,
    MicroTest)


def test_ckks_perf_suite_runs():
    res = ckks_performance_test(n=256, levels=1, iters=2)
    for op in ("encode", "encrypt", "add", "multiply_relin", "rescale",
               "rotate_one", "conjugate", "decrypt_decode"):
        assert op in res and res[op] > 0


def test_bgv_perf_suite_runs():
    res = bgv_performance_test(n=256, levels=1, iters=2)
    for op in ("batch_encode", "multiply_relin", "rotate_rows",
               "rotate_columns"):
        assert op in res and res[op] > 0


def test_bfv_perf_suite_runs():
    res = bfv_performance_test(n=256, levels=1, iters=2)
    for op in ("batch_encode", "multiply", "square", "multiply_relin",
               "rotate_rows", "rotate_columns"):
        assert op in res and res[op] > 0


def test_microtest_registry():
    import jax.numpy as jnp
    mt = MicroTest("add64", lambda: (jnp.arange(64), jnp.arange(64)),
                   lambda a, b: a + b, iters=3)
    us = mt()
    assert us > 0
    assert "add64" in MicroTest.registry
