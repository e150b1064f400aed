import shutil

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def test_native_builds_and_matches_reference_stats():
    from rfhe_tpu import native
    native.build()
    res = native.four_step_mc("SBF", 200_000, 64, 769, 24, seed=42)
    # reference reliaNTT_test_result.txt: stage-1/3 miss ~0.0013, stage-2 0;
    # op-count weighting gives overall miss ~0.0011
    assert 0.0003 < res["miss_rate"] < 0.003
    assert res["stats"]["intra_catch"] > 0
    assert res["stats"]["batch_catch"] > 0


def test_native_three_stage_matches_jax_campaign():
    from rfhe_tpu import native
    res = native.three_stage_mc("MCF-CLE", 20_000, 8, 3, 4, seed=1)
    # reference draw_ntt_reliability: collision ~0.55 at 2-bit primes
    assert 0.45 < res["collision_prob"][0] < 0.65
    assert 0.45 < res["collision_prob"][2] < 0.65
    res = native.three_stage_mc("SCF-BF", 20_000, 8, 12289, 24, seed=2)
    assert max(res["collision_prob"]) < 0.01


def test_native_mof1_randomized():
    from rfhe_tpu import native
    res = native.four_step_mc("MOF1", 50_000, 64, 769, 24, seed=3)
    # randomized faults collide with prob ~1/q per stage
    assert res["miss_rate"] < 0.02


def test_native_multifault_scenarios():
    """Stage-targeted multi-fault parity with the reference's table:
    SBF+SBF stage-1/3 miss ~0.005, stage-2 (twiddle) miss 0."""
    from rfhe_tpu import native
    r1 = native.four_step_mc("SBF+SBF", 20_000, 64, 769, 24, seed=42,
                             target_stage=1)
    assert r1["miss_rate"] == 0.0
    assert r1["stats"]["intra_catch"] == 20_000
    r0 = native.four_step_mc("SBF+SBF", 20_000, 64, 769, 24, seed=42,
                             target_stage=0)
    assert 0.001 < r0["miss_rate"] < 0.01    # reference: 0.0048-0.0049
    r2 = native.four_step_mc("MLF+MLF", 20_000, 64, 769, 24, seed=42,
                             target_stage=2)
    assert r2["miss_rate"] < 0.01
    assert r2["stats"]["batch2_catch"] > 19_000
