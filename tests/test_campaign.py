import numpy as np
import pytest

from rfhe_tpu import numth
from rfhe_tpu.faults.campaign import three_stage_campaign, four_step_ntt_campaign


def test_three_stage_scf_bf_large_prime():
    """With a 14-bit prime and W=24, SCF-BF collisions are ~0 at every stage
    (reference results_pbits: 0 for pbits >= 5)."""
    import random
    P = numth.find_prime_with_bitlen(14, random.Random(42))
    res = three_stage_campaign("SCF-BF", trials=2000, S=8, P=P, W=24, seed=42)
    assert res["injected"].sum() == 2000
    assert res["collision_prob"].max() <= 0.005


def test_three_stage_mcf_cle_small_prime():
    """MCF-CLE with a tiny prime has high collision probability
    (reference draw_ntt_reliability: 0.55 @ 2-bit)."""
    res = three_stage_campaign("MCF-CLE", trials=1000, S=8, P=3, W=4, seed=1)
    assert res["collision_prob"].max() > 0.2


def test_three_stage_all_types_run():
    import random
    P = numth.find_prime_with_bitlen(10, random.Random(7))
    for ftype in ("SCF-BF", "SCF-MBU", "MCF-PPE", "MCF-CTE", "MCF-CLE"):
        res = three_stage_campaign(ftype, trials=200, S=8, P=P, W=8, seed=3)
        assert res["injected"].sum() == 200


def test_four_step_campaign_sbf():
    """N=64, q=769 (10-bit), fold 24: SBF miss ~1/q on matmul stages, ~0 on
    the twiddle stage (reference reliaNTT_test_result.txt: 0.0013 / 0.0)."""
    q = 769
    res = four_step_ntt_campaign("SBF", trials=4000, n=64, q=q, fold_width=24,
                                 seed=42)
    assert res["miss_rate"] < 0.01
    # twiddle-stage misses are essentially zero (fold 2^24+1 >> q=769 means a
    # changed value can never collide)
    assert res["per_stage_miss"][1] <= 1e-3
    # matmul stages miss at ~1/q
    assert res["per_stage_miss"][0] < 0.02
    assert res["per_stage_miss"][2] < 0.02


def test_four_step_campaign_mof1():
    q = 769
    res = four_step_ntt_campaign("MOF1", trials=2000, n=64, q=q, seed=7)
    # randomized faults can be harmless (same value) with prob 1/q; detection
    # otherwise near-certain
    assert res["miss_rate"] < 0.02
    assert res["stats"]["intra_catch"] > 0


def test_four_step_multifault_scenarios_stage_targeted():
    """The reference's multi-fault rows (reliaNTT_test_result.txt:31-70):
    SBF+SBF misses ~2/q on matmul stages, 0 on the twiddle stage."""
    q = 769
    res1 = four_step_ntt_campaign("SBF+SBF", trials=2000, n=64, q=q,
                                  seed=11, target_stage=1)
    assert res1["miss_rate"] == 0.0          # twiddle intra fold never misses
    assert res1["stats"]["intra_catch"] > 0
    res0 = four_step_ntt_campaign("SBF+SBF", trials=2000, n=64, q=q,
                                  seed=12, target_stage=0)
    assert res0["miss_rate"] < 0.02          # ~2/q = 0.0026
    assert res0["stats"]["batch1_catch"] > 1900


def test_four_step_mlf_runs():
    q = 769
    res = four_step_ntt_campaign("MLF", trials=500, n=64, q=q, seed=13)
    assert res["miss_rate"] < 0.02


def test_four_step_scenario_table_shape():
    from rfhe_tpu.faults.campaign import (FOUR_STEP_SCENARIOS,
                                          four_step_scenario_table)
    rows = four_step_scenario_table(trials=50, n=16, q=97, seed=3)
    assert len(rows) == len(FOUR_STEP_SCENARIOS) * 3
    assert all(0.0 <= r["miss_rate"] <= 1.0 for r in rows)
