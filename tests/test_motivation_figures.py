import csv
import os

import pytest

from rfhe_tpu.models import motivation


def test_ntt_smear_total():
    r = motivation.ntt_smear(n=128)
    assert r["fraction"] == 1.0


def test_fft_smear_total():
    r = motivation.fft_smear(n=128)
    assert r["fraction"] == 1.0


def test_bsgs_confined():
    r = motivation.bsgs_block_smear()
    assert r["confined_to_block"] and r["disturbed"] == r["block"]


def test_baseconv_confined_to_element():
    r = motivation.baseconv_smear()
    assert r["confined_to_element"] and r["all_out_limbs_disturbed"]


def test_grouped_crt():
    assert motivation.grouped_crt_check()["consistent"]


def test_plaintext_perturb():
    r = motivation.plaintext_perturb(n=128)
    assert r["fraction"] > 0.95


def test_figures_from_csv(tmp_path):
    # synthesize a tiny sweep CSV and render the figure headlessly
    data = tmp_path / "reliaNTT.csv"
    with open(data, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["qbits", "kind", "det_rate", "miss_rate", "miss_stage1",
                    "miss_stage2", "miss_stage3", "intra_catch", "inter_catch",
                    "batch_catch"])
        for qb in (10, 12, 14):
            for kind in ("SBF", "DBF", "MOF1"):
                w.writerow([qb, kind, 0.999, 0.001, 0.001, 0.0, 0.001,
                            5, 3, 2])
    from rfhe_tpu.figures import draw
    draw.main(["relia_ntt", "--data", str(data), "--out", str(tmp_path)])
    assert (tmp_path / "relia_ntt_miss.png").exists()
    draw.main(["evaluator", "--out", str(tmp_path)])
    assert (tmp_path / "evaluator_reliability.png").exists()
