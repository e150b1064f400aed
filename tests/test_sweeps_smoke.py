"""Smoke tests for the sweep CLI (tiny configs, tmp output)."""
import csv
import os

import pytest

from rfhe_tpu.bench import sweeps


def _run(name, tmp_path, extra=()):
    sweeps.main([name, "--out", str(tmp_path), "--trials", "20",
                 "--vec", "32", "--N", "64", *extra])
    files = list(tmp_path.iterdir())
    assert files, name
    rows = list(csv.reader(open(files[0])))
    assert len(rows) > 1, name


def test_sweep_relia_ntt(tmp_path):
    _run("relia_ntt", tmp_path,
         ("--qbits-min", "10", "--qbits-max", "10"))


def test_sweep_relia_ntt_native(tmp_path):
    _run("relia_ntt_native", tmp_path,
         ("--qbits-min", "10", "--qbits-max", "10"))


def test_sweep_pbits(tmp_path):
    _run("pbits", tmp_path, ("--pbits-min", "10", "--pbits-max", "10"))


def test_sweep_outer_modes_run(tmp_path):
    # barrett_fold covers the reduction-campaign path
    sweeps.main(["barrett_fold", "--out", str(tmp_path), "--trials", "10",
                 "--vec", "32", "--fw-min", "4", "--fw-max", "8",
                 "--fw-step", "4"])
    assert list(tmp_path.iterdir())
