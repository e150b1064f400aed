"""ctypes bindings for the native Monte-Carlo engine (native/rfhe_mc.cpp).

The library is built on demand (g++ -O3 -fopenmp -shared); host-side exact
op-granularity campaigns complement the vectorized on-device JAX campaigns
the way the reference's OpenMP twins complement its Python simulators.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from pathlib import Path
from typing import Dict

_SRC = Path(__file__).resolve().parent.parent / "native" / "rfhe_mc.cpp"
_LIB = Path(__file__).resolve().parent.parent / "native" / "librfhe_mc.so"

FAULT_IDS = {"SCF-BF": 0, "SCF-MBU": 1, "MCF-PPE": 2, "MCF-CTE": 3,
             "MCF-CLE": 4}
KIND_IDS = {"SBF": 0, "DBF": 1, "MOF1": 2}


def build(force: bool = False) -> Path:
    if _LIB.exists() and not force and \
            _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O3", "-fopenmp", "-std=c++17", "-shared", "-fPIC",
           str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True)
    return _LIB


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(build()))
    lib.four_step_mc.argtypes = [
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_longlong)]
    lib.three_stage_mc.argtypes = [
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_longlong)]
    return lib


def four_step_mc(kind: str, trials: int, n: int, q: int,
                 fold_width: int = 24, seed: int = 42) -> Dict:
    """Protected four-step NTT MC at butterfly-op granularity
    (relia_ntt_sim semantics; native OpenMP)."""
    from .numth import primitive_root
    g = primitive_root(q)
    out = (ctypes.c_longlong * 5)()
    _lib().four_step_mc(trials, n, q, g, fold_width, KIND_IDS[kind], seed, out)
    detected = out[0]
    return {
        "det_rate": detected / trials,
        "miss_rate": 1.0 - detected / trials,
        "stats": {"intra_catch": out[1], "inter_catch": out[2],
                  "batch_catch": out[3]},
    }


def three_stage_mc(ftype: str, trials: int, S: int, P: int, W: int,
                   seed: int = 42) -> Dict:
    """3-stage pipeline MC (four_step_ntt_protected semantics; native)."""
    out = (ctypes.c_longlong * 6)()
    _lib().three_stage_mc(trials, S, P, W, FAULT_IDS[ftype], seed, out)
    inj = [out[i] for i in range(3)]
    und = [out[3 + i] for i in range(3)]
    return {
        "injected": inj,
        "undetected": und,
        "collision_prob": [u / i if i else 0.0 for u, i in zip(und, inj)],
    }
