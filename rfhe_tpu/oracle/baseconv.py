"""Golden RNS base conversion (Python ints).

Matches the reference's unreduced CRT interpolation (baseConv.py:10-40):
    y[i][k] = sum_j r_j[i] * ((hat_p_j * inv_hat_p_j) mod q_k)
(note: deliberately NOT reduced mod q_k, matching the reference, so the
appended-checksum ECC equality holds over the integers).
"""
from __future__ import annotations

from typing import List, Sequence

from ..numth import base_conv_matrix


def base_conv(
    residues: Sequence[Sequence[int]],
    moduli_in: Sequence[int],
    moduli_out: Sequence[int],
    reduce_out: bool = True,
) -> List[List[int]]:
    """residues[j][i]: residue of element i mod p_j.  Returns y[i][k]."""
    m = len(moduli_in)
    n = len(residues[0])
    W = base_conv_matrix(moduli_in, moduli_out)  # W[j][k]
    out: List[List[int]] = []
    for i in range(n):
        row = []
        for k, qk in enumerate(moduli_out):
            tot = sum(int(residues[j][i]) * W[j][k] for j in range(m))
            row.append(tot % qk if reduce_out else tot)
        out.append(row)
    return out
