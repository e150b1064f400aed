"""Golden reference models (exact Python integers, host only).

Used exclusively by tests and campaign validation as the bit-exact oracle
against which every device kernel is checked — playing the role of the
reference's self-testing mains (SURVEY.md §4: ntt.py:111-119,
four_step_ntt_prot.py:201-251, baseConv.py:90-96).
"""
from .ntt import (  # noqa: F401
    ntt,
    intt,
    ntt_direct,
    four_step_ntt,
    negacyclic_ntt,
    negacyclic_intt,
    poly_mul_negacyclic,
    poly_mul_negacyclic_naive,
)
from .reduction import barrett_reduce, montgomery_reduce, fold_mod, fold_mod_2s1  # noqa: F401
from .baseconv import base_conv  # noqa: F401
