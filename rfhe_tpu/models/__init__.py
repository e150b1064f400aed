"""End-to-end encrypted workloads (dotprod, BSGS matvec, linear layers)."""
from .dotprod import dot_product_ckks, dot_product_bgv  # noqa: F401
from .bsgs import pack_diagonals, matvec_naive, matvec_bsgs  # noqa: F401
