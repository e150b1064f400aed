"""L3: ABFT detector library."""
from .fold import fold_u32, fold_u64, fold_2s1_u32, fold_2s1_u64  # noqa: F401
from .checks import (  # noqa: F401
    matmul_check,
    elementwise_fold_check,
    stage1_projection_check,
    stage2_projection_check,
    twiddle_inter_check,
    twiddle_collision_model,
    intra_fold_product_check,
    barrett_range_protected,
    baseconv_append_checksum,
    baseconv_ecc_check,
)
