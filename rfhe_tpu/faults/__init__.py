"""L5: fault injection + Monte-Carlo campaign harness."""
from .inject import (  # noqa: F401
    inject_sbf,
    inject_dbf,
    inject_mbu,
    inject_mof1,
    inject_cte,
    inject_cle_matrix,
    inject_cle_vector,
    inject_kind,
)
