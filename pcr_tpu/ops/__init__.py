from .reduction import (  # noqa: F401
    FLT_MAX, ReductionInfo, ReductionOp, get_reduction_info, is_registered,
    registered_reductions,
)
