"""
Grid state merge — init / merge / finalize of reduction state buffers.

Rebuild of the reference's grid_merge component (include/pcr/engine/
grid_merge.h:22-41, src/engine/grid_merge.cu:16-183): element-wise
operations over band-sequential state buffers, used for combining
independently accumulated state (chunked runs, multiple collections,
multi-chip partials). Works on host numpy arrays or device jax.Arrays
(the ReductionInfo vectorized plans dispatch on array type).

Because every registered op's merge is associative and commutative
(builtin_ops.h merge functions), merging is order-free — the same property
the multi-chip psum tree relies on (parallel/sharding.py).
"""

from __future__ import annotations

import numpy as np

from ..core.types import ReductionType, Status
from ..ops.reduction import get_reduction_info

__all__ = ["init_state", "merge_state", "finalize_state"]


def init_state(rtype: ReductionType, shape):
    """Fresh identity-filled state fields (list of float32 arrays)
    (reference: grid_merge.h init_grid_state)."""
    info = get_reduction_info(rtype)
    if info is None:
        raise ValueError(f"unregistered reduction {rtype}")
    return info.init_state(shape)


def merge_state(rtype: ReductionType, dst, src):
    """Merge src state into dst state element-wise; returns the merged
    fields (reference: grid_merge.h merge_grid_state). dst/src are lists of
    per-field arrays of equal shape."""
    info = get_reduction_info(rtype)
    if info is None:
        raise ValueError(f"unregistered reduction {rtype}")
    if len(dst) != info.state_floats or len(src) != info.state_floats:
        raise ValueError(
            f"state_floats mismatch: expected {info.state_floats}, "
            f"got dst={len(dst)} src={len(src)}")
    for a, b in zip(dst, src):
        if np.shape(a) != np.shape(b):
            raise ValueError("state shape mismatch")
    return info.merge_arrays(list(dst), list(src))


def finalize_state(rtype: ReductionType, state):
    """Convert state fields to output values (empty cells → NaN)
    (reference: grid_merge.h finalize_grid_state)."""
    info = get_reduction_info(rtype)
    if info is None:
        raise ValueError(f"unregistered reduction {rtype}")
    return info.finalize_arrays(list(state))
