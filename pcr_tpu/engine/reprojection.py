"""
CRS reprojection — intentionally a stub, matching the reference.

The reference declares `target_crs` / `auto_reproject` in PipelineConfig
(pipeline.h:63-65) but its reprojection implementation is an empty stub
(src/engine/reprojection.cpp:1-11) and the config fields are never read
(SURVEY.md §2.3). This module keeps the same surface with an explicit
NotImplemented status so callers get a typed error instead of silence.

Planned TPU design (future round): pre-transform x/y on the host in f64
(pure numpy implementations of the common conformal projections:
UTM <-> geographic, Web Mercator), then route as usual — reprojection is
per-point math that composes with the existing assign pass.
"""

from __future__ import annotations

from ..core.types import CRS, Status, StatusCode

__all__ = ["reproject_points"]


def reproject_points(x, y, src: CRS, dst: CRS):
    """Returns (x', y', Status). Identity when the CRSs are equivalent;
    NotImplemented otherwise (reference parity: reprojection.cpp stub)."""
    if src.equivalent_to(dst):
        return x, y, Status.success()
    return None, None, Status.error(
        StatusCode.NotImplemented,
        "reprojection is not implemented (matching the reference's stub); "
        "pre-transform coordinates before ingest")
