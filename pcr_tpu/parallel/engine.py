"""
ShardedTpuEngine — multi-chip device state behind the Pipeline API.

Mirrors the single-device ``TpuEngine`` surface (prepare_*/commit/
fetch_state/load_state/finalize_band/block_until_ready) so ``Pipeline``
can run its full create → ingest → resume → finalize → GeoTIFF lifecycle
(reference lifecycle: src/engine/pipeline.cpp:31-1403) over a
``jax.sharding.Mesh`` instead of one chip:

  * per-reduction state lives sharded ``P('sp', None)`` — row blocks over
    the spatial axis, replicated over the data axis;
  * each ingest chunk is dp-sharded over points and committed through the
    shard_map steps in ``parallel.sharding`` (psum/pmax/lexicographic
    merges over ICI);
  * finalize runs on-device over the sharded state and fetches one band.

Host inputs are padded to a bounded ladder of lengths (powers of two of a
dp-divisible quantum) so the jit cache stays small; padding entries are
in-band inert (valid=False, empty rect intervals).
"""

from __future__ import annotations

import numpy as np

from ..core.types import ReductionType
from ..ops.reduction import FLT_MAX
from . import sharding

__all__ = ["ShardedTpuEngine", "resolve_mesh_devices"]


def resolve_mesh_devices(mesh_devices, platform=None):
    """Normalize a PipelineConfig mesh_devices value to a device list.

    Accepts None (single-device: caller should not build this engine),
    an int (take that many from jax.devices(), preferring the requested
    platform), or an explicit device list."""
    import jax
    if mesh_devices is None:
        return None
    if isinstance(mesh_devices, int):
        if platform is not None:
            try:
                devs = jax.devices(platform)
            except RuntimeError:
                devs = jax.devices()
        else:
            devs = jax.devices()
        if len(devs) < mesh_devices:
            raise ValueError(
                f"mesh_devices={mesh_devices} but only {len(devs)} "
                f"devices available")
        return devs[:mesh_devices]
    return list(mesh_devices)


def _pad_len(n: int, quantum: int) -> int:
    """Next padded length: quantum * 2^k (bounded jit-signature ladder)."""
    m = max(1, -(-n // quantum))
    return quantum * (1 << (m - 1).bit_length())


def _pad(arr, length, fill):
    a = np.asarray(arr)
    if len(a) == length:
        return a
    out = np.full(length, fill, dtype=a.dtype)
    out[: len(a)] = a
    return out


class _Staged:
    """One mesh-sharded staged chunk: the jit key, the sharded input
    arrays, and a zero-arg builder for the step function."""

    __slots__ = ("key", "arrays", "builder", "npoints")

    def __init__(self, key, arrays, builder, npoints):
        self.key = key
        self.arrays = arrays
        self.builder = builder
        self.npoints = npoints


class ShardedTpuEngine:
    """Multi-chip accumulation engine for one Pipeline run (see module
    docstring). Drop-in for ``TpuEngine`` from the Pipeline's viewpoint."""

    def __init__(self, cfg, plans, mesh=None, devices=None,
                 dp: int | None = None, sp: int | None = None,
                 block: int = 1024):
        import jax
        from ..engine.tpu_backend import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        self.plans = plans
        self.block = block
        if mesh is None:
            mesh = sharding.make_mesh(devices, dp=dp, sp=sp)
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        self.sp = mesh.shape["sp"]
        self.H = cfg.height
        self.W = cfg.width
        # Row-pad so the sp axis divides the state evenly; pad rows are
        # outside every tile and sliced off on fetch.
        self.H_pad = self.sp * (-(-self.H // self.sp))
        self._states = []
        self._jits = {}
        for spec, info in plans:
            fields = info.init_state((self.H_pad, self.W))
            self._states.append(
                sharding.replicate_state(mesh, fields, self.H_pad, self.W))

    # -- state access -------------------------------------------------------

    def load_state(self, spec_idx: int, fields_hw) -> None:
        _, info = self.plans[spec_idx]
        padded = []
        for fi, f in enumerate(fields_hw):
            a = np.full((self.H_pad, self.W), info.identity[fi], np.float32)
            a[: self.H] = np.asarray(f, np.float32)
            padded.append(a)
        self._states[spec_idx] = sharding.replicate_state(
            self.mesh, padded, self.H_pad, self.W)

    def fetch_state(self, spec_idx: int):
        return [np.asarray(f)[: self.H] for f in self._states[spec_idx]]

    def finalize_band(self, spec_idx: int) -> np.ndarray:
        import jax
        _, info = self.plans[spec_idx]
        key = ("finalize", spec_idx)
        fn = self._jits.get(key)
        if fn is None:
            fn = jax.jit(lambda st: info.finalize_arrays(list(st)))
            self._jits[key] = fn
        return np.asarray(fn(self._states[spec_idx]))[: self.H]

    def block_until_ready(self):
        import jax
        for st in self._states:
            jax.block_until_ready(st)

    # -- staging --------------------------------------------------------------

    def _shard(self, *arrays):
        return sharding.shard_points(self.mesh, *arrays)

    def prepare_point(self, spec_idx: int, cells, valid, values,
                      weights=None, timestamps=None):
        _, info = self.plans[spec_idx]
        n = len(cells)
        L = _pad_len(n, self.dp * 1024)
        cells = np.asarray(cells, np.int64)
        rows = _pad((cells // self.W).astype(np.int32), L, 0)
        cols = _pad((cells % self.W).astype(np.int32), L, 0)
        valid = _pad(np.asarray(valid, bool), L, False)
        values = _pad(np.asarray(values, np.float32), L, 0.0)
        weights = _pad(
            np.asarray(weights, np.float32) if weights is not None
            else np.ones(n, np.float32), L, 1.0)
        timestamps = _pad(
            np.asarray(timestamps, np.float32) if timestamps is not None
            else np.full(n, -FLT_MAX, np.float32), L, -FLT_MAX)
        key = ("point", spec_idx, L)
        builder = (lambda info=info: sharding.sharded_point_step(
            info, self.H_pad, self.W, self.mesh))
        arrays = self._shard(rows, cols, valid, values, weights, timestamps)
        return [_Staged(key, arrays, builder, int(np.count_nonzero(valid)))]

    def prepare_gaussian(self, spec_idx: int, gp, valid, values):
        _, info = self.plans[spec_idx]
        n = len(values)
        valid = np.asarray(valid, bool)
        values = np.asarray(values, np.float32)
        if gp.rotated:
            L = _pad_len(n, self.dp * 1024)
            rmax = int(np.where(valid, gp.r, 0).max()) if n else 0
            arrays = self._shard(
                _pad(gp.icx, L, 0), _pad(gp.icy, L, 0),
                _pad(gp.sub_cx, L, 0.0), _pad(gp.sub_cy, L, 0.0),
                _pad(gp.sx, L, 1.0), _pad(gp.sy, L, 1.0),
                _pad(gp.cos_rot, L, 1.0), _pad(gp.sin_rot, L, 0.0),
                _pad(gp.r, L, -1), _pad(valid, L, False),
                _pad(values, L, 0.0))
            key = ("gauss_rot", spec_idx, L, rmax)
            builder = (lambda info=info, rmax=rmax:
                       sharding.sharded_gaussian_rotated_step(
                           info, self.H_pad, self.W, self.mesh, rmax,
                           cfg=self.cfg))
            return [_Staged(key, arrays, builder, n)]
        L = _pad_len(n, self.dp * self.block)
        arrays = self._shard(
            _pad(gp.icx, L, 0), _pad(gp.icy, L, 0),
            _pad(gp.sub_cx, L, 0.0), _pad(gp.sub_cy, L, 0.0),
            _pad(gp.sx, L, 1.0), _pad(gp.sy, L, 1.0),
            _pad(gp.r, L, -1), _pad(valid, L, False),
            _pad(values, L, 0.0))
        key = ("gauss", spec_idx, L)
        builder = (lambda info=info: sharding.sharded_gaussian_step(
            info, self.H_pad, self.W, self.mesh, block=self.block,
            cfg=self.cfg))
        return [_Staged(key, arrays, builder, n)]

    def prepare_line(self, spec_idx: int, lp, valid, values, col, row):
        from ..engine import routing
        _, info = self.plans[spec_idx]
        values = np.asarray(values, np.float32)
        rects = routing.line_rects(lp, self.cfg, np.asarray(valid, bool),
                                   col, row)
        m = len(rects.ax)
        L = _pad_len(m, self.dp * self.block)
        # pad fill makes an empty interval (ax=1 > bx=0): inert, no mask
        arrays = self._shard(
            _pad(rects.ax, L, 1), _pad(rects.bx, L, 0),
            _pad(rects.ay, L, 1), _pad(rects.by, L, 0),
            _pad(np.ones(m, bool), L, False),
            _pad(values[rects.owner], L, 0.0))
        key = ("line", spec_idx, L)
        builder = (lambda info=info: sharding.sharded_line_step(
            info, self.H_pad, self.W, self.mesh, block=self.block))
        return [_Staged(key, arrays, builder, len(lp.ix0))]

    # -- commit -----------------------------------------------------------------

    def commit(self, spec_idx: int, staged) -> None:
        for chunk in staged:
            fn = self._jits.get(chunk.key)
            if fn is None:
                fn = chunk.builder()
                self._jits[chunk.key] = fn
            self._states[spec_idx] = fn(self._states[spec_idx],
                                        *chunk.arrays)

    # -- one-shot ingest ----------------------------------------------------------

    def ingest_point(self, spec_idx, cells, valid, values,
                     weights=None, timestamps=None) -> None:
        self.commit(spec_idx, self.prepare_point(
            spec_idx, cells, valid, values, weights, timestamps))

    def ingest_gaussian(self, spec_idx, gp, valid, values) -> None:
        self.commit(spec_idx, self.prepare_gaussian(
            spec_idx, gp, valid, values))

    def ingest_line(self, spec_idx, lp, valid, values, col, row) -> None:
        self.commit(spec_idx, self.prepare_line(
            spec_idx, lp, valid, values, col, row))
