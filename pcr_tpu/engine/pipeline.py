"""
Pipeline — the main orchestration entry point.

TPU-native rebuild of the reference Pipeline
(include/pcr/engine/pipeline.h:49-145, src/engine/pipeline.cpp:31-1403):
same config surface, ingest/finalize/run lifecycle, per-reduction output
bands, progress/cancel callback, GPU→CPU fallback ladder, and tile-state
checkpointing via PCRT files.

Execution modes:
  * CPU    — vectorized numpy oracle path (engine/cpu_backend.py).
  * GPU    — the JAX/XLA TPU path (engine/tpu_backend.py). Name kept for
             API compatibility; `ExecutionMode.TPU` is an alias.
  * Auto   — TPU if a device is available, else CPU.
  * Hybrid — host routing + device accumulation. On TPU this is the *same
             architecture* as GPU mode (the host always does f64 routing;
             JAX async dispatch overlaps host prep of chunk i+1 with device
             compute of chunk i), so Hybrid aliases the GPU path
             (reference: pipeline.cpp:785-1152 hand-builds this overlap).

Differences from the reference, by design:
  * Multi-reduction ingest shares one world→cell assignment per cloud
    instead of re-routing per reduction (pipeline.cpp:360-743 re-sorts per
    reduction) — identical semantics, less work.
  * Accumulation is deterministic (sort/scatter, no float atomics).
  * Tile state files are written under a per-reduction subdirectory
    `red{i}_{type}` — the reference writes all reductions' tiles into one
    directory with colliding filenames (pipeline.cpp:236 +
    tile_state_io.cpp:197-210), which corrupts multi-reduction resume.
"""

from __future__ import annotations

import enum
import os
import time
import warnings
from dataclasses import dataclass, field as dc_field

import numpy as np

from ..core.grid import BandDesc, Grid
from ..core.grid_config import GridConfig
from ..core.point_cloud import PointCloud
from ..core.types import (
    CRS, DataType, MemoryLocation, PcrError, ReductionType, Status,
    StatusCode, TileIndex, tpu_device_available,
)
from ..io import tile_state_io
from ..ops.reduction import get_reduction_info
from . import cpu_backend as cpu
from . import routing
from .filter import FilterSpec, evaluate_filter_mask
from .glyph import GLYPH_SUPPORTED_REDUCTIONS, GlyphSpec, GlyphType

__all__ = ["ExecutionMode", "ReductionSpec", "PipelineConfig",
           "ProgressInfo", "Pipeline"]


class ExecutionMode(enum.IntEnum):
    CPU = 0
    GPU = 1      # the accelerator path; on this framework that is the TPU
    Auto = 2
    Hybrid = 3


ExecutionMode.TPU = ExecutionMode.GPU  # type: ignore[attr-defined]


@dataclass
class ReductionSpec:
    """What to reduce and how (reference: pipeline.h:20-34)."""
    value_channel: str = ""
    type: ReductionType = ReductionType.Sum
    weight_channel: str = ""       # for WeightedAverage
    timestamp_channel: str = ""    # for MostRecent
    priority_channel: str = ""     # for PriorityMerge
    percentile: float = 0.5        # for Percentile (not yet registered)
    output_band_name: str = ""
    glyph: GlyphSpec = dc_field(default_factory=GlyphSpec)


@dataclass
class PipelineConfig:
    """Full configuration for a processing run (reference: pipeline.h:49-86)."""
    grid: GridConfig = dc_field(default_factory=GridConfig)
    reductions: list = dc_field(default_factory=list)
    filter: FilterSpec = dc_field(default_factory=FilterSpec)

    # CRS handling
    target_crs: CRS = dc_field(default_factory=CRS)
    auto_reproject: bool = True

    exec_mode: ExecutionMode = ExecutionMode.Auto

    # Memory budget
    gpu_memory_budget: int = 0
    host_cache_budget: int = 0
    chunk_size: int = 0            # points per device chunk, 0 = auto

    # Accelerator configuration (names kept for reference compatibility,
    # pipeline.h:49-86)
    gpu_pool_size_bytes: int = 512 * 1024 * 1024
    # ^ COMPAT-ONLY, ignored: XLA owns device memory on TPU; there is no
    #   user-sized arena. Budget-driven behaviour lives in
    #   gpu_memory_budget (out-of-core banding) instead.
    cuda_device_id: int = 0        # TPU device index here
    use_cuda_streams: bool = True
    # ^ COMPAT-ONLY, ignored: JAX dispatch is always asynchronous; there
    #   is no stream on/off switch to honor.
    gpu_fallback_to_cpu: bool = True
    gpu_require_strict: bool = False

    # CPU threading
    cpu_threads: int = 0
    # ^ COMPAT-ONLY, ignored: the CPU oracle path is vectorized numpy
    #   (single-threaded by design for determinism); the reference's
    #   OpenMP thread count has no analogue here.
    hybrid_cpu_threads: int = 0
    # ^ Hybrid prep-worker count. 0 = auto: 2 overlap workers on
    #   multi-core hosts, serial prep on 1-2 core hosts (where thread
    #   contention loses to the transfer layer's own async overlap).
    #   1 forces serial, >=2 forces that many overlap workers.

    # Multi-chip scale-out (TPU-native extension; the reference is
    # single-device). Any of these engages the ShardedTpuEngine: state is
    # sharded P('sp', None) over a ('dp', 'sp') jax.sharding.Mesh and every
    # ingest merges over ICI collectives (parallel/sharding.py).
    mesh_devices: object = None   # None | int (count) | list of jax devices
    mesh_dp: int = 0              # data-parallel axis size (0 = auto)
    mesh_sp: int = 0              # spatial (grid-row) axis size (0 = auto)

    # State persistence
    state_dir: str = ""
    resume: bool = False

    # GeoTIFF output
    output_path: str = ""
    write_cog: bool = False


@dataclass
class ProgressInfo:
    collections_processed: int = 0
    collections_total: int = 0     # 0 if unknown (streaming mode)
    points_processed: int = 0
    tiles_active: int = 0
    elapsed_seconds: float = 0.0


@dataclass
class StagedCloud:
    """A routed point cloud staged in device HBM (see Pipeline.stage)."""
    per_spec: list           # per ReductionSpec: list[StagedChunk]
    n_valid: int
    col: np.ndarray          # valid points' assigned cells (for tile stats)
    row: np.ndarray
    tiles: frozenset = frozenset()   # touched (trow, tcol), precomputed at
                                     # stage() time so ingest stays O(1) host


def _ch(cloud, name, sel):
    """Sliced optional glyph channel."""
    arr = routing.glyph_channel(cloud, name)
    return arr[sel] if arr is not None else None


def _force_jax() -> bool:
    """Test hook: treat the default JAX device (even CPU) as an accelerator,
    so the device code path can be exercised without TPU hardware."""
    return os.environ.get("PCR_FORCE_JAX", "") == "1"


class Pipeline:
    """Create with `Pipeline.create(config)`, then `ingest(cloud)` one or
    more times, then `finalize()`; read back via `result()`."""

    def __init__(self, config: PipelineConfig, backend: str):
        self.config = config
        self._backend = backend           # 'cpu' | 'jax'
        self._plans = []                  # list of (spec, info)
        self._host_state = []             # CPU mode: per spec list[(H,W)]
        self._managers = []               # CPU out-of-core: TileManager/spec
        self._collect = {}                # order-statistics specs: spec idx
                                          #   -> CollectStream (spill-backed)
        self._tiled = False
        self._engine = None               # jax mode: TpuEngine
        self._result: Grid | None = None
        self._finalized = False
        self._cancelled = False
        self._progress_cb = None
        self._collections = 0
        self._points = 0
        self._start = time.perf_counter()
        self._touched_tiles: set = set()
        self._device_cloud_cache: dict = {}  # id(cloud) -> (weakref, StagedCloud)

    # -- construction --------------------------------------------------------

    @staticmethod
    def create(config: PipelineConfig) -> "Pipeline":
        st = Pipeline._validate_config(config)
        if not st.ok():
            raise PcrError(st)
        # Cap the native OpenMP kernels' thread count (reference:
        # omp_set_num_threads, pipeline.cpp:94-98); results are
        # thread-count-invariant (test_determinism), this only bounds
        # CPU usage. The cap is process-global (as in the reference),
        # so a default config (cpu_threads=0) RESTORES the runtime
        # default rather than inheriting a previous pipeline's cap.
        from .. import native
        native.set_num_threads(config.cpu_threads or 0)
        backend = Pipeline._resolve_backend(config)
        p = Pipeline(config, backend)
        for spec in config.reductions:
            info = get_reduction_info(spec.type)
            if info is None:
                raise PcrError(Status.error(
                    StatusCode.InvalidArgument,
                    f"pipeline: unregistered reduction type "
                    f"{ReductionType(spec.type).name}"))
            gt = GlyphType(spec.glyph.type)
            if (gt != GlyphType.Point
                    and ReductionType(spec.type) not in GLYPH_SUPPORTED_REDUCTIONS):
                raise PcrError(Status.error(
                    StatusCode.NotImplemented,
                    "glyph splatting only supports WeightedAverage, Average, "
                    "Sum, or Count reduction types"))
            p._plans.append((spec, info))
            if info.scatter_kind == "collect":
                from .collect_spill import CollectStream
                p._collect[len(p._plans) - 1] = CollectStream(
                    spill_dir=config.state_dir or None)
        p._init_state()
        p._load_existing_state()
        return p

    @staticmethod
    def _validate_config(config: PipelineConfig) -> Status:
        st = config.grid.validate()
        if not st.ok():
            return st
        if not config.reductions:
            return Status.error(StatusCode.InvalidArgument,
                                "pipeline: no reductions configured")
        return Status.success()

    @staticmethod
    def _resolve_backend(config: PipelineConfig) -> str:
        mode = ExecutionMode(config.exec_mode)
        if mode == ExecutionMode.CPU:
            # never probe the accelerator for a pure-CPU pipeline (a
            # wedged tunnel would stall create by the probe timeout)
            return "cpu"
        accel = tpu_device_available() or _force_jax()
        if mode == ExecutionMode.Auto:
            return "jax" if accel else "cpu"
        # GPU / Hybrid: the fallback ladder (reference: pipeline.cpp:113-214)
        if accel:
            return "jax"
        if config.gpu_require_strict:
            raise PcrError(Status.error(
                StatusCode.TpuError,
                "pipeline: TPU required (strict mode) but no device available"))
        if config.gpu_fallback_to_cpu:
            warnings.warn("pcr_tpu: no TPU device available, "
                          "falling back to CPU execution")
            return "cpu"
        raise PcrError(Status.error(
            StatusCode.TpuError,
            "pipeline: no TPU device available and fallback disabled"))

    def _init_state(self):
        cfg = self.config.grid
        if self._backend == "cpu":
            # Out-of-core: when the full-grid state would exceed the host
            # cache budget, switch to per-tile state via the TileManager
            # (LRU cache + PCRT spill, reference: tile_manager.cpp).
            budget = self.config.host_cache_budget
            state_bytes = sum(
                info.state_floats * cfg.total_cells() * 4
                for _, info in self._plans)
            self._tiled = bool(budget and state_bytes > budget)
            if self._tiled:
                from .tile_manager import TileManager, TileManagerConfig
                for i, (spec, info) in enumerate(self._plans):
                    self._managers.append(TileManager.create(
                        TileManagerConfig(
                            state_dir=self._state_dir_for(i),
                            cache_size_bytes=max(
                                budget // len(self._plans), 1 << 20),
                            state_floats=info.state_floats,
                            reduction_type=ReductionType(spec.type),
                            grid_config=cfg)))
            else:
                for spec, info in self._plans:
                    self._host_state.append(
                        info.init_state((cfg.height, cfg.width)))
        else:
            self._tiled = False
            import jax
            if (self.config.mesh_devices is not None
                    or self.config.mesh_dp > 1 or self.config.mesh_sp > 1):
                if self.config.gpu_memory_budget:
                    # The banded out-of-core executor's band frames are
                    # whole-grid/tile aligned and incompatible with
                    # per-shard row views; refusing loudly beats the old
                    # warn-and-ignore (state IS already 1/shards-sharded
                    # per chip, so raise mesh_sp / shard count instead).
                    raise PcrError(Status.error(
                        StatusCode.InvalidArgument,
                        "pipeline: gpu_memory_budget is not supported "
                        "together with a device mesh — the state is "
                        "already sharded 1/N per chip; raise mesh_sp (or "
                        "the device count) to shrink per-chip state, or "
                        "drop the mesh to use banded out-of-core"))
                from ..parallel.engine import (
                    PartitionedTpuEngine, ShardedTpuEngine,
                    resolve_mesh_devices)
                devs = resolve_mesh_devices(self.config.mesh_devices)
                dp = self.config.mesh_dp or None
                sp = self.config.mesh_sp or None
                if devs is None:
                    n = ((dp or 1) * (sp or 1)
                         if (dp or sp) else len(jax.devices()))
                    devs = jax.devices()[:n] if (dp and sp) else jax.devices()
                if cfg.total_tiles() > 1:
                    # Multi-tile grids: per-shard home-tile clip offsets
                    # are trace-time constants, so each device runs its
                    # own single-chip program over its row shard (see
                    # PartitionedTpuEngine docstring). All dp*sp devices
                    # serve as row shards.
                    self._engine = PartitionedTpuEngine(
                        cfg, self._plans, devices=devs)
                else:
                    self._engine = ShardedTpuEngine(
                        cfg, self._plans, devices=devs, dp=dp, sp=sp)
            else:
                from .tpu_backend import TpuEngine
                devs = jax.devices()
                idx = min(self.config.cuda_device_id, len(devs) - 1)
                # Out-of-core: when the state exceeds gpu_memory_budget,
                # accumulate in host-resident row bands with a band-swapped
                # device executor (reference: tile_manager.cpp:183-414).
                budget = self.config.gpu_memory_budget
                if budget:
                    from .out_of_core import (
                        OutOfCoreTpuEngine, pick_band_rows)
                    band = pick_band_rows(cfg, self._plans, budget)
                    if band:
                        self._engine = OutOfCoreTpuEngine(
                            cfg, self._plans, band, device=devs[idx])
                        return
                self._engine = TpuEngine(cfg, self._plans, device=devs[idx])

    # -- state persistence ------------------------------------------------------

    def _state_dir_for(self, spec_idx: int) -> str:
        base = self.config.state_dir or "/tmp/pcr_tiles"
        spec, _ = self._plans[spec_idx]
        return os.path.join(base, f"red{spec_idx}_{int(spec.type)}")

    def _load_existing_state(self):
        """Resume: load any existing PCRT tile files (the reference's
        TileManager loads existing files implicitly on acquire,
        tile_manager.cpp:272-302 — the `resume` flag is declared but never
        read there; we honor the same implicit behaviour)."""
        cfg = self.config.grid
        if self._tiled:
            # TileManager loads existing PCRT files lazily on acquire;
            # just record which tiles already have state.
            for trow in range(cfg.tiles_y):
                for tcol in range(cfg.tiles_x):
                    if self._managers[0].tile_has_state(
                            TileIndex(row=trow, col=tcol)):
                        self._touched_tiles.add((trow, tcol))
            return
        for i, (spec, info) in enumerate(self._plans):
            d = self._state_dir_for(i)
            if not os.path.isdir(d):
                continue
            fields = (self._host_state[i] if self._backend == "cpu"
                      else [f.copy() for f in self._engine.fetch_state(i)])
            loaded = False
            for trow in range(cfg.tiles_y):
                for tcol in range(cfg.tiles_x):
                    tile = TileIndex(row=trow, col=tcol)
                    path = tile_state_io.tile_state_filename(d, tile)
                    if not os.path.exists(path):
                        continue
                    out, st = tile_state_io.read_tile_state(path)
                    if not st.ok():
                        # corrupt/mismatched state: reinitialize to identity
                        # (reference: tile_manager.cpp:280-320)
                        continue
                    t, cols, rows, sf, rtype = out[:5]
                    state = out[5]
                    cs, rs, cc, rc = cfg.tile_cell_range(tile)
                    if (cols != cc or rows != rc or sf != info.state_floats
                            or ReductionType(rtype) != ReductionType(spec.type)):
                        continue
                    body = state.reshape(sf, rows, cols)
                    for f in range(sf):
                        fields[f][rs:rs + rc, cs:cs + cc] = body[f]
                    loaded = True
                    self._touched_tiles.add((trow, tcol))
            if loaded and self._backend == "jax":
                self._engine.load_state(i, fields)

    def _flush_state(self):
        """Write every touched tile's state as a PCRT file (flush_all,
        reference: tile_manager.cpp:416-426 + pipeline.cpp:1166-1172)."""
        cfg = self.config.grid
        if self._tiled:
            for mgr in self._managers:
                st = mgr.flush_all()
                if not st.ok():
                    raise PcrError(st)
            return
        for i, (spec, info) in enumerate(self._plans):
            if info.scatter_kind == "collect":
                # order statistics keep the raw stream, not K-float tile
                # state; PCRT checkpointing does not apply
                continue
            fields = (self._host_state[i] if self._backend == "cpu"
                      else self._engine.fetch_state(i))
            self._write_state_tiles(i, fields)

    def _write_state_tiles(self, i, fields):
        """Write touched tiles' PCRT files from host (H, W) state fields
        (flush_all, tile_manager.cpp:416-426)."""
        cfg = self.config.grid
        spec, info = self._plans[i]
        d = self._state_dir_for(i)
        os.makedirs(d, exist_ok=True)
        # only tiles with state are flushed (tile_manager.cpp:416-426)
        for (trow, tcol) in sorted(self._touched_tiles):
            tile = TileIndex(row=trow, col=tcol)
            cs, rs, cc, rc = cfg.tile_cell_range(tile)
            body = np.stack([f[rs:rs + rc, cs:cs + cc] for f in fields])
            st = tile_state_io.write_tile_state(
                tile_state_io.tile_state_filename(d, tile),
                tile, cc, rc, info.state_floats, spec.type, body)
            if not st.ok():
                raise PcrError(st)

    # -- validation -------------------------------------------------------------

    def validate(self) -> None:
        st = Pipeline._validate_config(self.config)
        if not st.ok():
            raise PcrError(st)

    # -- ingest -----------------------------------------------------------------

    def stage(self, cloud: PointCloud) -> "StagedCloud":
        """Route a cloud on the host and stage its packed chunks in device
        HBM without running the accumulation compute.

        This is the analogue of the reference's Device-resident clouds
        ("GPU-Device" mode, docs/BENCHMARK_RESULTS.md:28-42): a subsequent
        `ingest(staged)` is pure device compute. Only available on the
        accelerator backend."""
        if self._backend != "jax":
            raise PcrError(Status.error(
                StatusCode.InvalidArgument,
                "stage() requires the accelerator backend"))
        x = cloud.x_array()
        y = cloud.y_array()
        keep = (evaluate_filter_mask(cloud, self.config.filter)
                if not self.config.filter.empty() else None)
        col, row, valid = routing.assign(self.config.grid, x, y)
        if keep is not None:
            valid = valid & keep
        per_spec = []
        for i, (spec, info) in enumerate(self._plans):
            n = cloud.count()
            values = self._values_for(spec, cloud, n)
            if info.scatter_kind == "collect":
                flat = (row[valid].astype(np.int64)
                        * self.config.grid.width
                        + col[valid].astype(np.int64))
                per_spec.append(("collect", flat,
                                 np.asarray(values, np.float32)[valid]))
                continue
            weights, timestamps = self._aux_channels(spec, info, cloud, n)
            gt = GlyphType(spec.glyph.type)
            per_spec.append(self._prepare_jax(
                i, spec, info, gt, cloud, x, y, col, row, valid,
                values, weights, timestamps))
        vc, vr = col[valid], row[valid]
        return StagedCloud(per_spec=per_spec,
                           n_valid=int(np.count_nonzero(valid)),
                           col=vc, row=vr,
                           tiles=frozenset(self._tiles_of(col, row, valid)))

    def ingest(self, cloud) -> None:
        """Process one point-cloud collection (PointCloud or StagedCloud).
        Can be called repeatedly.

        Raises PcrError on invalid input or user cancellation
        (reference: pipeline.cpp:283-770).
        """
        if self._cancelled:
            raise PcrError(Status.error(StatusCode.InvalidArgument,
                                        "pipeline: cancelled by user"))
        # Device-located clouds (cloud.to_device(), the reference's
        # GPU-Device idiom — benchmark_cpu_gpu.py:55) are staged once per
        # pipeline and every subsequent ingest is pure device compute,
        # matching the reference's device-resident semantics.
        if (self._backend == "jax" and not isinstance(cloud, StagedCloud)
                and hasattr(cloud, "location")
                and cloud.location() == MemoryLocation.Device
                and hasattr(self._engine, "prepare_point")):
            cached = self._device_cloud_cache.get(id(cloud))
            if cached is None or cached[0]() is not cloud:
                import weakref
                cached = (weakref.ref(cloud), self.stage(cloud.to_host()))
                self._device_cloud_cache[id(cloud)] = cached
            return self.ingest(cached[1])
        if isinstance(cloud, StagedCloud):
            for i in range(len(self._plans)):
                staged = cloud.per_spec[i]
                if (isinstance(staged, tuple) and staged
                        and staged[0] == "collect"):
                    self._collect[i].append(staged[1], staged[2])
                else:
                    self._engine.commit(i, staged)
            self._touched_tiles.update(cloud.tiles)
            self._points += cloud.n_valid
            self._collections += 1
            self._emit_progress()
            return
        n = cloud.count()
        x = cloud.x_array()
        y = cloud.y_array()

        # auto-reproject clouds whose CRS differs from the grid's (the
        # reference declares these config fields but never reads them,
        # pipeline.h:63-65 / SURVEY.md §2.3; native transforms here)
        if (self.config.auto_reproject and cloud.crs().is_valid()
                and self.config.grid.crs.is_valid()
                and not cloud.crs().equivalent_to(self.config.grid.crs)):
            from .reprojection import reproject_points
            x, y, st = reproject_points(x, y, cloud.crs(),
                                        self.config.grid.crs)
            if not st.ok():
                raise PcrError(st)

        # Filter (AND-combined predicates; empty spec passes all)
        if not self.config.filter.empty():
            keep = evaluate_filter_mask(cloud, self.config.filter)
        else:
            keep = None

        # One shared assignment for all reductions
        col, row, valid = routing.assign(self.config.grid, x, y)
        if keep is not None:
            valid = valid & keep

        for i, (spec, info) in enumerate(self._plans):
            self._ingest_spec(i, spec, info, cloud, x, y, col, row, valid)

        self._track_tiles(col, row, valid)
        self._points += int(np.count_nonzero(valid))
        self._collections += 1
        self._emit_progress()

    def _values_for(self, spec: ReductionSpec, cloud: PointCloud,
                    n: int) -> np.ndarray:
        if spec.value_channel and cloud.has_channel(spec.value_channel):
            return cloud.channel_array_f32(spec.value_channel)
        if ReductionType(spec.type) == ReductionType.Count:
            # Count ignores the value; allow missing channel
            return np.zeros(n, dtype=np.float32)
        raise PcrError(Status.error(
            StatusCode.InvalidArgument,
            f"pipeline: value channel {spec.value_channel!r} not found"))

    def _aux_channels(self, spec, info, cloud, n):
        """Weight/timestamp channels for ops that use them."""
        weights = None
        if info.uses_weight and spec.weight_channel:
            if not cloud.has_channel(spec.weight_channel):
                raise PcrError(Status.error(
                    StatusCode.InvalidArgument,
                    f"pipeline: weight channel {spec.weight_channel!r} "
                    f"not found"))
            weights = cloud.channel_array_f32(spec.weight_channel)
        timestamps = None
        if info.uses_timestamp:
            is_prio = ReductionType(spec.type) == ReductionType.PriorityMerge
            ch = spec.priority_channel if is_prio else spec.timestamp_channel
            if ch and cloud.has_channel(ch):
                timestamps = cloud.channel_array_f32(ch)
            elif is_prio:
                # no priority channel: every point ties, the deterministic
                # argmax keeps the first-ingested value per cell
                timestamps = np.zeros(n, dtype=np.float32)
            else:
                # Fallback: ingestion order (later collections win).
                # The reference leaves MostRecent unregistered; with no
                # timestamp the strict-> combine would never replace, so
                # ingest order is the useful interpretation.
                timestamps = np.arange(
                    self._points, self._points + n, dtype=np.float32)
        return weights, timestamps

    def _ingest_spec(self, i, spec, info, cloud, x, y, col, row, valid):
        n = cloud.count()
        values = self._values_for(spec, cloud, n)
        if info.scatter_kind == "collect":
            # Order statistics (Median/Percentile) retain the raw stream;
            # the exact quantile is computed at finalize (ops/reduction.py).
            flat = (row[valid].astype(np.int64) * self.config.grid.width
                    + col[valid].astype(np.int64))
            self._collect[i].append(
                flat, np.asarray(values, np.float32)[valid])
            return
        weights, timestamps = self._aux_channels(spec, info, cloud, n)
        gt = GlyphType(spec.glyph.type)
        if self._backend == "cpu":
            self._ingest_cpu(i, spec, info, gt, cloud, x, y, col, row, valid,
                             values, weights, timestamps)
        else:
            self._ingest_jax(i, spec, info, gt, cloud, x, y, col, row, valid,
                             values, weights, timestamps)

    # -- CPU path ---------------------------------------------------------------

    def _ingest_cpu_tiled(self, i, spec, info, gt, cloud, x, y, col, row,
                          valid, values, weights, timestamps):
        """Out-of-core CPU ingest: group points by home tile, accumulate
        into each tile's TileManager state block (acquire → accumulate →
        release), mirroring the reference's per-tile batch loop
        (pipeline.cpp:688-733)."""
        cfg = self.config.grid
        mgr = self._managers[i]
        tcol = col // cfg.tile_width
        trow = row // cfg.tile_height
        tid = trow.astype(np.int64) * cfg.tiles_x + tcol.astype(np.int64)
        tid = np.where(valid, tid, -1)
        for t in np.unique(tid):
            if t < 0:
                continue
            sel = tid == t
            tile = TileIndex(row=int(t) // cfg.tiles_x,
                             col=int(t) % cfg.tiles_x)
            cs, rs, cc, rc = cfg.tile_cell_range(tile)
            block = mgr.acquire(tile)
            state = [block[f] for f in range(info.state_floats)]
            region = (cs, rs, cc, rc)
            if gt == GlyphType.Point:
                flat = ((row[sel].astype(np.int64) - rs) * cc
                        + (col[sel].astype(np.int64) - cs))
                st = cpu.accumulate_point_cpu(
                    info, state, flat, values[sel],
                    weights[sel] if weights is not None else None,
                    timestamps[sel] if timestamps is not None else None)
            elif gt == GlyphType.Gaussian:
                st = cpu.accumulate_gaussian_cpu(
                    spec.glyph, spec.type, cfg, state, x[sel], y[sel],
                    values[sel],
                    _ch(cloud, spec.glyph.sigma_x_channel, sel),
                    _ch(cloud, spec.glyph.sigma_y_channel, sel),
                    _ch(cloud, spec.glyph.rotation_channel, sel),
                    col[sel], row[sel], region=region)
            else:   # Line
                st = cpu.accumulate_line_cpu(
                    spec.glyph, spec.type, cfg, state, x[sel], y[sel],
                    values[sel],
                    _ch(cloud, spec.glyph.direction_channel, sel),
                    _ch(cloud, spec.glyph.half_length_channel, sel),
                    col[sel], row[sel], region=region)
            mgr.release(tile)
            if not st.ok():
                raise PcrError(st)

    def _ingest_cpu(self, i, spec, info, gt, cloud, x, y, col, row, valid,
                    values, weights, timestamps):
        cfg = self.config.grid
        if self._tiled:
            return self._ingest_cpu_tiled(i, spec, info, gt, cloud, x, y,
                                          col, row, valid, values, weights,
                                          timestamps)
        state = self._host_state[i]
        v = valid
        if gt == GlyphType.Point:
            flat = (row[v].astype(np.int64) * cfg.width
                    + col[v].astype(np.int64))
            st = cpu.accumulate_point_cpu(
                info, state, flat, values[v],
                weights[v] if weights is not None else None,
                timestamps[v] if timestamps is not None else None)
        elif gt == GlyphType.Gaussian:
            st = cpu.accumulate_gaussian_cpu(
                spec.glyph, spec.type, cfg, state, x[v], y[v], values[v],
                routing.glyph_channel(cloud, spec.glyph.sigma_x_channel)[v]
                if routing.glyph_channel(cloud, spec.glyph.sigma_x_channel)
                is not None else None,
                routing.glyph_channel(cloud, spec.glyph.sigma_y_channel)[v]
                if routing.glyph_channel(cloud, spec.glyph.sigma_y_channel)
                is not None else None,
                routing.glyph_channel(cloud, spec.glyph.rotation_channel)[v]
                if routing.glyph_channel(cloud, spec.glyph.rotation_channel)
                is not None else None,
                col[v], row[v])
        elif gt == GlyphType.Line:
            st = cpu.accumulate_line_cpu(
                spec.glyph, spec.type, cfg, state, x[v], y[v], values[v],
                routing.glyph_channel(cloud, spec.glyph.direction_channel)[v]
                if routing.glyph_channel(cloud, spec.glyph.direction_channel)
                is not None else None,
                routing.glyph_channel(cloud, spec.glyph.half_length_channel)[v]
                if routing.glyph_channel(cloud, spec.glyph.half_length_channel)
                is not None else None,
                col[v], row[v])
        else:
            st = Status.error(StatusCode.NotImplemented,
                              f"unknown glyph type {gt}")
        if not st.ok():
            raise PcrError(st)

    # -- JAX path ---------------------------------------------------------------

    def _prepare_jax(self, i, spec, info, gt, cloud, x, y, col, row, valid,
                     values, weights, timestamps, wire_cheap=False):
        """Host-route one cloud for one spec and stage packed chunks on the
        device. Returns the staged chunk list (commit runs the compute).

        wire_cheap marks host-sourced ingest (the cloud crosses the
        host→device link inside the timed path), where a minimal wire
        format beats the accumulate-optimal bucketed layout. Point wires
        are exact; glyph wires quantize Gaussian sub-cell offsets to u16
        (O(1e-5) band deviation, inside the reference's 1e-4 CPU<->GPU
        bar), so they engage only in Hybrid mode — the declared
        throughput mode (pipeline.cpp:785-1152) — or with
        PCR_GLYPH_WIRE=1."""
        glyph_wire = wire_cheap and (
            ExecutionMode(self.config.exec_mode) == ExecutionMode.Hybrid
            or os.environ.get("PCR_GLYPH_WIRE", "0") == "1")
        cfg = self.config.grid
        eng = self._engine
        if gt == GlyphType.Point:
            try:
                # engines that take col/row fuse flatten+pack natively
                return eng.prepare_point(i, None, valid, values, weights,
                                         timestamps, wire_cheap=wire_cheap,
                                         col=col, row=row)
            except TypeError:
                pass
            cells = (row * np.int32(cfg.width) + col).astype(np.int32,
                                                             copy=False)
            try:
                return eng.prepare_point(i, cells, valid, values, weights,
                                         timestamps, wire_cheap=wire_cheap)
            except TypeError:   # engines without the wire_cheap knob
                return eng.prepare_point(i, cells, valid, values, weights,
                                         timestamps)
        if gt == GlyphType.Gaussian:
            sx_ch = routing.glyph_channel(cloud, spec.glyph.sigma_x_channel)
            sy_ch = routing.glyph_channel(cloud, spec.glyph.sigma_y_channel)
            rot_ch = routing.glyph_channel(cloud,
                                           spec.glyph.rotation_channel)
            if (glyph_wire and sx_ch is None and sy_ch is None
                    and rot_ch is None
                    and hasattr(eng, "prepare_gaussian_raw")):
                # uniform-shape fast path: fused native world->wire pack,
                # no per-point numpy glyph math on the (jittery) host
                staged = eng.prepare_gaussian_raw(i, spec.glyph, x, y,
                                                  valid, values)
                if staged is not None:
                    return staged
            gp = routing.gaussian_params(spec.glyph, cfg, x, y, sx_ch,
                                         sy_ch, rot_ch)
            try:
                return eng.prepare_gaussian(i, gp, valid, values,
                                            wire_cheap=glyph_wire)
            except TypeError:   # engines without the wire_cheap knob
                return eng.prepare_gaussian(i, gp, valid, values)
        if gt == GlyphType.Line:
            dir_ch = routing.glyph_channel(cloud,
                                           spec.glyph.direction_channel)
            hl_ch = routing.glyph_channel(cloud,
                                          spec.glyph.half_length_channel)
            if (glyph_wire and dir_ch is None and hl_ch is None
                    and hasattr(eng, "prepare_line_raw")):
                staged = eng.prepare_line_raw(i, spec.glyph, x, y, valid,
                                              values, col, row)
                if staged is not None:
                    return staged
            lp = routing.line_params(spec.glyph, cfg, x, y, dir_ch, hl_ch)
            try:
                return eng.prepare_line(i, lp, valid, values, col, row,
                                        wire_cheap=glyph_wire)
            except TypeError:
                return eng.prepare_line(i, lp, valid, values, col, row)
        raise PcrError(Status.error(StatusCode.NotImplemented,
                                    f"unknown glyph type {gt}"))

    def _ingest_jax(self, i, spec, info, gt, cloud, x, y, col, row, valid,
                    values, weights, timestamps):
        from .tpu_backend import CHUNK_BUCKETS, chunk_ranges
        n = len(x)
        hybrid = (ExecutionMode(self.config.exec_mode)
                  == ExecutionMode.Hybrid)
        # User-pinned device chunk size (pipeline.h:67 declares it; the
        # reference never reads it — honored here): slice the cloud and
        # commit chunk-by-chunk, hybrid or not.
        if self.config.chunk_size > 0 and n > self.config.chunk_size:
            cs = int(self.config.chunk_size)
            for a in range(0, n, cs):
                sl = slice(a, min(a + cs, n))
                staged = self._prepare_jax(
                    i, spec, info, gt, cloud, x[sl], y[sl], col[sl],
                    row[sl], valid[sl], values[sl],
                    weights[sl] if weights is not None else None,
                    timestamps[sl] if timestamps is not None else None,
                    wire_cheap=True)
                self._engine.commit(i, staged)
            return
        if not hybrid or n <= CHUNK_BUCKETS[2]:
            staged = self._prepare_jax(i, spec, info, gt, cloud, x, y, col,
                                       row, valid, values, weights,
                                       timestamps, wire_cheap=True)
            self._engine.commit(i, staged)
            return
        # Hybrid mode: pipeline host routing against device accumulation —
        # worker threads prepare (route + pack + upload) later slices while
        # the device commits earlier ones. Two workers let slice k+2's CPU
        # routing proceed while slice k+1's upload blocks on the wire (the
        # upload releases the GIL). This is the TPU-native form of the
        # reference's producer/consumer Hybrid mode (pipeline.cpp:785-1152).
        # On 1-2 core hosts the pool only adds GIL/scheduler contention —
        # device_put is already asynchronous (the transfer layer drains in
        # the background), so serial prep+commit IS overlapped with the
        # wire there.
        def prep(rng_):
            a, b = rng_
            sl = slice(a, b)
            return self._prepare_jax(
                i, spec, info, gt, cloud, x[sl], y[sl], col[sl], row[sl],
                valid[sl], values[sl],
                weights[sl] if weights is not None else None,
                timestamps[sl] if timestamps is not None else None,
                wire_cheap=True)

        # Mid-size clouds (one ladder bucket) used to ship as a single
        # chunk, serializing the whole upload before ANY device work;
        # capping at ceil(n/2) makes chunk_ranges emit SUB-BUCKET chunks
        # so chunk k's device work hides under chunk k+1's wire (round 5,
        # the 1M hybrid-efficiency item). Note the ladder rounding: the
        # cap steps DOWN to the next bucket (1M -> 4 x 262144, not 2
        # halves), which keeps wire padding bucket-aligned — the
        # measured +5-13pp gains are with exactly this behavior.
        # Gaussians are exempt: their device expand/sort amortizes
        # poorly below ~1M entries per chunk (measured 48.9 -> 41.3 % of
        # the wire ceiling when fragmented).
        cap = (-(-n // 2)
               if n <= CHUNK_BUCKETS[-1] and gt != GlyphType.Gaussian
               else None)
        ranges = chunk_ranges(n, cap)
        workers = int(self.config.hybrid_cpu_threads)
        if workers <= 0:
            workers = 2 if (os.cpu_count() or 1) >= 4 else 1
        if workers <= 1 or len(ranges) == 1:
            for r in ranges:
                self._engine.commit(i, prep(r))
            return
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [ex.submit(prep, r) for r in ranges]
            for fut in futs:
                self._engine.commit(i, fut.result())

    # -- bookkeeping -------------------------------------------------------------

    def _tiles_of(self, col, row, valid=None):
        """Exact set of (tile_row, tile_col) touched by the given cells.

        O(N) presence scan (no sort, no int64 copies) — the previous
        np.unique formulation cost ~12 s per 5M-point host ingest on a
        1-core host and dominated the wall clock."""
        cfg = self.config.grid
        ntiles = cfg.tiles_x * cfg.tiles_y
        if len(col) == 0:
            return []
        any_valid = bool(valid.any()) if valid is not None else True
        if not any_valid:
            return []
        if ntiles == 1:
            # single-tile grid (tile 4096^2 default covers most grids)
            return [(0, 0)]
        tid = ((row // np.int32(cfg.tile_height)) * np.int32(cfg.tiles_x)
               + (col // np.int32(cfg.tile_width)))
        if valid is not None:
            # route invalid entries to a scratch bin instead of a gather
            tid = np.where(valid, tid, np.int32(ntiles))
        present = np.bincount(tid.ravel(), minlength=ntiles + 1)[:ntiles]
        t = np.flatnonzero(present)
        return [(int(ti) // cfg.tiles_x, int(ti) % cfg.tiles_x) for ti in t]

    def _track_tiles(self, col, row, valid=None):
        self._touched_tiles.update(self._tiles_of(col, row, valid))

    def _emit_progress(self):
        if self._progress_cb is None:
            return
        info = self.stats()
        if not self._progress_cb(info):
            self._cancelled = True
            raise PcrError(Status.error(StatusCode.InvalidArgument,
                                        "pipeline: cancelled by user"))

    # -- finalize ----------------------------------------------------------------

    def finalize(self) -> None:
        """Flush tile state, assemble the result Grid, write GeoTIFF output
        (reference: pipeline.cpp:1154-1363)."""
        if (self._backend == "jax"
                and hasattr(self._engine, "finalize_packed_async")):
            # Accelerator finalize is transfer-engineered for a
            # high-latency link: every D2H fetch pays a round trip, so
            # small grids ride ONE fused dispatch + ONE transfer
            # (_finalize_packed) and large grids stream row strips with
            # transfer/encode/checkpoint overlap (_finalize_streamed).
            # With state_dir set, only the raw state planes cross the
            # wire and the band is finalized host-side from the same
            # bytes that become the PCRT checkpoint.
            cfg = self.config.grid
            need_state = bool(self.config.state_dir)
            pack_max = int(os.environ.get("PCR_PACK_MAX_BYTES",
                                          str(8 << 20)))
            worst = 0
            for spec, info in self._plans:
                if info.scatter_kind == "collect":
                    continue
                planes = info.state_floats if need_state else 1
                worst = max(worst, planes * cfg.height * cfg.width * 4)
            # With an encoded output the streamed path wins earlier: the
            # LZW encode of strip k-1 rides the iowait of strip k's
            # fetch, so anything big enough for >=2 strips overlaps
            # encode with transfer instead of paying them in sequence.
            stream_min = int(os.environ.get(
                "PCR_STREAM_MIN_BYTES",
                str(2 << 20) if self.config.output_path else str(pack_max)))
            if worst <= min(pack_max, 2 * stream_min - 1):
                return self._finalize_packed(need_state)
            return self._finalize_streamed(need_state)
        if self._engine is not None:
            self._engine.block_until_ready()
        if self.config.state_dir or self._tiled:
            self._flush_state()

        cfg = self.config.grid
        bands = []
        for spec, _ in self._plans:
            name = (spec.output_band_name
                    or f"{spec.value_channel}_{int(spec.type)}")
            bands.append(BandDesc(name=name, dtype=DataType.Float32,
                                  is_state=False))
        grid = Grid.create(cfg.width, cfg.height, bands, MemoryLocation.Host)
        # When every tile was touched the NaN prefill is fully overwritten —
        # skip it (and the extra full-band copy below); on a 10M+-cell grid
        # those are two of the four host passes.
        all_touched = (len(self._touched_tiles)
                       == cfg.tiles_x * cfg.tiles_y)
        for i, (spec, info) in enumerate(self._plans):
            # Per-tile finalize, reference semantics (pipeline.cpp:1204-1283):
            # bands start NaN; only tiles with state are finalized, so e.g.
            # Sum yields 0.0 for empty cells inside touched tiles and NaN
            # for untouched tiles.
            band = (np.empty((cfg.height, cfg.width), dtype=np.float32)
                    if all_touched else
                    np.full((cfg.height, cfg.width), np.nan,
                            dtype=np.float32))
            if info.scatter_kind == "collect":
                grid.set_band_array(i, self._collect_band(i, spec))
                continue
            if self._backend == "jax":
                # finalize on device; fetch one band instead of K state fields
                full = self._engine.finalize_band(i)
                if all_touched:
                    band = np.ascontiguousarray(full[:cfg.height, :cfg.width],
                                                dtype=np.float32)
                else:
                    for (trow, tcol) in self._touched_tiles:
                        cs, rs, cc, rc = cfg.tile_cell_range(
                            TileIndex(row=trow, col=tcol))
                        band[rs:rs + rc, cs:cs + cc] = full[rs:rs + rc,
                                                            cs:cs + cc]
            elif self._tiled:
                mgr = self._managers[i]
                for (trow, tcol) in self._touched_tiles:
                    tile = TileIndex(row=trow, col=tcol)
                    cs, rs, cc, rc = cfg.tile_cell_range(tile)
                    block = mgr.acquire(tile)
                    tile_fields = [block[f]
                                   for f in range(info.state_floats)]
                    band[rs:rs + rc, cs:cs + cc] = np.asarray(
                        info.finalize_arrays(tile_fields), dtype=np.float32)
            elif all_touched:
                band = np.asarray(
                    info.finalize_arrays(list(self._host_state[i])),
                    dtype=np.float32)
                if any(band is f for f in self._host_state[i]):
                    band = band.copy()   # Sum finalize returns state itself
            else:
                fields = self._host_state[i]
                for (trow, tcol) in self._touched_tiles:
                    cs, rs, cc, rc = cfg.tile_cell_range(
                        TileIndex(row=trow, col=tcol))
                    tile_fields = [f[rs:rs + rc, cs:cs + cc] for f in fields]
                    band[rs:rs + rc, cs:cs + cc] = np.asarray(
                        info.finalize_arrays(tile_fields), dtype=np.float32)
            grid.set_band_array(i, band, copy=False)
        self._result = grid
        self._finalized = True

        if self.config.output_path:
            from ..io.geotiff import GeoTiffOptions, write_geotiff
            from .. import native
            # LZW default like the reference (GeoTiffOptions/grid_io.h); the
            # native C++ codec keeps it fast. Without a compiler, fall back
            # to zlib level 1 (the pure-Python LZW is too slow for the
            # pipeline hot path).
            if native.available():
                opts = GeoTiffOptions(cloud_optimized=self.config.write_cog)
            else:
                opts = GeoTiffOptions(cloud_optimized=self.config.write_cog,
                                      compress="DEFLATE", compress_level=1)
            st = write_geotiff(self.config.output_path, grid, cfg, opts)
            if not st.ok():
                raise PcrError(st)

    def _band_names(self):
        return [(spec.output_band_name
                 or f"{spec.value_channel}_{int(spec.type)}")
                for spec, _ in self._plans]

    def _mask_strip(self, band, host, r0, r1):
        """Copy the touched-tile regions of a fetched row strip into the
        NaN-initialized output band (per-tile finalize semantics,
        pipeline.cpp:1204-1283)."""
        cfg = self.config.grid
        t0 = r0 // cfg.tile_height
        t1 = (r1 - 1) // cfg.tile_height
        for trow in range(t0, t1 + 1):
            for tcol in range(cfg.tiles_x):
                if (trow, tcol) not in self._touched_tiles:
                    continue
                cs, rs, cc, rc = cfg.tile_cell_range(
                    TileIndex(row=trow, col=tcol))
                a, b = max(rs, r0), min(rs + rc, r1)
                if a < b:
                    band[a:b, cs:cs + cc] = host[a - r0:b - r0, cs:cs + cc]

    def _collect_band(self, i, spec):
        """Assemble an order-statistics (Median/Percentile) band from the
        collected (cell, value) stream (spill-backed: collect_spill)."""
        cfg = self.config.grid
        q = (0.5 if ReductionType(spec.type) == ReductionType.Median
             else float(spec.percentile))
        return self._collect[i].band((cfg.height, cfg.width), q)

    def _geotiff_opts(self):
        from .. import native
        from ..io.geotiff import GeoTiffOptions
        # LZW default like the reference (GeoTiffOptions/grid_io.h); the
        # native C++ codec keeps it fast. Without a compiler, fall back
        # to zlib level 1 (the pure-Python LZW is too slow for the
        # pipeline hot path).
        if native.available():
            return GeoTiffOptions(cloud_optimized=self.config.write_cog)
        return GeoTiffOptions(cloud_optimized=self.config.write_cog,
                              compress="DEFLATE", compress_level=1)

    def _finalize_packed(self, need_state: bool) -> None:
        """Small-grid accelerator finalize: per reduction, ONE fused
        dispatch (pending updates + finalize) whose result crosses the
        wire in ONE transfer.  With `need_state` the transfer carries the
        raw state planes — the PCRT checkpoint is written from them and
        the band is host-finalized, so checkpointing costs no extra
        round trip (the reference's flush_all + assemble single pass,
        pipeline.cpp:1154-1363)."""
        cfg = self.config.grid
        eng = self._engine
        names = self._band_names()
        grid = Grid.create(cfg.width, cfg.height,
                           [BandDesc(name=n, dtype=DataType.Float32,
                                     is_state=False) for n in names],
                           MemoryLocation.Host)
        packed_dev = {}
        for i, (spec, info) in enumerate(self._plans):
            if info.scatter_kind != "collect":
                packed_dev[i] = eng.finalize_packed_async(i, need_state)
        all_touched = (len(self._touched_tiles)
                       == cfg.tiles_x * cfg.tiles_y)
        # prefetch every spec's packed result concurrently: on the tunnel
        # a fetch doesn't start until something blocks on it, so spec
        # i+1's transfer otherwise waits for spec i's encode
        fetches = {}
        if len(packed_dev) > 1:
            from concurrent.futures import ThreadPoolExecutor
            pf = ThreadPoolExecutor(max_workers=2)
            fetches = {i: pf.submit(np.asarray, d)
                       for i, d in packed_dev.items()}
            pf.shutdown(wait=False)
        for i, (spec, info) in enumerate(self._plans):
            if info.scatter_kind == "collect":
                grid.set_band_array(i, self._collect_band(i, spec),
                                    copy=False)
                continue
            host = (fetches[i].result() if i in fetches
                    else np.asarray(packed_dev[i]))
            if need_state:
                fields = [host[k] for k in range(info.state_floats)]
                self._write_state_tiles(i, fields)
                full = np.asarray(info.finalize_arrays(fields),
                                  dtype=np.float32)
                if any(full is f for f in fields):
                    full = full.copy()   # Sum finalize returns state itself
            else:
                full = host[0]
            if all_touched:
                band = np.ascontiguousarray(full, dtype=np.float32)
            else:
                band = np.full((cfg.height, cfg.width), np.nan,
                               dtype=np.float32)
                for (trow, tcol) in self._touched_tiles:
                    cs, rs, cc, rc = cfg.tile_cell_range(
                        TileIndex(row=trow, col=tcol))
                    band[rs:rs + rc, cs:cs + cc] = full[rs:rs + rc,
                                                        cs:cs + cc]
            grid.set_band_array(i, band, copy=False)
        self._result = grid
        self._finalized = True
        if self.config.output_path:
            from ..io.geotiff import write_geotiff
            st = write_geotiff(self.config.output_path, grid, cfg,
                               self._geotiff_opts())
            if not st.ok():
                raise PcrError(st)

    def _finalize_streamed(self, need_state: bool = False) -> None:
        """Large-grid accelerator finalize with transfer/encode/checkpoint
        overlap: one fused dispatch per reduction (pending updates +
        finalize + strip split), then the main thread fetches strip k
        while a writer thread LZW-encodes strip k-1 into the GeoTIFF
        (and, with `need_state`, writes the PCRT checkpoint from the
        same strips).  Strip height adapts to the link: ~2 MB per fetch
        amortizes the per-transfer overhead while still overlapping the
        encode."""
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.config.grid
        eng = self._engine
        names = self._band_names()
        grid = Grid.create(cfg.width, cfg.height,
                           [BandDesc(name=n, dtype=DataType.Float32,
                                     is_state=False) for n in names],
                           MemoryLocation.Host)
        writer = None
        if self.config.output_path:
            from ..io.geotiff import StreamingGeoTiffWriter
            writer = StreamingGeoTiffWriter(self.config.output_path, cfg,
                                            names, self._geotiff_opts())
        target = int(os.environ.get("PCR_STRIP_TARGET_BYTES",
                                    str(2 << 20)))

        # Dispatch every reduction's fused update+finalize program first;
        # the device queues them while the host streams results out.
        strips_per_spec = {}
        rows_per_spec = {}
        for i, (spec, info) in enumerate(self._plans):
            if info.scatter_kind == "collect":
                continue
            nplanes = info.state_floats if need_state else 1
            row_bytes = cfg.width * 4 * nplanes
            rows = max(1, target // row_bytes)
            if writer is not None and rows >= cfg.height > 1:
                # keep >=2 strips so the tail encode overlaps a transfer
                rows = (cfg.height + 1) // 2
            rows_per_spec[i] = min(rows, cfg.height)
            strips_per_spec[i] = eng.finalize_strips(
                i, rows_per_spec[i], with_state=need_state)

        # when every tile is touched the NaN prefill is fully overwritten
        # by _mask_strip — skip the extra full-band pass on the host
        all_touched = (len(self._touched_tiles)
                       == cfg.tiles_x * cfg.tiles_y)
        ex = ThreadPoolExecutor(max_workers=1)
        # Strip prefetch pool: without it, strip k+1's D2H does not even
        # START until strip k's np.asarray returns (async D2H is a no-op
        # on the tunnel — see tpu_backend.start_d2h), so every strip pays
        # the full round-trip serially.  Two fetch threads keep the wire
        # busy (they sit in iowait, not on the GIL) while the main thread
        # consumes strips in order and the writer thread LZW-encodes.
        # Bounded sliding window: submitting every strip of every spec
        # upfront would retain completed hosts arrays until consumption —
        # ~2x the full raster in host memory, exactly on the large-raster
        # path streaming is meant to bound. Keep at most PREFETCH strips
        # in flight ahead of the consumer and drop each future as soon as
        # its strip is consumed.
        fetch_ex = ThreadPoolExecutor(max_workers=2)
        prefetch = max(1, int(os.environ.get("PCR_STRIP_PREFETCH", "4")))
        fetch_order = [(i, j, dev)
                       for i, strips in strips_per_spec.items()
                       for j, (_, _, dev) in enumerate(strips)]
        strip_futs = {}
        submitted = 0

        def _advance(upto):
            nonlocal submitted
            while submitted < min(upto, len(fetch_order)):
                ii, jj, dv = fetch_order[submitted]
                strip_futs[(ii, jj)] = fetch_ex.submit(np.asarray, dv)
                submitted += 1

        _advance(prefetch)
        consumed = 0
        futures = []
        bands = []
        try:
            for i, (spec, info) in enumerate(self._plans):
                if info.scatter_kind == "collect":
                    band = self._collect_band(i, spec)
                    if writer is not None:
                        futures.append(ex.submit(writer.write_rows, band))
                        futures.append(ex.submit(writer.end_band))
                    grid.set_band_array(i, band, copy=False)
                    bands.append(band)
                    continue
                band = (np.empty((cfg.height, cfg.width), dtype=np.float32)
                        if all_touched else
                        np.full((cfg.height, cfg.width), np.nan,
                                dtype=np.float32))
                fields = ([np.empty((cfg.height, cfg.width), np.float32)
                           for _ in range(info.state_floats)]
                          if need_state else None)
                for j, (r0, r1, dev) in enumerate(strips_per_spec[i]):
                    fut = strip_futs.pop((i, j))
                    consumed += 1
                    _advance(consumed + prefetch)
                    host = fut.result()
                    del fut
                    if need_state:
                        for k in range(info.state_floats):
                            fields[k][r0:r1] = host[k]
                        fin = np.asarray(
                            info.finalize_arrays([host[k] for k in
                                                  range(info.state_floats)]),
                            dtype=np.float32)
                    else:
                        fin = host
                    self._mask_strip(band, fin, r0, r1)
                    if writer is not None:
                        futures.append(ex.submit(writer.write_rows,
                                                 band[r0:r1]))
                if writer is not None:
                    futures.append(ex.submit(writer.end_band))
                if need_state:
                    futures.append(ex.submit(self._write_state_tiles,
                                             i, fields))
                grid.set_band_array(i, band, copy=False)
                bands.append(band)
            for f in futures:
                f.result()
            if writer is not None:
                st = writer.close(
                    overview_bands=bands if self.config.write_cog else None)
                if not st.ok():
                    raise PcrError(st)
        finally:
            ex.shutdown(wait=True)
            fetch_ex.shutdown(wait=False)
        self._result = grid
        self._finalized = True

    # -- convenience ----------------------------------------------------------------

    def run(self, clouds) -> None:
        for c in clouds:
            self.ingest(c)
        self.finalize()

    def warmup(self, chunk_points: int = 0) -> None:
        """Absorb one-time accelerator costs before timed/production work.

        The first synchronous device operation of a process (remote
        tunnels may stall on it) and the per-grid-shape XLA/Mosaic
        compiles of the ingest and finalize programs otherwise land in
        the first real `ingest()`/`finalize()` call. This runs the full
        lifecycle on a throwaway pipeline with the same grid/reductions
        (and, with `chunk_points`, the same chunk bucket) so those costs
        are paid here instead. No-op on the CPU backend; does not touch
        this pipeline's state or output.

        The reference pays the analogous CUDA context/module-load cost
        inside Pipeline::create (pipeline.cpp:109-217); here compiles
        are shape-keyed, so warming needs a representative ingest."""
        if self._backend != "jax":
            return
        import copy
        import tempfile
        cfg = copy.copy(self.config)
        cfg.output_path = ""
        # keep the state_dir/no-state_dir finalize variant identical so the
        # warmed program keys match the real run's
        cfg.state_dir = (tempfile.mkdtemp(prefix="pcr_warm_state_")
                         if self.config.state_dir else "")
        cfg.resume = False
        cfg.filter = type(self.config.filter)()
        shadow = Pipeline.create(cfg)
        # Share the compiled-program cache: the shadow engine has identical
        # grid/plans, so every program it compiles is directly reusable by
        # this pipeline's engine (otherwise the first real finalize pays
        # the multi-second trace+compile the warmup was meant to absorb).
        if (hasattr(shadow._engine, "_jits")
                and hasattr(self._engine, "_jits")
                and type(shadow._engine) is type(self._engine)):
            shadow._engine._jits = self._engine._jits
        n = max(int(chunk_points), 2)
        rng = np.random.default_rng(0)
        b = self.config.grid.bounds
        cloud = PointCloud.create(n)
        cloud.set_x_array(rng.uniform(b.min_x, b.max_x, n))
        cloud.set_y_array(rng.uniform(b.min_y, b.max_y, n))
        channels = set()
        for spec, info in self._plans:
            for ch in (spec.value_channel, spec.weight_channel,
                       spec.timestamp_channel, spec.priority_channel,
                       spec.glyph.sigma_x_channel, spec.glyph.sigma_y_channel,
                       spec.glyph.rotation_channel,
                       spec.glyph.direction_channel,
                       spec.glyph.half_length_channel):
                if ch:
                    channels.add(ch)
        for ch in channels:
            cloud.add_channel(ch, DataType.Float32)
            cloud.set_channel_array_f32(
                ch, rng.uniform(0.1, 1.0, n).astype(np.float32))
        shadow.ingest(cloud)
        shadow.finalize()

    def set_progress_callback(self, cb) -> None:
        self._progress_cb = cb

    def result(self) -> Grid | None:
        """The finalized grid (None before finalize())."""
        return self._result if self._finalized else None

    def stats(self) -> ProgressInfo:
        return ProgressInfo(
            collections_processed=self._collections,
            collections_total=0,
            points_processed=self._points,
            tiles_active=len(self._touched_tiles),
            elapsed_seconds=time.perf_counter() - self._start,
        )
