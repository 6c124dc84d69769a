"""
TPU backend — the JAX/XLA accelerated ingest path (ExecutionMode.GPU/Auto).

Design (vs. the reference's CUDA atomic scatter, accumulator_kernels.cu:31-251,
glyph_kernels.cu:345-492):

  * **Point glyph**: XLA deterministic scatter (`state.at[cells].add/max/min`)
    on flat cell ids. Contention-free and run-order independent — the
    reference's float atomicAdd is not.
  * **Gaussian glyph (rotation == 0)**: *separable matmul scatter* on the MXU.
    A Gaussian footprint with zero rotation factorises into row and column
    weight vectors, so a block of B points accumulates into the grid as one
    (H x B) @ (B x W) matmul of "soft one-hots":
        state[h, w] += sum_p  wy[p, h] * (wx[p, w] * val[p])
    with wy/wx the axis Gaussians (including the per-point radius mask
    |d| <= r_p). This makes sigma=16 cost the same as sigma=1 — the
    reference's O(N * (3 sigma)^2) blowup disappears. The w < 1e-6 product
    cutoff of the reference (glyph_kernels.cu:167) is *not* representable in
    separable form; per-axis factors below 1e-6 are zeroed, bounding any
    residual deviation below 1e-6 weight per point per cell (validated under
    the 1e-5 parity bar).
  * **Gaussian glyph (rotation != 0)**: exact masked window expansion +
    scatter-add (matches the oracle cell-for-cell including the cutoff),
    O(N * (2r+1)^2) — used only for rotated splats.
  * **Line glyph**: vectorized Bresenham — all N lines advance one step per
    iteration (glyph_kernels.cu:252-279 semantics) and each step is a masked
    scatter-add.
  * **Max/Min**: XLA scatter-max/min. **MostRecent**: three-scatter argmax
    (max timestamp, then min point-index among ties, then value write) —
    deterministic, unlike the reference's CAS race
    (accumulator_kernels.cu:139-167).

Coordinates never reach the device in float64: the host computes integer
cells + float32 sub-cell fractions in f64 numpy (routing.py), so the device
works purely in f32/i32 (TPU has no fast f64).

**Transfer discipline.** The host→device link can have very high per-call
latency (remote-attached TPUs), so every chunk travels as ONE packed int32
buffer of fixed bucket size; invalid points are encoded in-band (cell == C
for point glyphs, r == -1 for Gaussians, sentinel endpoints for lines) so no
mask array is transferred. `prepare_*` stages chunks to the device without
running compute (the analogue of the reference's Device-resident clouds,
BENCHMARK_RESULTS.md "GPU-Device" mode); `commit` runs the jitted update.

All update functions are jitted once per (spec signature, chunk bucket) and
donate the state buffers, so ingest is pure device-resident accumulation.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np

from ..core.grid_config import GridConfig
from ..core.types import ReductionType
from ..ops.reduction import FLT_MAX, ReductionInfo

__all__ = ["TpuEngine", "bucket_size", "chunk_ranges", "CHUNK_BUCKETS",
           "enable_compilation_cache", "StagedChunk"]

# Fixed chunk buckets: pad every ingest chunk up to one of these sizes so XLA
# compiles a bounded number of program shapes (reference analogue: the
# billion-point scripts chunk ingest; here chunking also pins static shapes).
# The ladder tops out at 2M points: compile time grows with program size and
# larger chunks don't help once transfers are amortised. Rungs are ~4x apart
# so a padded tail chunk wastes at most ~3x its size on the wire — the
# 262144/1048576 rungs matter for host-sourced ingest, where padding is
# paid in real host-link bytes.
CHUNK_BUCKETS = (8_192, 65_536, 262_144, 1_048_576, 2_097_152)

_LINE_SENTINEL = np.int32(-(1 << 20))


def bucket_size(n: int) -> int:
    for b in CHUNK_BUCKETS:
        if n <= b:
            return b
    return CHUNK_BUCKETS[-1]


def chunk_ranges(n: int, cap: int | None = None):
    """Greedy split of n points into bucket-aligned (start, end) ranges:
    full max-size chunks, then one padded tail chunk. `cap` lowers the
    max chunk below the ladder top (entry-budget-bounded glyph wires)."""
    out = []
    start = 0
    top = CHUNK_BUCKETS[-1]
    if cap is not None:
        top = max(bucket_size(min(cap, top)), CHUNK_BUCKETS[0])
        if top > cap and top > CHUNK_BUCKETS[0]:
            top = CHUNK_BUCKETS[max(CHUNK_BUCKETS.index(top) - 1, 0)]
    while n - start >= top:
        out.append((start, start + top))
        start += top
    if n - start > 0 or n == 0:
        out.append((start, n))
    return out


_CACHE_READY = False


def enable_compilation_cache():
    """Turn on JAX's persistent compilation cache (compiles through a
    remote-TPU tunnel take minutes; caching makes them one-time)."""
    global _CACHE_READY
    if _CACHE_READY:
        return
    import jax
    d = os.environ.get("PCR_JAX_CACHE",
                       os.path.expanduser("~/.cache/pcr_jax_cache"))
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _CACHE_READY = True


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def start_d2h(arr) -> None:
    """Kick off an async device→host copy for `arr` — when it's safe.

    On a direct-attached TPU, `copy_to_host_async()` lets the caller
    overlap D2H with host-side work (encode, checkpoint writes).  On the
    axon remote-TPU tunnel it is ruinous: one call permanently degrades
    EVERY subsequent transfer in the process ~30x (measured 25 MB H2D
    0.017s → 0.5s, and the first post-call transfer 5s+), which round 2
    mis-read as a slow link.  So async D2H is opt-in on axon and
    default-on elsewhere; `PCR_ASYNC_D2H=0/1` overrides either way."""
    env = os.environ.get("PCR_ASYNC_D2H", "")
    if env == "0" or not hasattr(arr, "copy_to_host_async"):
        return
    if env != "1":
        try:
            if arr.devices().pop().platform == "axon":
                return
        except Exception:
            # unknown platform shape: skip async rather than risk the
            # axon degradation — losing D2H overlap is cheap, a ~30x
            # process-wide transfer slowdown is not
            return
    arr.copy_to_host_async()


# Jitted update programs shared across engine instances. Every builder is a
# pure function of (ReductionInfo singleton, grid geometry, static ints that
# already live in the chunk keys), so two pipelines with the same config can
# share one traced+compiled callable — without this, every new Pipeline
# re-traces its whole bucket ladder, which through a remote-TPU tunnel costs
# tens of seconds per run even with the persistent XLA cache hitting (the
# trace itself plus cache round-trips dominate). Keyed by an engine
# "namespace" fingerprint; bounded LRU so long test sessions with hundreds
# of distinct tiny grids don't accumulate executables forever.
_SHARED_JITS: "OrderedDict[tuple, dict]" = OrderedDict()
_SHARED_JITS_CAP = 16


def _shared_jit_namespace(ns_key: tuple) -> dict:
    d = _SHARED_JITS.get(ns_key)
    if d is None:
        d = {}
        _SHARED_JITS[ns_key] = d
        while len(_SHARED_JITS) > _SHARED_JITS_CAP:
            _SHARED_JITS.popitem(last=False)
    else:
        _SHARED_JITS.move_to_end(ns_key)
    return d


def matmul_precision():
    """Precision for the soft-one-hot matmuls. HIGHEST (6-pass bf16 f32
    emulation) is exact enough for the 1e-5 parity bar with margin; set
    PCR_MATMUL_PRECISION=high for the 2x-faster 3-pass variant."""
    import jax
    name = os.environ.get("PCR_MATMUL_PRECISION", "highest").upper()
    return getattr(jax.lax.Precision, name, jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Update builders. Each consumes ONE packed int32 buffer of nseg*bucket and
# returns updated state tuples.
# ---------------------------------------------------------------------------


def _build_point_update(info: ReductionInfo, C: int):
    """Point glyph scatter; invalid points arrive as cell == C and drop."""
    jax, jnp = _jax()
    kind = info.scatter_kind

    def update(states, cells, values, weights, timestamps):
        fields = info.fields(values, weights, timestamps)
        if kind == "sum":
            return tuple(
                states[f].at[cells].add(fv.astype(jnp.float32), mode="drop")
                for f, fv in enumerate(fields))
        if kind == "max":
            return (states[0].at[cells].max(
                fields[0].astype(jnp.float32), mode="drop"),)
        if kind == "min":
            return (states[0].at[cells].min(
                fields[0].astype(jnp.float32), mode="drop"),)
        if kind == "argmax_ts":
            return _argmax_ts_update(states, cells, fields[0], fields[1], C)
        raise NotImplementedError(kind)

    return update


def _point_nseg(info: ReductionInfo) -> int:
    return 2 + (1 if info.uses_weight else 0) + (1 if info.uses_timestamp else 0)


def _build_point_update_packed(info: ReductionInfo, C: int, bucket: int):
    """Packed layout: [cells | values | (weights) | (timestamps)]."""
    jax, jnp = _jax()
    base = _build_point_update(info, C)
    nseg = _point_nseg(info)

    def update(states, buf):
        segs = [buf[i * bucket:(i + 1) * bucket] for i in range(nseg)]
        cells = segs[0]
        values = jax.lax.bitcast_convert_type(segs[1], jnp.float32)
        k = 2
        weights = None
        if info.uses_weight:
            weights = jax.lax.bitcast_convert_type(segs[k], jnp.float32)
            k += 1
        timestamps = None
        if info.uses_timestamp:
            timestamps = jax.lax.bitcast_convert_type(segs[k], jnp.float32)
        if weights is None:
            weights = jnp.ones_like(values)
        if timestamps is None:
            timestamps = jnp.full_like(values, -FLT_MAX)
        return base(states, cells, values, weights, timestamps)

    return update


def _argmax_ts_update(states, cells, values, ts, C):
    """Deterministic MostRecent scatter (see module docstring).

    Semantics match builtin_ops.h:114-116: a strictly greater timestamp
    replaces; among equal timestamps within the batch the earliest point
    wins; existing state wins ties against the batch. Invalid points arrive
    as cells == C and are dropped."""
    jax, jnp = _jax()
    cur_v, cur_t = states
    n = cells.shape[0]
    valid = cells < C
    safe = jnp.where(valid, cells, 0)
    ts = jnp.where(valid, ts, -FLT_MAX).astype(jnp.float32)
    values = values.astype(jnp.float32)
    m = jnp.full((C,), -FLT_MAX, jnp.float32).at[cells].max(ts, mode="drop")
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    big = jnp.int32(2**31 - 1)
    is_win = valid & (ts == m[safe]) & (ts > cur_t[safe])
    idx_masked = jnp.where(is_win, idx, big)
    widx = jnp.full((C,), big, jnp.int32).at[cells].min(idx_masked,
                                                        mode="drop")
    final = is_win & (idx == widx[safe])
    target = jnp.where(final, cells, C)
    new_v = cur_v.at[target].set(values, mode="drop")
    new_t = cur_t.at[target].set(ts, mode="drop")
    return (new_v, new_t)


def _build_point_update_grid(info: ReductionInfo, H_pad: int, W_state: int,
                             W: int, C: int, bucket: int, with_f1: bool):
    """Minimal-wire Point update for grid-shaped (Pallas) states: packed
    layout [cells | f0 | (f1)], cells unpacked to (row, col) on device.

    Used for host-sourced ingest where the host→device link, not the
    accumulate, is the bottleneck (2 segs instead of the bucketed path's
    3+bids, and no host-side layout pass). Invalid/padding entries carry
    cell == C == H*W, which lands in the sliced-off padding rows (or is
    dropped when H_pad == H)."""
    jax, jnp = _jax()
    rtype = ReductionType(info.type)
    nf, use_val = _glyph_nf(info)

    def update(states, buf):
        cells = buf[:bucket]
        f0 = jax.lax.bitcast_convert_type(buf[bucket:2 * bucket],
                                          jnp.float32)
        r = cells // W
        c = cells % W
        out0 = states[0].at[r, c].add(f0, mode="drop")
        if nf == 1:
            return (out0,)
        if with_f1:
            f1 = jax.lax.bitcast_convert_type(buf[2 * bucket:3 * bucket],
                                              jnp.float32)
        else:
            # Average: the count field gets 1 per entry; padding entries
            # land in the padding row (or drop), so no mask is needed,
            # matching the implicit one-hot column of the bucketed path.
            f1 = jnp.ones_like(f0)
        return (out0, states[1].at[r, c].add(f1, mode="drop"))

    return update


# Legit separable-splat deposits all carry weight >= 1e-6 (the
# reference's product cutoff, glyph_kernels.cu:160); anything below half
# of that in a Gaussian weight-sum field is a corr-cancellation residue
# (the exact-cancellation pass relies on bitwise-identical factor bits
# between the main and corr rows, and XLA's rounding occasionally
# differs — observed on chip: 3 cells per 500^2 sigma=1 scene painting
# 0.0 where the oracle says empty, round 5).
GAUSS_WMIN = np.float32(5e-7)


def gauss_state_flush(spec, info, fields, xp):
    """Zero sub-cutoff Gaussian weight sums (and their value sums) so the
    empty-cell NaN footprint is exact. Point/Line specs and Sum states
    pass through: user weight channels may legitimately be tiny, Line
    weights are >= 1, and Sum cells inside touched tiles are 0.0-filled
    rather than NaN (reference per-tile finalize semantics)."""
    from .glyph import GlyphType
    if GlyphType(spec.glyph.type) != GlyphType.Gaussian:
        return fields
    rtype = ReductionType(info.type)
    zero = xp.float32(0.0)
    if rtype in (ReductionType.Average, ReductionType.WeightedAverage):
        keep = fields[1] >= GAUSS_WMIN
        return [xp.where(keep, f, zero) for f in fields]
    if rtype == ReductionType.Count:
        keep = fields[0] >= GAUSS_WMIN
        return [xp.where(keep, fields[0], zero)]
    return fields


def _glyph_nf(info: ReductionInfo):
    rtype = ReductionType(info.type)
    nf = 2 if rtype in (ReductionType.WeightedAverage,
                        ReductionType.Average) else 1
    use_val = rtype != ReductionType.Count
    return nf, use_val


def _device_tile_clip(jnp, cfg: GridConfig, icx, icy):
    """Home-tile clip ranges derived on device from the (unclamped) center
    cell. The home tile is the tile of the *clamped* assigned cell
    (tile_router semantics), so clamp first.

    `cfg` may be a row-offset shard view (parallel.engine._LocalCfg with
    row_offset/global_height): tile rows are then computed in GLOBAL row
    coordinates and the returned rs/re are translated back to the view's
    local rows (possibly negative / beyond the local height — callers
    mask against local row iotas, so out-of-shard ranges clip to
    nothing)."""
    W = cfg.width
    off = getattr(cfg, "row_offset", 0)
    Hg = getattr(cfg, "global_height", cfg.height)
    tw, th = cfg.tile_width, cfg.tile_height
    col = jnp.clip(icx, 0, W - 1)
    grow = jnp.clip(icy + off, 0, Hg - 1)
    cs = (col // tw) * tw
    rs = (grow // th) * th
    ce = jnp.minimum(cs + tw, W)
    re = jnp.minimum(rs + th, Hg)
    return cs, ce, rs - off, re - off


def _build_sorted_matmul_update(info: ReductionInfo, cfg: GridConfig,
                                nsub: int, block: int, TH: int,
                                point_mode: bool, with_f1: bool):
    """Row-block-sorted matmul scatter — the fast accumulation path for the
    sum-family ops, used by both Gaussian splats (soft one-hots) and Point
    glyphs (exact one-hots).

    The host buckets entries by TH-row block (halo-duplicating Gaussian
    footprints that straddle blocks), so each device sub-chunk of `block`
    entries targets ONE row block: its factor matmul is (TH x B) @
    (B x nf*W) instead of (H x B) @ (B x nf*W) — an H/TH-fold FLOP
    reduction — and the result folds into the state with an in-place
    dynamic-update-slice.

    Packed layout: nsub sub-chunks x [icx | icy | sub_cx | sub_cy | sx |
    sy | r | f0 | (f1)] plus a (nsub,) row-block-id vector at the end.
    f0/f1 are the per-point field contributions (e.g. val*w and w for
    WeightedAverage); when with_f1 is False the second field is an implicit
    1.0 (the glyph weight-sum convention). Invalid/padding entries carry
    r == -1 (Gaussian) or icy == -1 (point mode).
    """
    jax, jnp = _jax()
    H, W = cfg.height, cfg.width
    nf, use_val = _glyph_nf(info)
    multi_tile = cfg.total_tiles() > 1
    # One-hot factors make the 3-pass bf16 product EXACT (each f32 splits
    # into 3 bf16 limbs losslessly and the one-hot side zeroes every cross
    # term), so point mode always takes the faster HIGH path; Gaussian soft
    # factors default to HIGHEST (6-pass, ~f32) for the parity bar.
    prec = (jax.lax.Precision.HIGH if point_mode else matmul_precision())
    # Point mode packs only [icx | icy | f0 | (f1)] — the transfer link is
    # the scarce resource, never ship constant segments.
    nseg = (3 if point_mode else 8) + (1 if with_f1 else 0)
    n = nsub * block

    def update(states, buf):
        seg = lambda i: buf[i * n:(i + 1) * n].reshape(nsub, block)
        f32 = lambda i: jax.lax.bitcast_convert_type(seg(i), jnp.float32)
        icx, icy = seg(0), seg(1)
        if point_mode:
            sub_cx = sub_cy = sx = sy = r = icx   # unused
            f0 = f32(2)
            f1 = f32(3) if with_f1 else None
        else:
            sub_cx, sub_cy = f32(2), f32(3)
            sx, sy = f32(4), f32(5)
            r = seg(6)
            f0 = f32(7)
            f1 = f32(8) if with_f1 else None
        bids = buf[nseg * n: nseg * n + nsub]

        ws = jax.lax.broadcasted_iota(jnp.float32, (1, W), 1)
        ws_i = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        th_i = jax.lax.broadcasted_iota(jnp.int32, (1, TH), 1)

        def body(carry, args):
            bicx, bicy, bsub_cx, bsub_cy, bsx, bsy, br, bf0, bf1, bid = args
            row0 = bid * TH
            hs_i = th_i + row0
            if point_mode:
                my = hs_i == bicy[:, None]
                mx = ws_i == bicx[:, None]
                wy = my.astype(jnp.float32)
                wx = mx.astype(jnp.float32)
            else:
                hs = hs_i.astype(jnp.float32)
                rdy = (hs - bicy[:, None].astype(jnp.float32)
                       ) - bsub_cy[:, None]
                qy = rdy / bsy[:, None]
                wy = jnp.exp(-0.5 * qy * qy)
                my = (jnp.abs(hs_i - bicy[:, None]) <= br[:, None])
                my &= (wy >= 1e-6) & (hs_i < H)   # bottom block may overhang
                rdx = (ws - bicx[:, None].astype(jnp.float32)
                       ) - bsub_cx[:, None]
                qx = rdx / bsx[:, None]
                wx = jnp.exp(-0.5 * qx * qx)
                mx = (jnp.abs(ws_i - bicx[:, None]) <= br[:, None])
                mx &= wx >= 1e-6
                if multi_tile:
                    cs, ce, rs, re = _device_tile_clip(jnp, cfg, bicx, bicy)
                    my &= (hs_i >= rs[:, None]) & (hs_i < re[:, None])
                    mx &= (ws_i >= cs[:, None]) & (ws_i < ce[:, None])
                wy = jnp.where(my, wy, 0.0)
                wx = jnp.where(mx, wx, 0.0)

            # field 0 always scales by f0 (the host bakes Count's 1.0 and
            # WeightedAverage's val*w into f0); field 1 scales by f1 when
            # provided, else it is the raw glyph weight wx.
            cols = [wx * bf0[:, None]]
            if nf == 2:
                cols.append(wx * bf1[:, None] if with_f1 else wx)
            colfac = (jnp.concatenate(cols, axis=1)
                      if len(cols) > 1 else cols[0])
            contrib = jax.lax.dot_general(
                wy, colfac, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            out = []
            for f in range(nf):
                cur = jax.lax.dynamic_slice(carry[f], (row0, 0), (TH, W))
                out.append(jax.lax.dynamic_update_slice(
                    carry[f], cur + contrib[:, f * W:(f + 1) * W],
                    (row0, 0)))
            return tuple(out), None

        states, _ = jax.lax.scan(
            body, states,
            (icx, icy, sub_cx, sub_cy, sx, sy, r, f0,
             f1 if with_f1 else jnp.zeros_like(f0), bids))
        return states

    return update


GAUSS_ROW_BLOCK = 128          # TH: rows per block in the sorted splat
# Rotated (dense) splat blocks: shorter rows cut the per-point tile area
# (the kernel evaluates TH*WT cells per point), narrower cols cut halo.
ROT_ROW_BLOCK = int(os.environ.get("PCR_ROT_ROW_BLOCK", 32))
ROT_COL_TILE = int(os.environ.get("PCR_ROT_COL_TILE", 128))
# Packed rot splat (build_rot_packed_pallas): short row blocks win because
# the 4-slot lane packing already amortizes per-entry overhead; the radius
# gate bounds halo duplication (copies ~ (1+2r/TH)(1+2r/32) per point).
ROTP_ROW_BLOCK = int(os.environ.get("PCR_ROTP_ROW_BLOCK", 16))
ROTP_RMAX = int(os.environ.get("PCR_ROTP_RMAX", 16))
PALLAS_BLOCK = int(os.environ.get("PCR_PALLAS_BLOCK", 2048))  # entries per sub-chunk (VMEM-bounded)
_SUB_LADDER = (8, 32, 128, 512, 1024, 1536, 2048)  # nsub buckets (bounded jits)


def _nsub_bucket(k: int) -> int:
    for b in _SUB_LADDER:
        if k <= b:
            return b
    # Above the ladder, round to multiples of 256: a coarser rung wastes
    # real wire/pack time (2442 → 4096 was 68% padding on the 5M bench)
    # while 256 keeps the jit-signature count bounded and ~5% waste.
    return ((k + 255) // 256) * 256


def gauss_product_cutoff_bites(r, sx, sy) -> bool:
    """True when the square +-r window can contain cells that the
    reference's PRODUCT weight cutoff (w >= 1e-6, glyph_kernels.cu's
    `if (weight < 1e-6f) continue`) drops: the separable factorization
    can only mask per axis (wx >= 1e-6 AND wy >= 1e-6), so window
    corners with qx^2 + qy^2 > -2 ln(1e-6) would survive it wrongly.
    Such chunks must use the dense quadratic-form kernel, whose cutoff
    IS the product cutoff. Worst case |dq| <= (r + 1)/sigma per axis
    (sub-cell offset < 1 cell); bites only for small sigma — the 3-sigma
    window stays inside the cutoff ellipse from about sigma >= 1.7."""
    qx = (np.asarray(r, np.float64) + 1.0) / np.maximum(
        np.abs(np.asarray(sx, np.float64)), 1e-30)
    qy = (np.asarray(r, np.float64) + 1.0) / np.maximum(
        np.abs(np.asarray(sy, np.float64)), 1e-30)
    return bool(np.any(qx * qx + qy * qy > 27.631021))


def gauss_corr_offsets(r, sx, sy, max_k: int | None = None):
    """Static (dxo, dyo) window offsets whose PRODUCT weight can dip below
    the reference's 1e-6 cutoff while both per-axis factors stay passable
    — the only cells where the separable factorization over-deposits.

    For mildly-small uniform sigmas this set is tiny (sigma=1: just the
    (-r,-r) corner), so the sorted splat can stay separable and run ONE
    exact-cancellation one-hot pass per offset that subtracts the
    below-cutoff contributions (see pallas_kernels corr machinery) —
    recovering the ~2x separable-vs-dense speed the round-3 exactness fix
    gave back. Returns () when no cell can bite (plain separable), a
    tuple of offsets when the correction pass wins, or None when the set
    is too large (dense kernel).

    Worst case over the sub-cell offset in [0, 1): |d - sub| <= max(|d|,
    |d-1|); the axis can still pass the per-axis mask when min |d - sub|
    = |d| (d <= 0) / d-1 (d >= 1) stays under the cutoff."""
    if max_k is None:
        max_k = int(os.environ.get("PCR_GAUSS_CORR_MAX", 8))
    r = int(r)
    d = np.arange(-r, r + 1, dtype=np.float64)
    qmax = np.maximum(np.abs(d), np.abs(d - 1.0))
    qmin = np.where(d <= 0, np.abs(d), d - 1.0)
    sx = max(abs(float(sx)), 1e-30)
    sy = max(abs(float(sy)), 1e-30)
    CUT = 27.631021
    bite = (((qmax / sx) ** 2)[:, None] + ((qmax / sy) ** 2)[None, :]
            > CUT)
    passable = ((((qmin / sx) ** 2) <= CUT)[:, None]
                & (((qmin / sy) ** 2) <= CUT)[None, :])
    cand = bite & passable
    k = int(cand.sum())
    if k == 0:
        return ()
    if k > max_k:
        return None
    return tuple((int(d[i]), int(d[j])) for i, j in np.argwhere(cand))


def _build_gaussian_rotated_update(info: ReductionInfo, cfg: GridConfig,
                                   bucket: int, rmax: int):
    """Exact rotated-Gaussian splat: masked (2r+1)^2 window expansion +
    scatter-add, matching glyph_kernels.cu:145-176 including the 1e-6
    product cutoff. Packed layout: [icx | icy | sub_cx | sub_cy | sx | sy |
    cos | sin | r | values]; invalid points carry r == -1."""
    jax, jnp = _jax()
    H, W = cfg.height, cfg.width
    nf, use_val = _glyph_nf(info)
    multi_tile = cfg.total_tiles() > 1

    def update(states, buf):
        seg = lambda i: buf[i * bucket:(i + 1) * bucket]
        f32 = lambda i: jax.lax.bitcast_convert_type(seg(i), jnp.float32)
        icx, icy = seg(0), seg(1)
        sub_cx, sub_cy = f32(2), f32(3)
        sx, sy = f32(4), f32(5)
        cos_rot, sin_rot = f32(6), f32(7)
        r = seg(8)
        values = f32(9)
        if multi_tile:
            # clamp tile rows to the local grid: a row-offset shard view
            # can return negative rs, and a negative scatter row would
            # WRAP (numpy index semantics) instead of dropping
            cs, ce, rs, re = _device_tile_clip(jnp, cfg, icx, icy)
            rs = jnp.maximum(rs, 0)
            re = jnp.minimum(re, H)
        else:
            cs, ce, rs, re = 0, W, 0, H

        s0 = states[0]
        s1 = states[1] if nf == 2 else None

        def body(carry, offsets):
            s0, s1 = carry
            dy, dx = offsets
            gy = icy + dy
            gx = icx + dx
            rdy = dy.astype(jnp.float32) - sub_cy
            rdx = dx.astype(jnp.float32) - sub_cx
            rdx_rot = rdx * cos_rot - rdy * sin_rot
            rdy_rot = rdx * sin_rot + rdy * cos_rot
            qx = rdx_rot / sx
            qy = rdy_rot / sy
            w = jnp.exp(-0.5 * (qx * qx + qy * qy))
            ok = ((w >= 1e-6)
                  & (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r)
                  & (gx >= cs) & (gx < ce) & (gy >= rs) & (gy < re))
            w = jnp.where(ok, w, 0.0)
            gys = jnp.where(ok, gy, 0)
            gxs = jnp.where(ok, gx, 0)
            if use_val:
                s0 = s0.at[gys, gxs].add(values * w)
            else:
                s0 = s0.at[gys, gxs].add(w)
            if s1 is not None:
                s1 = s1.at[gys, gxs].add(w)
            return (s0, s1), None

        k = 2 * rmax + 1
        dys = jnp.repeat(jnp.arange(-rmax, rmax + 1, dtype=jnp.int32), k)
        dxs = jnp.tile(jnp.arange(-rmax, rmax + 1, dtype=jnp.int32), k)
        (s0, s1), _ = jax.lax.scan(body, (s0, s1), (dys, dxs))
        return (s0, s1) if nf == 2 else (s0,)

    return update


def _build_line_update(info: ReductionInfo, cfg: GridConfig, bucket: int,
                       max_steps: int):
    """Vectorized Bresenham line splat: all lines advance together, one
    masked scatter-add per step (glyph_kernels.cu:252-279 semantics).
    Packed layout: [ix0 | iy0 | ix1 | iy1 | (col | row) | values]; invalid
    points carry sentinel endpoints that never hit any cell. col/row (the
    clamped assigned cell, for home-tile clipping) are only packed for
    multi-tile grids."""
    jax, jnp = _jax()
    H, W = cfg.height, cfg.width
    C = H * W
    nf, use_val = _glyph_nf(info)
    multi_tile = cfg.total_tiles() > 1

    def update(states, buf):
        seg = lambda i: buf[i * bucket:(i + 1) * bucket]
        ix0, iy0, ix1, iy1 = seg(0), seg(1), seg(2), seg(3)
        k = 4
        if multi_tile:
            col, row = seg(4), seg(5)
            k = 6
            # col/row are the clamped assigned cell (except under a
            # row-offset shard view, where row is the local-shifted
            # global cell — _device_tile_clip reconstructs the frame).
            # Clamp the tile rows to the local grid: a shard view can
            # return negative rs, and a negative walk cell would WRAP
            # (numpy index semantics) instead of dropping.
            cs, ce, rs, re = _device_tile_clip(jnp, cfg, col, row)
            rs = jnp.maximum(rs, 0)
            re = jnp.minimum(re, H)
        else:
            cs, ce, rs, re = 0, W, 0, H
        values = jax.lax.bitcast_convert_type(seg(k), jnp.float32)

        s0 = states[0]
        s1 = states[1] if nf == 2 else None
        ddx = jnp.abs(ix1 - ix0)
        ddy = jnp.abs(iy1 - iy0)
        sx = jnp.where(ix0 < ix1, 1, -1).astype(jnp.int32)
        sy = jnp.where(iy0 < iy1, 1, -1).astype(jnp.int32)
        per_point_max = 2 * (ddx + ddy) + 2
        n = ix0.shape[0]

        # Phase 1: the Bresenham walk only advances integer registers — no
        # state dependency — so collect every step's target cell and do ONE
        # scatter at the end (a sequential scatter per step would serialize
        # max_steps round trips through HBM).
        def walk(carry, step):
            cx, cy, err, done = carry
            active = (~done) & (step <= per_point_max)
            hit = (active & (cx >= cs) & (cx < ce) & (cy >= rs) & (cy < re))
            flat = jnp.where(hit, cy * W + cx, C)
            at_end = active & (cx == ix1) & (cy == iy1)
            done = done | at_end
            adv = active & (~at_end)
            e2 = 2 * err
            step_x = adv & (e2 > -ddy)
            step_y = adv & (e2 < ddx)
            err = err - jnp.where(step_x, ddy, 0) + jnp.where(step_y, ddx, 0)
            cx = cx + jnp.where(step_x, sx, 0)
            cy = cy + jnp.where(step_y, sy, 0)
            return (cx, cy, err, done), flat

        # done-init derives from ix0 so its mesh-variance matches the
        # carry output under shard_map (a constant zeros((n,), bool) is
        # axis-unvarying and trips the scan carry type check)
        init = (ix0, iy0, (ddx - ddy).astype(jnp.int32),
                ix0 != ix0)
        steps = jax.lax.broadcasted_iota(jnp.int32, (max_steps, 1), 0)[:, 0]
        _, flats = jax.lax.scan(walk, init, steps)   # (K, B)
        flat_all = flats.reshape(-1)
        if use_val:
            vals_all = jnp.broadcast_to(values[None, :],
                                        flats.shape).reshape(-1)
            s0 = s0.at[flat_all].add(vals_all, mode="drop")
        else:
            s0 = s0.at[flat_all].add(1.0, mode="drop")
        if s1 is not None:
            s1 = s1.at[flat_all].add(1.0, mode="drop")
        return (s0, s1) if nf == 2 else (s0,)

    return update


# ---------------------------------------------------------------------------
# Staged chunks
# ---------------------------------------------------------------------------

@dataclass
class StagedChunk:
    """One device-resident packed chunk plus the jit key that consumes it."""
    key: tuple
    buf: object          # jax.Array (nseg * bucket,) int32
    builder: object      # zero-arg callable building the update fn
    npoints: int


# ---------------------------------------------------------------------------
# TpuEngine — owns device state + compiled update functions for one pipeline
# ---------------------------------------------------------------------------

class TpuEngine:
    """Device-resident accumulation engine for one Pipeline run.

    One instance owns, per ReductionSpec, a tuple of float32 state arrays in
    device HBM — flat (C,) for Point/Line scatter, grid-shaped (H, W) for
    Gaussian matmul splats — plus jit-compiled donated update functions
    keyed by chunk bucket.
    """

    def __init__(self, cfg: GridConfig, plans, device=None):
        import jax
        enable_compilation_cache()
        self.cfg = cfg
        self.plans = plans
        self.device = device or jax.devices()[0]
        self.H = cfg.height
        self.W = cfg.width
        self.C = self.H * self.W
        # Gaussian states are padded to a row-block multiple so the sorted
        # splat's dynamic slices never clamp at the bottom edge.
        self.H_pad = ((self.H + GAUSS_ROW_BLOCK - 1)
                      // GAUSS_ROW_BLOCK) * GAUSS_ROW_BLOCK
        # Pallas fused-splat mode: 'compiled' on real TPUs, 'interpret'
        # for CPU-based validation (PCR_PALLAS=interpret), '0' to disable.
        env = os.environ.get("PCR_PALLAS", "auto")
        if env == "auto":
            self.pallas = ("compiled"
                           if jax.default_backend() == "tpu" else "off")
        elif env in ("1", "compiled"):
            self.pallas = "compiled"
        elif env == "interpret":
            self.pallas = "interpret"
        else:
            self.pallas = "off"
        from .pallas_kernels import padded_width
        self.W_state = (padded_width(self.W) if self.pallas != "off"
                        else self.W)
        self._states = []
        self._grid_shaped = []
        # Point-sum specs default to the fused Pallas splat: with the
        # 3-limb bf16 contraction (exact for one-hot factors) it measures
        # 143 Mpts/s (Sum) / 69 Mpts/s (Average) on v5e at 5M points vs
        # ~53 Mpts/s for XLA scatter. PCR_POINT_PALLAS=0 restores scatter.
        self._point_pallas = (
            self.pallas == "interpret"
            or (self.pallas == "compiled"
                and os.environ.get("PCR_POINT_PALLAS", "1") == "1"))
        # Everything a builder reads is captured here: grid geometry (the
        # builders' only cfg dependencies), the per-spec ReductionInfo
        # singletons (keyed by type), pallas mode, padded shapes, and the
        # point-pallas toggle. Chunk keys carry the remaining statics
        # (bucket, kmax, ...), so (namespace, chunk key) fully determines
        # the traced program.
        b = cfg.bounds
        ns_key = (
            cfg.width, cfg.height, cfg.tile_width, cfg.tile_height,
            float(cfg.cell_size_x), float(cfg.cell_size_y),
            (float(b.min_x), float(b.min_y),
             float(b.max_x), float(b.max_y)) if b is not None else None,
            tuple((spec.glyph.type, info.type, info.state_floats,
                   info.scatter_kind, info.token)
                  for spec, info in plans),
            self.pallas, self.H_pad, self.W_state, self._point_pallas,
            # row-offset shard views (parallel.engine._LocalCfg) bake the
            # offset into tile-clip constants — distinct programs per shard
            getattr(cfg, "row_offset", 0),
            getattr(cfg, "global_height", cfg.height),
        )
        self._jits = _shared_jit_namespace(ns_key)
        # Lazy commit queue: staged chunks accumulate here and materialize
        # as ONE fused jit call at the next state access (or finalize) —
        # on a remote-attached device every dispatch costs a full RTT and
        # the runtime executes synchronously, so deferring lets K ingests
        # and the finalize ride a single dispatch.
        self._pending = []
        self._pending_cap = int(os.environ.get("PCR_PENDING_CAP", 12))
        # Reusable host staging buffers (see _arena): GB-scale np.empty on
        # this VM class faults pages at ~70 MB/s, so a fresh pack buffer
        # costs more than the pack itself (measured 17.0 s fresh vs 2.9 s
        # reused for a 1 GB quad-major pack).
        self._arena_bufs: dict = {}
        self._arena_pending: dict = {}
        from .glyph import GlyphType
        for spec, info in plans:
            self._pending.append([])
            glyph_t = GlyphType(spec.glyph.type)
            # Gaussian splats (and opted-in sum-family Point specs) run the
            # sorted splat over (H_pad, W_state) states; everything else
            # uses flat scatter states.
            grid_shaped = (glyph_t == GlyphType.Gaussian
                           or (glyph_t == GlyphType.Line
                               and self.pallas != "off")
                           or (glyph_t == GlyphType.Point
                               and info.scatter_kind == "sum"
                               and info.builtin
                               and self._point_pallas))
            self._grid_shaped.append(grid_shaped)
            shape = ((self.H_pad, self.W_state) if grid_shaped
                     else (self.C,))
            st = tuple(
                jax.device_put(
                    np.full(shape, info.identity[f], dtype=np.float32),
                    self.device)
                for f in range(info.state_floats))
            self._states.append(st)

    # -- state access ---------------------------------------------------------

    def load_state(self, spec_idx: int, fields_hw) -> None:
        """Replace device state from host (H, W) field arrays (resume)."""
        import jax
        self._pending[spec_idx].clear()   # replaced wholesale
        _, info = self.plans[spec_idx]
        grid_shaped = self._grid_shaped[spec_idx]
        st = []
        for fi, f in enumerate(fields_hw):
            a = np.asarray(f, dtype=np.float32)
            if grid_shaped:
                full = np.full((self.H_pad, self.W_state),
                               info.identity[fi], np.float32)
                full[: self.H, : self.W] = a
                a = full
            else:
                a = a.reshape(-1)
            st.append(jax.device_put(a, self.device))
        self._states[spec_idx] = tuple(st)

    def fetch_state(self, spec_idx: int):
        """Download state to host as a list of (H, W) float32 arrays."""
        self.flush_pending(spec_idx)
        spec, info = self.plans[spec_idx]
        if self._grid_shaped[spec_idx]:
            fields = [np.asarray(f)[: self.H, : self.W]
                      for f in self._states[spec_idx]]
        else:
            fields = [np.asarray(f).reshape(self.H, self.W)
                      for f in self._states[spec_idx]]
        return gauss_state_flush(spec, info, fields, np)

    def finalize_band(self, spec_idx: int) -> np.ndarray:
        """Finalize on device, fetch only the single output band (halves the
        device→host traffic for 2-field states)."""
        import jax
        self.flush_pending(spec_idx)
        spec, info = self.plans[spec_idx]
        key = ("finalize", spec_idx)
        fn = self._jits.get(key)
        if fn is None:
            import jax.numpy as jnp
            fn = jax.jit(lambda st: info.finalize_arrays(
                gauss_state_flush(spec, info, list(st), jnp)))
            self._jits[key] = fn
        band = np.asarray(fn(self._states[spec_idx]))
        if self._grid_shaped[spec_idx]:
            return band[: self.H, : self.W]
        return band.reshape(-1)[: self.C].reshape(self.H, self.W)

    # -- staging ------------------------------------------------------------------

    def _pack(self, bucket: int, segs) -> np.ndarray:
        """Pad each host segment to bucket length and concatenate as i32.

        A segment tuple may carry a third element `divisor`: its padded
        length is then bucket // divisor (sub-word packed segments, e.g.
        the 4-bit line endpoint deltas at divisor 8)."""
        lens = [bucket // (s[2] if len(s) > 2 else 1) for s in segs]
        out = np.empty(sum(lens), dtype=np.int32)
        o = 0
        for s, ln in zip(segs, lens):
            arr, fill = s[0], s[1]
            a = np.asarray(arr)
            if a.dtype == np.float32:
                a = a.view(np.int32)
                fill = np.float32(fill).view(np.int32) if fill else 0
            m = len(a)
            out[o:o + m] = a
            if m < ln:
                out[o + m:o + ln] = fill
            o += ln
        return out

    def _put(self, buf: np.ndarray, arena: str | None = None):
        import jax
        y = jax.device_put(buf, self.device)
        if (arena is not None and arena in self._arena_bufs
                and np.may_share_memory(buf, self._arena_bufs[arena])):
            # the host buffer is arena-backed: remember the device array
            # so the next checkout can block until the transfer finished
            # before the buffer is overwritten (buffers that came from a
            # fresh allocation — CPU backend or numpy fallback — must NOT
            # register: pending would pin an unrelated device array)
            self._arena_pending[arena] = y
        return y

    def _arena(self, name: str, count: int, dtype,
               crosses_device: bool = False) -> np.ndarray:
        """Reusable host scratch buffer (grown geometrically, returned as
        a view of exactly `count` elements). First-touch page faults on
        GB-scale fresh allocations cost ~70 MB/s on this VM class —
        several times the work they back — so staging layouts check
        buffers out of this arena instead of np.empty'ing per call.

        crosses_device=True marks buffers handed to jax.device_put: on
        the CPU backend device_put may alias host memory zero-copy, so
        reuse is disabled there (fresh allocation each time); elsewhere
        the checkout first blocks on the previous put's transfer.
        Engine prepare_* calls are externally serialized (they mutate
        engine state), which is what makes a single buffer per name
        safe."""
        if crosses_device and getattr(self.device, "platform",
                                      "cpu") == "cpu":
            return np.empty(count, dtype)
        pend = self._arena_pending.pop(name, None)
        if pend is not None:
            import jax
            try:
                jax.block_until_ready(pend)
            except Exception:
                pass
        buf = self._arena_bufs.get(name)
        nbytes = count * np.dtype(dtype).itemsize
        if buf is None or buf.nbytes < nbytes:
            buf = np.empty(int(nbytes * 5 // 4) + 256, np.uint8)
            self._arena_bufs[name] = buf
        return buf[:nbytes].view(dtype)

    # -- sorted row-block bucketing (shared by Point and Gaussian fast paths) --

    def _bucket_rowblocks(self, blk0, blk1, block, seg_arrays,
                          layout="seg_major"):
        """Lay entries out row-block-contiguously.

        blk0/blk1: inclusive per-point target block ranges (halo); points
        spanning several blocks are duplicated. Each block's entry run is
        padded to a multiple of `block`. Returns (buf, nsub, E) where buf is
        the packed int32 buffer [seg0 | seg1 | ... | bids] (seg_major, the
        XLA scan layout) or [subchunk0 segs | subchunk1 segs | ... | bids]
        (sub_major, the Pallas layout — which also guarantees every row
        block at least one sub-chunk so every state block gets visited).

        seg_arrays: list of (array, fill) — gathered by entry, padded with
        fill (f32 arrays are bit-viewed into the i32 buffer)."""
        nblocks = self.H_pad // GAUSS_ROW_BLOCK
        n = len(blk0)
        k = (blk1 - blk0 + 1).astype(np.int64)
        if (k == 1).all():
            idx = None   # identity: slots index the source arrays directly
            eb = blk0.astype(np.int64)
        else:
            idx = np.repeat(np.arange(n, dtype=np.int64), k)
            starts = np.zeros(n, np.int64)
            np.cumsum(k[:-1], out=starts[1:])
            eb = blk0[idx] + (np.arange(len(idx), dtype=np.int64)
                              - np.repeat(starts, k))
        return self._layout_blocks(idx, eb, nblocks, block, seg_arrays,
                                   layout)

    def _bucket_blocks_2d(self, rb0, rb1, cb0, cb1, ncb, block, seg_arrays,
                          th: int = GAUSS_ROW_BLOCK):
        """2-D (row-block x col-block) halo bucketing for the Pallas
        two_d splat: entry block id = rb * ncb + cb."""
        n = len(rb0)
        kr = (rb1 - rb0 + 1).astype(np.int64)
        kc = (cb1 - cb0 + 1).astype(np.int64)
        k = kr * kc
        if (k == 1).all():
            idx = None   # identity: slots index the source arrays directly
            eb = rb0.astype(np.int64) * ncb + cb0
        else:
            idx = np.repeat(np.arange(n, dtype=np.int64), k)
            starts = np.zeros(n, np.int64)
            np.cumsum(k[:-1], out=starts[1:])
            o = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, k)
            kc_e = kc[idx]
            eb = ((rb0[idx] + o // kc_e) * ncb + (cb0[idx] + o % kc_e))
        nblocks = (self.H_pad // th) * ncb
        return self._layout_blocks(idx, eb, nblocks, block, seg_arrays,
                                   "sub_major")

    def _bucket_blocks_2d_packed(self, rlo, rhi, wlo, whi, ncb, block,
                                 seg_arrays, th):
        """Quarter-interleaved 2-D bucketing for the packed rot splat
        (pallas_kernels.build_rot_packed_pallas): entries are duplicated
        per (th-row-block x 32-col-quarter) their clipped window
        [wlo, whi] x [rlo, rhi] touches, and laid out slot-major: within
        a sub-chunk, lane-slot j (quarter index mod 4) owns entry run
        [j*G, (j+1)*G), entries pairing across slots by rank into packed
        groups — the kernel's 4 slots then map straight onto the state
        tile's 32-lane quarters.  Per (row-block, col-block) bucket the
        four quarter lists are zipped with dead-slot padding to the
        longest, so group count = max quarter count (ragged quarters
        cost padding, never correctness)."""
        n = len(rlo)
        ncq = ncb * 4
        nbc = (self.H_pad // th) * ncb
        G = block // 4
        from .. import native
        if native.available():
            # fused two-pass native layout: the histogram comes straight
            # off the per-point ranges and placement iterates points in
            # order (identical to the stable-argsort layout below, but
            # with no E-length intermediates — the numpy path's ~10
            # int64 passes plus radix sort cost minutes at 5M points on
            # a 1-core host, mostly first-touch page faults)
            cf = native.rotp_counts(rlo, rhi, wlo, whi, th, ncb, nbc)
            maxq = cf.max(axis=1)
            ng_b = np.maximum(-(-maxq // G), 1) * G  # groups per block
            subs_b = ng_b // G
            nsub_real = int(subs_b.sum())
            nsub = _nsub_bucket(max(nsub_real, 1,
                                    getattr(self, "_nsub_floor", 1)))
            E = nsub * block
            base_b = np.zeros(nbc, np.int64)
            np.cumsum(ng_b[:-1] * 4, out=base_b[1:])  # entry offsets
            slots = self._arena("rotp_slots", E, np.int64)
            native.rotp_place(rlo, rhi, wlo, whi, th, ncb, nbc, base_b,
                              G, block, slots)
            bids = np.zeros(nsub, np.int32)
            bids[:nsub_real] = np.repeat(
                np.arange(nbc, dtype=np.int32), subs_b)
            if nsub_real < nsub:             # ladder pad: extend last run
                bids[nsub_real:] = bids[max(nsub_real - 1, 0)]
            nseg = len(seg_arrays)
            buf = self._arena("rotp_buf", nseg * E + nsub, np.int32,
                              crosses_device=True)
            native.pack_sub_major(slots, None, seg_arrays, nsub,
                                  block, out=buf[: nseg * E], quad=True)
            buf[nseg * E:] = bids
            return buf, nsub, E
        rb0 = np.clip(rlo.astype(np.int64) // th, 0, None)
        rb1 = np.maximum(rhi.astype(np.int64) // th, rb0)
        qb0 = np.clip(wlo.astype(np.int64) // 32, 0, None)
        qb1 = np.maximum(whi.astype(np.int64) // 32, qb0)
        kr = rb1 - rb0 + 1
        kq = qb1 - qb0 + 1
        k = kr * kq
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        starts = np.zeros(n, np.int64)
        np.cumsum(k[:-1], out=starts[1:])
        o = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, k)
        kq_e = kq[idx]
        rb = rb0[idx] + o // kq_e
        q = qb0[idx] + o % kq_e
        fine = rb * ncq + q                  # (coarse block) * 4 + slot
        order = np.argsort(fine, kind="stable")
        sf = fine[order]
        cf = np.bincount(sf, minlength=nbc * 4).reshape(nbc, 4)
        maxq = cf.max(axis=1)
        ng_b = np.maximum(-(-maxq // G), 1) * G      # groups per block
        subs_b = ng_b // G
        nsub_real = int(subs_b.sum())
        nsub = _nsub_bucket(max(nsub_real, 1,
                                getattr(self, "_nsub_floor", 1)))
        E = nsub * block
        base_b = np.zeros(nbc, np.int64)
        np.cumsum(ng_b[:-1] * 4, out=base_b[1:])     # entry offsets
        fstarts = np.zeros(nbc * 4, np.int64)
        np.cumsum(cf.reshape(-1)[:-1], out=fstarts[1:])
        srank = np.arange(len(sf), dtype=np.int64) - fstarts[sf]
        # slot-major within each sub-chunk: slot j at [j*G, (j+1)*G)
        pos = (base_b[sf >> 2] + (srank // G) * block
               + (sf & 3) * G + srank % G)
        slots_src = np.full(E, -1, np.int64)
        slots_src[pos] = idx[order]
        bids = np.zeros(nsub, np.int32)
        bids[:nsub_real] = np.repeat(
            np.arange(nbc, dtype=np.int32), subs_b)
        if nsub_real < nsub:                 # ladder pad: extend last run
            bids[nsub_real:] = bids[max(nsub_real - 1, 0)]
        live = slots_src >= 0
        sel = np.maximum(slots_src, 0)
        return self._pack_layout(sel, live, bids, nsub, E, block,
                                 seg_arrays, "quad_major")

    def _layout_blocks(self, idx, eb, nblocks, block, seg_arrays, layout):
        visit_all = layout == "sub_major"
        from .. import native
        if native.available():
            # native counting-sort layout: one pass count + one pass place
            # (the slow throttled host makes numpy argsort paths minutes
            # on 50M+ halo entries)
            floor = getattr(self, "_nsub_floor", 1)
            slots, bids, nsub = native.bucket_layout(
                eb, nblocks, block, visit_all,
                lambda k, f=floor: _nsub_bucket(max(k, f)))
            E = nsub * block
            if layout == "sub_major":
                # fused native gather+fill+transpose straight into the
                # packed buffer (a numpy chain here costs ~4s per 5M pts)
                nseg = len(seg_arrays)
                buf = np.empty(nseg * E + nsub, dtype=np.int32)
                native.pack_sub_major(slots, idx, seg_arrays, nsub, block,
                                      out=buf[: nseg * E])
                buf[nseg * E:] = bids
                return buf, nsub, E
            sel = (np.maximum(slots, 0) if idx is None
                   else idx[np.maximum(slots, 0)])
            live = slots >= 0
            return self._pack_layout(sel, live, bids, nsub, E, block,
                                     seg_arrays, layout)

        # numpy fallback: per-block extraction for few blocks, stable
        # (radix) argsort otherwise
        if idx is None:
            idx = np.arange(len(eb), dtype=np.int64)
        if nblocks <= 16:
            per_block = [idx[eb == b] for b in range(nblocks)]
            idx_s = np.concatenate(per_block) if nblocks > 1 else idx
            counts = np.array([len(p) for p in per_block], dtype=np.int64)
        else:
            order = np.argsort(eb, kind="stable")
            idx_s = idx[order]
            counts = np.bincount(eb[order], minlength=nblocks)

        per_block_subs = (counts + block - 1) // block
        if visit_all:
            per_block_subs = np.maximum(per_block_subs, 1)
        nsub_real = int(per_block_subs.sum())
        # _nsub_floor: the sharded engine forces a common nsub across sp
        # shards so per-shard buffers stack into one mesh array
        nsub = _nsub_bucket(max(nsub_real, 1,
                                getattr(self, "_nsub_floor", 1)))
        E = nsub * block
        slots = np.full(E, -1, np.int64)
        bids = np.zeros(nsub, np.int32)
        pos = 0
        epos = 0
        for bidx in range(nblocks):
            c = int(counts[bidx])
            pc = int(per_block_subs[bidx]) * block
            if pc == 0:
                continue
            slots[epos:epos + c] = np.arange(pos, pos + c)
            bids[epos // block:(epos + pc) // block] = bidx
            pos += c
            epos += pc

        # Trailing nsub-ladder pad sub-chunks must extend the LAST block's
        # run: a smaller bid would break the ascending-bids contract and
        # make the Pallas kernel re-initialise that block from stale input
        # state (wiping this call's accumulation).
        if epos // block < nsub:
            last_bid = bids[max(epos // block - 1, 0)]
            bids[epos // block:] = last_bid

        sel = idx_s[np.maximum(slots, 0)]
        live = slots >= 0
        return self._pack_layout(sel, live, bids, nsub, E, block,
                                  seg_arrays, layout)

    def _pack_layout(self, sel, live, bids, nsub, E, block, seg_arrays,
                     layout):
        all_live = bool(live.all())
        nseg = len(seg_arrays)
        buf = np.empty(nseg * E + nsub, dtype=np.int32)
        gathered = []
        for i, (arr, fill) in enumerate(seg_arrays):
            a = np.asarray(arr)[sel]
            if not all_live:
                a = np.where(live, a, np.asarray(fill, a.dtype))
            if a.dtype != np.int32:
                a = (a.astype(np.float32).view(np.int32)
                     if a.dtype.kind == "f" else a.astype(np.int32))
            gathered.append(a)
        if layout == "sub_major":
            params = np.stack(gathered)            # (nseg, E)
            buf[: nseg * E] = np.ascontiguousarray(
                params.reshape(nseg, nsub, block).transpose(1, 0, 2)
            ).reshape(-1)
        elif layout == "quad_major":
            # packed rot splat: [sub][slot(4)][seg][G] so the kernel can
            # flatten (4, nseg, G) -> (4, nseg*G) for ONE selection matmul
            params = np.stack(gathered)            # (nseg, E), slot-major
            buf[: nseg * E] = np.ascontiguousarray(
                params.reshape(nseg, nsub, 4, block // 4)
                .transpose(1, 2, 0, 3)).reshape(-1)
        else:
            for i, a in enumerate(gathered):
                buf[i * E:(i + 1) * E] = a
        buf[nseg * E:] = bids
        return buf, nsub, E

    def _pallas_builder(self, info, nsub, block, TH, point_mode, with_f1,
                        nseg, E, two_d=False, wt=None, corr_offsets=()):
        """Zero-arg builder producing the fused Pallas update closed over a
        single packed [params | bids] buffer."""
        interpret = self.pallas == "interpret"
        cfg = self.cfg

        h_pad = self.H_pad

        def build():
            from .pallas_kernels import (build_rot_packed_pallas,
                                         build_sorted_splat_pallas)
            if point_mode == "rotp":
                upd = build_rot_packed_pallas(info, cfg, nsub, block, TH,
                                              interpret, h_pad=h_pad)
            else:
                upd = build_sorted_splat_pallas(
                    info, cfg, nsub, block, TH, point_mode, with_f1,
                    interpret, two_d=two_d, wt=wt, h_pad=h_pad,
                    corr_offsets=corr_offsets)

            def fn(states, buf):
                params_2d = buf[: nseg * E].reshape(nsub, nseg * block)
                bids = buf[nseg * E:]
                return upd(states, params_2d, bids)

            return fn

        return build

    def _point_fields(self, info, values, weights, n):
        """Host-side field contributions (f0, f1|None) for sum-family ops."""
        rtype = ReductionType(info.type)
        values = np.asarray(values, dtype=np.float32)
        if rtype == ReductionType.Sum:
            return values, None
        if rtype == ReductionType.Count:
            return np.ones(n, np.float32), None
        if rtype == ReductionType.Average:
            # count field comes free from the implicit one-hot column
            return values, None
        # WeightedAverage
        w = (np.asarray(weights, np.float32) if weights is not None
             else np.ones(n, np.float32))
        return values * w, w

    def prepare_point(self, spec_idx: int, cells,
                      valid: np.ndarray, values: np.ndarray,
                      weights=None, timestamps=None, block: int = 4_096,
                      wire_cheap: bool = False, col=None, row=None):
        """Stage Point-glyph chunks.

        Sum-family ops go through the row-block-sorted one-hot matmul (the
        MXU path); Max/Min/MostRecent use XLA scatter with invalid points
        encoded as cell == C. wire_cheap=True (host-sourced ingest) skips
        the host bucketing and ships the minimal [cells | fields] layout
        into a grid-shaped scatter — on a thin host link the wire, not the
        accumulate, bounds throughput (PCR_WIRE_CHEAP=0 disables). Callers
        may pass col/row instead of flat cells; with the native library the
        whole flatten+sentinel+field+pad chain then runs as one C pass."""
        _, info = self.plans[spec_idx]
        n = len(cells) if cells is not None else len(col)
        wire_cheap = (wire_cheap and info.scatter_kind == "sum"
                      and info.builtin and self._point_pallas
                      and os.environ.get("PCR_WIRE_CHEAP", "1") == "1")
        if wire_cheap:
            from .. import native
            rtype = ReductionType(info.type)
            mode = {ReductionType.Count: 1,
                    ReductionType.WeightedAverage: 2}.get(rtype, 0)
            with_f1 = mode == 2
            if col is not None and native.available():
                # fused native pack straight from the shared assignment
                staged = []
                for start, end in chunk_ranges(n):
                    b = bucket_size(end - start)
                    buf = native.pack_point_wire(
                        col, row, valid, values, weights, start, end, b,
                        self.W, self.C, mode)
                    key = ("point_grid", spec_idx, b, with_f1)
                    builder = (lambda info=info, b=b, wf1=with_f1:
                               _build_point_update_grid(
                                   info, self.H_pad, self.W_state, self.W,
                                   self.C, b, wf1))
                    staged.append(StagedChunk(key, self._put(buf), builder,
                                              end - start))
                return staged
            if cells is None:
                cells = row * np.int32(self.W) + col
            f0, f1 = self._point_fields(info, values, weights, n)
            cells = np.where(valid, cells, np.int32(self.C)).astype(np.int32)
            staged = []
            for start, end in chunk_ranges(n):
                b = bucket_size(end - start)
                segs = [(cells[start:end], self.C), (f0[start:end], 0)]
                if with_f1:
                    segs.append((f1[start:end], 0))
                key = ("point_grid", spec_idx, b, with_f1)
                builder = (lambda info=info, b=b, wf1=with_f1:
                           _build_point_update_grid(
                               info, self.H_pad, self.W_state, self.W,
                               self.C, b, wf1))
                staged.append(StagedChunk(
                    key, self._put(self._pack(b, segs)), builder,
                    end - start))
            return staged
        # Point glyphs default to XLA scatter (measured ~53 Mpts/s for a
        # 2-field Average on v5e): the Pallas one-hot matmul is limited to
        # HIGHEST precision by Mosaic's dot lowering (6-pass bf16) and lands
        # at ~28 Mpts/s. PCR_POINT_PALLAS=1 opts points into the kernel.
        if info.scatter_kind == "sum" and info.builtin \
                and self._point_pallas:
            block = min(block, PALLAS_BLOCK)   # bounded by scoped VMEM
            TH = GAUSS_ROW_BLOCK
            if col is None:
                col = (cells % np.int32(self.W)).astype(np.int32)
                row = (cells // np.int32(self.W)).astype(np.int32)
            col = np.where(valid, col, np.int32(-1))
            row = np.where(valid, row, np.int32(-1))
            f0, f1 = self._point_fields(info, values, weights, n)
            with_f1 = f1 is not None
            segs = [(col, -1), (row, -1), (f0, 0)]
            if with_f1:
                segs.append((f1, 0))
            # 2-D bucketing: each grid step contracts against one (TH, CT)
            # state block instead of the full padded width — on wide grids
            # (e.g. 8192 cols) the 1-D layout cost 32 column tiles per step
            from .pallas_kernels import col_tile, padded_width
            WT = col_tile(self.W)
            ncb = padded_width(self.W) // WT
            rb = np.maximum(row, 0) // TH
            cb = np.maximum(col, 0) // WT
            buf, nsub, E = self._bucket_blocks_2d(rb, rb, cb, cb, ncb,
                                                  block, segs)
            key = ("pallas_point2d", spec_idx, nsub, block, TH, with_f1)
            builder = self._pallas_builder(info, nsub, block, TH, True,
                                           with_f1, len(segs), E,
                                           two_d=True)
            return [StagedChunk(key, self._put(buf), builder, n)]

        # scatter path (max/min/argmax_ts)
        if cells is None:
            cells = row * np.int32(self.W) + col
        cells = np.where(valid, cells, np.int32(self.C)).astype(np.int32)
        values = np.asarray(values, dtype=np.float32)
        staged = []
        for start, end in chunk_ranges(n):
            b = bucket_size(end - start)
            segs = [(cells[start:end], self.C), (values[start:end], 0)]
            if info.uses_weight:
                w = (np.asarray(weights[start:end], np.float32)
                     if weights is not None
                     else np.ones(end - start, np.float32))
                segs.append((w, 0))
            if info.uses_timestamp:
                t = (np.asarray(timestamps[start:end], np.float32)
                     if timestamps is not None
                     else np.full(end - start, -FLT_MAX, np.float32))
                segs.append((t, 0))
            key = ("point", spec_idx, b)
            builder = (lambda info=info, b=b:
                       _build_point_update_packed(info, self.C, b))
            staged.append(StagedChunk(key, self._put(self._pack(b, segs)),
                                      builder, end - start))
        return staged

    # -- host-sourced (hybrid) glyph wire paths -------------------------------

    def _wire_ok(self, info) -> bool:
        """Minimal-wire hybrid glyphs need the Pallas splat, a sum-family
        op, and i16-packable cell coordinates."""
        return (self.pallas != "off"
                and info.scatter_kind == "sum"
                and self.W <= 32000 and self.H <= 32000
                and os.environ.get("PCR_WIRE_CHEAP", "1") == "1")

    @staticmethod
    def _wire_ladder(k: int) -> int:
        """Power-of-2 ladder for data-dependent sizes that feed jit keys."""
        b = 1
        while b < k:
            b <<= 1
        return b

    def _prepare_gaussian_wire(self, spec_idx: int, gp, valid, values):
        """Hybrid Gaussian ingest: ship 12 B/point (16-20 with per-point
        sigma), expand + bucket on DEVICE (device_prep), run the same
        fused splat as the staged path. See device_prep module docs."""
        from .device_prep import pack_u16_pair
        n = len(values)
        values = np.asarray(values, dtype=np.float32)
        rot = bool(gp.rotated)
        # small-sigma chunks take the dense decode for the same reason the
        # staged path does: only it implements the product weight cutoff —
        # except mildly-small UNIFORM sigmas, which stay separable with
        # the exact-cancellation correction pass (gauss_corr_offsets)
        dense = rot or (valid.any() and gauss_product_cutoff_bites(
            gp.r[valid], gp.sx[valid], gp.sy[valid]))
        # uniform-shape detection: no per-point segments when every point
        # shares sigma/rotation (the common default_sigma case)
        uniform = bool(n == 0 or (
            (gp.sx == gp.sx.flat[0]).all()
            and (gp.sy == gp.sy.flat[0]).all()
            and (gp.cos_rot == gp.cos_rot.flat[0]).all()
            and (gp.sin_rot == gp.sin_rot.flat[0]).all()))
        if rot and not uniform:
            return None   # per-point rotated: host path
        corr = ()
        if dense and not rot and uniform and valid.any():
            offs = gauss_corr_offsets(int(gp.r[valid].max()),
                                      gp.sx[valid].flat[0],
                                      gp.sy[valid].flat[0])
            if offs is not None:
                corr = offs
                dense = False
        rmax = self._wire_ladder(
            max(int(gp.r[valid].max()) if valid.any() else 1, 1))
        nsig = 0 if uniform else 2
        icxy = pack_u16_pair((np.where(valid, gp.icx, -32768)
                              & 0xFFFF).astype(np.int64),
                             (np.where(valid, gp.icy, 0)
                              & 0xFFFF).astype(np.int64))
        subq = pack_u16_pair(
            np.round(gp.sub_cx * np.float32(65535.0)).astype(np.int64),
            np.round(gp.sub_cy * np.float32(65535.0)).astype(np.int64))
        scal = {
            "max_radius": float(self.plans[spec_idx][0].glyph
                                .max_radius_cells),
        }
        if uniform and n:
            scal["sx"] = float(gp.sx.flat[0])
            scal["sy"] = float(gp.sy.flat[0])
        if dense and n:
            # rotation is uniform here (0 when merely small-sigma)
            scal["cos_rot"] = float(gp.cos_rot.flat[0]) if rot else 1.0
            scal["sin_rot"] = float(gp.sin_rot.flat[0]) if rot else 0.0

        def pack_chunk(start, end, b):
            sl = slice(start, end)
            segs = [(icxy[sl], np.int32(-32768 << 16)),
                    (subq[sl], 0), (values[sl], 0)]
            if nsig:
                segs += [(gp.sx[sl], 1.0), (gp.sy[sl], 1.0)]
            return self._pack(b, segs)

        return self._gauss_wire_emit(spec_idx, n, dense, rmax, nsig, scal,
                                     pack_chunk, corr=corr)

    def prepare_gaussian_raw(self, spec_idx: int, glyph, x, y, valid,
                             values):
        """Uniform-shape hybrid Gaussian fast path: one fused native pass
        from raw f64 world coords to the wire buffer, skipping
        routing.gaussian_params entirely (its ~20 numpy passes dominate
        hybrid ingest on a 1-core steal-jittery host). Byte-identical
        wire and identical jit keys to _prepare_gaussian_wire, so the two
        paths share compiled executables. Returns None when unsupported
        (caller falls back to the gp-based path)."""
        from .. import native
        _, info = self.plans[spec_idx]
        if not (self._wire_ok(info) and native.available()
                and os.environ.get("PCR_WIRE_NATIVE", "1") == "1"):
            return None
        # scalar glyph params, computed with the numpy path's exact f32
        # arithmetic (routing.gaussian_params on constant arrays)
        inv_csx = 1.0 / self.cfg.cell_size_x
        inv_csy = 1.0 / self.cfg.cell_size_y
        sx = np.float32(glyph.default_sigma_x) * np.float32(inv_csx)
        sy = np.float32(glyph.default_sigma_y) * np.float32(inv_csy)
        rot_a = np.float32(glyph.default_rotation)
        rotated = bool((rot_a != 0.0) and (np.abs(sx) != np.abs(sy)))
        R = np.minimum(np.float32(3.0) * np.maximum(sx, sy),
                       np.float32(glyph.max_radius_cells))
        r = int(np.ceil(R).astype(np.int32))
        # dense decode when rotated OR when the product cutoff bites the
        # square window (small sigma) — unless the uniform corr pass can
        # keep it separable (gauss_corr_offsets)
        corr = ()
        dense = rotated or gauss_product_cutoff_bites(r, sx, sy)
        if dense and not rotated:
            offs = gauss_corr_offsets(r, sx, sy)
            if offs is not None:
                corr = offs
                dense = False
        if dense and self.pallas == "off":
            return None
        n = len(values)
        values = np.asarray(values, dtype=np.float32)
        rmax = self._wire_ladder(max(r if valid.any() else 1, 1))
        scal = {"max_radius": float(glyph.max_radius_cells)}
        if n:
            scal["sx"] = float(sx)
            scal["sy"] = float(sy)
            if dense:
                scal["cos_rot"] = (float(np.cos(-rot_a))
                                   if rotated else 1.0)
                scal["sin_rot"] = (float(np.sin(-rot_a))
                                   if rotated else 0.0)

        def pack_chunk(start, end, b):
            return native.gauss_wire_pack(self.cfg, x, y, valid, values,
                                          start, end, b)

        return self._gauss_wire_emit(spec_idx, n, dense, rmax, 0, scal,
                                     pack_chunk, corr=corr)

    def _gauss_wire_emit(self, spec_idx: int, n: int, rot: bool, rmax: int,
                         nsig: int, scal: dict, pack_chunk, corr=()):
        """Shared tail of the Gaussian wire paths: chunking, jit keys,
        builders. pack_chunk(start, end, bucket) -> packed host buffer."""
        from .device_prep import gaussian_wire_builder
        from .pallas_kernels import gauss_col_tile, padded_width
        _, info = self.plans[spec_idx]
        TH = ROT_ROW_BLOCK if rot else GAUSS_ROW_BLOCK
        WT = ROT_COL_TILE if rot else gauss_col_tile(self.W, rmax)
        kmax = ((2 * rmax) // TH + 2) * ((2 * rmax) // WT + 2)
        nrb = self.H_pad // TH
        ncb = padded_width(self.W) // WT
        nblocks = nrb * ncb
        block = min(PALLAS_BLOCK, 2048)
        # 16M halo entries of device sort working set (~400 MB transient HBM)
        # before a chunk is split: large-radius glyphs (kmax 8 at sigma=16)
        # amortize the sort much better in 2M-point chunks than 1M
        # (measured 2.98 -> 3.66 Mpts/s hybrid @5M); smaller-kmax glyphs
        # are already capped by the 2M bucket ladder.
        budget = int(os.environ.get("PCR_WIRE_ENTRY_BUDGET", 16 << 20))
        max_pts = max(budget // kmax, CHUNK_BUCKETS[0])
        staged = []
        for start, end in chunk_ranges(n, cap=max_pts):
            b = bucket_size(min(end - start, max_pts))
            nsub_pad = -(-b * kmax // block) + nblocks
            key = ("gauss_wire", spec_idx, b, kmax, TH, WT, nsig, rot,
                   corr,
                   tuple(sorted((k, round(v, 9))
                                for k, v in scal.items())))
            builder = (lambda info=info, b=b, kmax=kmax, TH=TH, WT=WT,
                       nsub_pad=nsub_pad, blk=block, scal=dict(scal),
                       nsig=nsig, rot=rot, corr=corr:
                       gaussian_wire_builder(
                           info, self.cfg, b, kmax, TH, WT, nsub_pad, blk,
                           self.H_pad, scal, nsig, rot,
                           self.pallas == "interpret", corr=corr)())
            staged.append(StagedChunk(key, self._put(pack_chunk(start, end,
                                                                b)),
                                      builder, end - start))
        return staged

    def _prepare_line_wire(self, spec_idx: int, lp, valid, values,
                           col, row):
        """Hybrid Line ingest: ship exact integer endpoints (12-16 B/pt),
        rebuild the staircase runs + bucket layout on DEVICE, run the
        rect-mode splat. Exact footprint; values match the staged path
        to the last ulp."""
        from .device_prep import pack_u16_pair
        n = len(values)
        values = np.asarray(values, dtype=np.float32)
        if (max(abs(int(lp.ix0.min() if n else 0)),
                abs(int(lp.ix1.max() if n else 0)),
                abs(int(lp.iy0.min() if n else 0)),
                abs(int(lp.iy1.max() if n else 0))) >= 32000):
            return None
        ddx = np.abs(lp.ix1.astype(np.int64) - lp.ix0)
        ddy = np.abs(lp.iy1.astype(np.int64) - lp.iy0)
        dmaj = np.maximum(ddx, ddy)
        nruns = np.where(valid, np.minimum(ddx, ddy) + 1, 0)
        runlen_max = int(dmaj.max()) + 1 if n else 1
        e0 = pack_u16_pair((lp.ix0 & 0xFFFF).astype(np.int64),
                           (np.where(valid, lp.iy0, -32768)
                            & 0xFFFF).astype(np.int64))
        e1 = pack_u16_pair((lp.ix1 & 0xFFFF).astype(np.int64),
                           (lp.iy1 & 0xFFFF).astype(np.int64))
        return self._line_wire_emit(spec_idx, n, values, e0, e1, nruns,
                                    runlen_max, col, row)

    def prepare_line_raw(self, spec_idx: int, glyph, x, y, valid, values,
                         col, row):
        """Uniform-shape hybrid Line fast path: one fused native pass from
        raw f64 world coords to packed endpoints + run counts, skipping
        routing.line_params (~15 numpy passes). The single direction's
        cos/sin are computed here with numpy so endpoint bits match the
        numpy/staged path exactly; identical jit keys. Returns None when
        unsupported (caller falls back to the lp-based path)."""
        from .. import native
        _, info = self.plans[spec_idx]
        if not (self._wire_ok(info) and native.available()
                and os.environ.get("PCR_WIRE_NATIVE", "1") == "1"):
            return None
        n = len(values)
        values = np.asarray(values, dtype=np.float32)
        # scalar endpoint params with routing.line_params' f32 arithmetic
        inv_csx = 1.0 / self.cfg.cell_size_x
        inv_csy = 1.0 / self.cfg.cell_size_y
        cap = np.float32(glyph.max_radius_cells)
        hl = np.float32(glyph.default_half_length)
        hx = np.minimum(hl * np.float32(inv_csx), cap)
        hy = np.minimum(hl * np.float32(inv_csy), cap)
        d = np.float32(glyph.default_direction)
        cos_d = np.cos(d).astype(np.float32)
        sin_d = np.sin(d).astype(np.float32)
        e0, e1, nruns, max_abs, max_dmaj = native.line_endpoints(
            self.cfg, x, y, valid, float(hx), float(hy), float(cos_d),
            float(sin_d))
        if max_abs >= 32000:
            return None
        runlen_max = max_dmaj + 1 if n else 1
        return self._line_wire_emit(spec_idx, n, values, e0, e1,
                                    nruns.astype(np.int64), runlen_max,
                                    col, row)

    def _line_wire_emit(self, spec_idx: int, n: int, values, e0, e1,
                        nruns, runlen_max: int, col, row):
        """Shared tail of the Line wire paths: run-budget chunking, jit
        keys, builders.

        When every live line's endpoint delta (ix1-ix0, iy1-iy0) spans at
        most 4 values per axis — always true for uniform direction and
        half-length, where the delta is a floor-jittered constant — the
        second endpoint rides the wire as a 4-bit code (8 lines per i32)
        instead of a full word: 12 B/line drops to ~8.5 B/line on the
        wire-bound hybrid path, reconstructed exactly on device."""
        from .device_prep import line_wire_builder, pack_u16_pair
        from .pallas_kernels import padded_width, rect_col_tile
        _, info = self.plans[spec_idx]
        TH = GAUSS_ROW_BLOCK
        WT = rect_col_tile(self.W)
        nrb = self.H_pad // TH
        ncb = padded_width(self.W) // WT
        nblocks = nrb * ncb
        block = PALLAS_BLOCK
        multi_tile = self.cfg.total_tiles() > 1
        jmax = max(runlen_max // WT, runlen_max // TH) + 2
        # 16M halo entries of device sort working set (~400 MB transient HBM)
        # before a chunk is split: large-radius glyphs (kmax 8 at sigma=16)
        # amortize the sort much better in 2M-point chunks than 1M
        # (measured 2.98 -> 3.66 Mpts/s hybrid @5M); smaller-kmax glyphs
        # are already capped by the 2M bucket ladder.
        budget = int(os.environ.get("PCR_WIRE_ENTRY_BUDGET", 16 << 20))
        run_cap = max(budget // jmax, 1 << 16)
        ctr = (pack_u16_pair((col & 0xFFFF).astype(np.int64),
                             (row & 0xFFFF).astype(np.int64))
               if multi_tile else None)
        # signed endpoint deltas (i32 >> 16 sign-extends the high half;
        # the low half sign-extends through int16)
        ix0 = e0 >> 16
        iy0 = (e0 & 0xFFFF).astype(np.uint16).view(np.int16).astype(
            np.int32)
        dx = (e1 >> 16) - ix0
        dy = ((e1 & 0xFFFF).astype(np.uint16).view(np.int16).astype(
            np.int32) - iy0)
        live = iy0 != -32768
        deltas = None
        if (live.any()
                and os.environ.get("PCR_LINE_DELTA_WIRE", "1") == "1"):
            dxl, dyl = dx[live], dy[live]
            dminx, dminy = int(dxl.min()), int(dyl.min())
            if (int(dxl.max()) - dminx <= 3
                    and int(dyl.max()) - dminy <= 3):
                codes = (((dx - dminx) & 3)
                         | (((dy - dminy) & 3) << 2)).astype(np.uint32)
                deltas = (codes, dminx, dminy)
        # Uniform-shape static fast path: with the delta wire's <=4-value
        # endpoint-delta guarantee, every live line's run count sits
        # within 3 of the max, so run slots can be the static
        # (B, jr_max) broadcast — the device update drops the run-count
        # cumsum and the scatter+cumsum propagation pass (159 of 194 ms
        # at 2M points on v5e) for <=3 dead slots per line of extra sort
        # width. PCR_LINE_STATIC_RUNS=0 restores the packed-stream path.
        if (deltas is not None
                and os.environ.get("PCR_LINE_STATIC_RUNS", "1") == "1"):
            jr_max = int(nruns[live].max()) if live.any() else 1
            codes, dminx, dminy = deltas
            ptcap = max(budget // (jr_max * jmax), 1 << 16)
            staged = []
            for start, end in chunk_ranges(n, cap=ptcap):
                b = bucket_size(end - start)
                sl = slice(start, end)
                c = codes[sl]
                pad = (-len(c)) % 8
                if pad:
                    c = np.concatenate([c, np.zeros(pad, np.uint32)])
                cw = c.reshape(-1, 8)
                dw = np.zeros(len(cw), np.uint32)
                for kk in range(8):
                    dw |= cw[:, kk] << np.uint32(4 * kk)
                segs = [(e0[sl], np.int32(-32768 & 0xFFFF)),
                        (values[sl], 0), (dw.view(np.int32), 0, 8)]
                if multi_tile:
                    segs.insert(0, (ctr[sl], 0))
                rme = b * jr_max
                nsub_pad = -(-rme * jmax // block) + nblocks
                key = ("line_wire_static", spec_idx, b, jmax, jr_max,
                       multi_tile, (dminx, dminy))
                builder = (lambda info=info, b=b, jmax=jmax, rme=rme,
                           nsub_pad=nsub_pad, mt=multi_tile,
                           pd=(dminx, dminy), jr=jr_max:
                           line_wire_builder(
                               info, self.cfg, b, jmax, rme, TH, WT,
                               nsub_pad, PALLAS_BLOCK, self.H_pad,
                               self.pallas == "interpret", mt,
                               packed_deltas=pd, uniform_jr=jr)())
                staged.append(StagedChunk(key,
                                          self._put(self._pack(b, segs)),
                                          builder, end - start))
            return staged
        # chunk so each chunk's REAL run count fits the entry budget
        cum = np.concatenate([[0], np.cumsum(nruns)])
        staged = []
        start = 0
        while start < n:
            # largest end with runs(start:end) <= run_cap and pts <= ladder
            hi = int(np.searchsorted(cum, cum[start] + run_cap,
                                     side="right")) - 1
            end = max(min(hi, start + CHUNK_BUCKETS[-1]), start + 1)
            b = bucket_size(end - start)
            sl = slice(start, end)
            r_chunk = int(cum[end] - cum[start])
            rmax_entries = self._wire_ladder(max(r_chunk, 1 << 12))
            nsub_pad = -(-rmax_entries * jmax // block) + nblocks
            if deltas is not None:
                codes, dminx, dminy = deltas
                c = codes[sl]
                pad = (-len(c)) % 8
                if pad:
                    c = np.concatenate([c, np.zeros(pad, np.uint32)])
                cw = c.reshape(-1, 8)
                dw = np.zeros(len(cw), np.uint32)
                for kk in range(8):
                    dw |= cw[:, kk] << np.uint32(4 * kk)
                segs = [(e0[sl], np.int32(-32768 & 0xFFFF)),
                        (values[sl], 0), (dw.view(np.int32), 0, 8)]
                pd = (dminx, dminy)
            else:
                segs = [(e0[sl], np.int32(-32768 & 0xFFFF)),
                        (e1[sl], 0), (values[sl], 0)]
                pd = None
            if multi_tile:
                segs.insert(0, (ctr[sl], 0))
            key = ("line_wire", spec_idx, b, jmax, rmax_entries,
                   multi_tile, pd)
            builder = (lambda info=info, b=b, jmax=jmax,
                       rme=rmax_entries, nsub_pad=nsub_pad,
                       mt=multi_tile, pd=pd:
                       line_wire_builder(
                           info, self.cfg, b, jmax, rme, TH, WT,
                           nsub_pad, PALLAS_BLOCK, self.H_pad,
                           self.pallas == "interpret", mt,
                           packed_deltas=pd)())
            staged.append(StagedChunk(key, self._put(self._pack(b, segs)),
                                      builder, end - start))
            start = end
        return staged

    @staticmethod
    def _rot_quadratic_segs(gp, f0):
        """Completed-square coefficients of the rotated-Gaussian
        quadratic form, shared bit-for-bit by the packed (rotp) and
        dense (rot2) splat stagings — their cross-kernel parity contract
        requires identical coefficient bits, so both build from this one
        fold. Same algebra as glyph_kernels.cu:145-176 (qx=(dx*cos
        - dy*sin)/sx, qy=(dx*sin + dy*cos)/sy): with c1=cos/sx,
        c2=-sin/sx, c3=sin/sy, c4=cos/sy (each carrying a 1/sqrt(2) fold
        so q2 IS the exponent),

            q2 = A dx^2 + 2B dx dy + C dy^2
               = (sqrt(A - B^2/C) dx)^2 + (sqrt(C) (dy + (B/C) dx))^2

        which splits per kernel axis: the dx half is lane-only.
        sqrt(log2 e) rides the square-root coefficients so the kernel
        evaluates exp2(-q2') directly (saves the exp lowering's internal
        x*log2e per cell); the kernels scale their cutoff constant to
        ln(1e6)*log2e to match. Returns the first six seg arrays
        [-ctr_x, -ctr_y, B/C, sqrt(C)*s, sqrt(A-B^2/C)*s, f0]."""
        inv_sx = np.float32(0.7071067811865476) / gp.sx
        inv_sy = np.float32(0.7071067811865476) / gp.sy
        c1 = gp.cos_rot * inv_sx
        c2 = -gp.sin_rot * inv_sx
        c3 = gp.sin_rot * inv_sy
        c4 = gp.cos_rot * inv_sy
        A = c1 * c1 + c3 * c3
        B = c1 * c2 + c3 * c4
        C = c2 * c2 + c4 * c4
        s_l2e = np.float32(1.2011224087864498)
        return [-(gp.icx.astype(np.float32) + gp.sub_cx),
                -(gp.icy.astype(np.float32) + gp.sub_cy),
                B / C,
                np.sqrt(C) * s_l2e,
                np.sqrt(np.maximum(A - B * B / C, 0.0)) * s_l2e,
                f0]

    def _prepare_gaussian_rotp(self, spec_idx, gp, valid, r, values, info):
        """Stage rotated (or any dense-routed) Gaussians through the
        quarter-slot lane-packed splat (build_rot_packed_pallas): the
        completed-square coefficients of the old 'rot' kernel plus
        host-clipped per-point window bounds [wlo, whi] x [rlo, rhi]
        (grid + home-tile clips folded in, so the kernel needs no tile
        branches).  Same algebra and 1e-6 product cutoff as
        glyph_kernels.cu:145-176 (see _rot_quadratic_segs)."""
        from .pallas_kernels import padded_width
        n = len(values)
        TH = ROTP_ROW_BLOCK
        block = min(PALLAS_BLOCK, 2048)
        ncb = padded_width(self.W) // 128
        rtype = ReductionType(info.type)
        f0 = (np.ones(n, np.float32)
              if rtype == ReductionType.Count else
              np.asarray(values, np.float32))
        quad = self._rot_quadratic_segs(gp, f0)
        icx = gp.icx.astype(np.int64)
        icy = gp.icy.astype(np.int64)
        rr = r.astype(np.int64)
        W1, H1 = self.W - 1, self.H - 1
        wlo = np.maximum(icx - rr, 0)
        whi = np.minimum(icx + rr, W1)
        rlo = np.maximum(icy - rr, 0)
        rhi = np.minimum(icy + rr, H1)
        if self.cfg.total_tiles() > 1:
            tw, th_t = self.cfg.tile_width, self.cfg.tile_height
            off = getattr(self.cfg, "row_offset", 0)
            Hg1 = getattr(self.cfg, "global_height", self.H) - 1
            cs = (np.clip(icx, 0, W1) // tw) * tw
            # tile rows live in the GLOBAL frame (row-offset shard views)
            rs = (np.clip(icy + off, 0, Hg1) // th_t) * th_t
            wlo = np.maximum(wlo, cs)
            whi = np.minimum(whi, np.minimum(cs + tw - 1, W1))
            rlo = np.maximum(rlo, rs - off)
            rhi = np.minimum(rhi, np.minimum(rs + th_t - 1, Hg1) - off)
        # Dead windows take the empty-column convention (one dead copy in
        # block 0): invalid points, AND windows the home-tile clip pushed
        # entirely outside this view's rows — under a row-offset shard
        # view a straddler's home tile can start at/after the shard end,
        # leaving rlo >= H (an unclamped rlo would index past the rotp
        # bucketing histogram: native OOB write / numpy reshape crash,
        # round-5 review).
        alive = valid & (wlo <= whi) & (rlo <= rhi) & (rlo <= H1) \
            & (rhi >= 0)
        wlo = np.where(alive, wlo, 1).astype(np.float32)
        whi = np.where(alive, whi, 0).astype(np.float32)
        rlo = np.where(alive, np.clip(rlo, 0, H1), 0).astype(np.float32)
        rhi = np.where(alive, np.clip(rhi, 0, H1), 0).astype(np.float32)
        segs = [(quad[0], 0.0), (quad[1], 0.0), (quad[2], 0.0),
                (quad[3], 1.0), (quad[4], 0.0), (quad[5], 0.0),
                (wlo, 1.0), (whi, 0.0), (rlo, 0.0), (rhi, 0.0)]
        buf, nsub, E = self._bucket_blocks_2d_packed(
            rlo, rhi, wlo, whi, ncb, block, segs, TH)
        key = ("pallas_rotp", spec_idx, nsub, block, TH)
        builder = self._pallas_builder(info, nsub, block, TH, "rotp",
                                       False, len(segs), E)
        return [StagedChunk(key, self._put(buf, arena="rotp_buf"),
                            builder, n)]

    def prepare_gaussian(self, spec_idx: int, gp, valid, values,
                         block: int = 4_096, wire_cheap: bool = False):
        """Stage Gaussian chunks (gp: routing.GaussianParams).

        Rotation-free splats go through the row-block-sorted fast path:
        points are bucketed (with halo duplication) by GAUSS_ROW_BLOCK-row
        blocks on the host, each block padded to a multiple of `block`, so
        every device sub-chunk matmuls against just TH rows.

        wire_cheap=True (host-sourced ingest): ship a minimal per-point
        record and do the expansion on device (device_prep) — on a thin
        host link the wire bounds throughput, not the accumulate."""
        if wire_cheap and self._wire_ok(self.plans[spec_idx][1]):
            staged = self._prepare_gaussian_wire(spec_idx, gp, valid,
                                                 values)
            if staged is not None:
                return staged
        _, info = self.plans[spec_idx]
        n = len(values)
        r = np.where(valid, gp.r, np.int32(-1)).astype(np.int32)
        values = np.asarray(values, dtype=np.float32)
        rtype = ReductionType(info.type)
        # small-sigma chunks need the reference's PRODUCT cutoff, which
        # the separable factorization cannot express per se
        # (gauss_product_cutoff_bites). Mildly-small UNIFORM sigmas stay
        # separable with the exact-cancellation correction pass
        # (gauss_corr_offsets / pallas corr machinery); everything else
        # takes the dense kernel.
        corr = ()
        dense = bool(gp.rotated) or (valid.any() and
                                     gauss_product_cutoff_bites(
                                         r[valid], gp.sx[valid],
                                         gp.sy[valid]))
        if dense and not gp.rotated and self.pallas != "off":
            uniform = bool(
                (gp.sx[valid] == gp.sx[valid].flat[0]).all()
                and (gp.sy[valid] == gp.sy[valid].flat[0]).all())
            if uniform:
                offs = gauss_corr_offsets(int(r[valid].max()),
                                          gp.sx[valid].flat[0],
                                          gp.sy[valid].flat[0])
                if offs is not None:
                    corr = offs
                    dense = False
        if (dense and self.pallas != "off"
                and max(int(r[valid].max()) if valid.any() else 0,
                        getattr(self, "_rmax_floor", 0)) <= ROTP_RMAX
                and os.environ.get("PCR_ROT_PACKED", "1") == "1"):
            return self._prepare_gaussian_rotp(spec_idx, gp, valid, r,
                                               values, info)
        if dense and self.pallas != "off":
            # Dense rotated splat: 2-D bucketing over short (ROT_ROW_BLOCK)
            # row blocks, each point evaluating its exact quadratic form
            # over the (TH, WT) tile in the Pallas kernel. ~100x the
            # offset-scan fallback below; cost is inherently ~window-area
            # VPU exps per point (no rank-1 factorization exists).
            from .pallas_kernels import padded_width
            TH = ROT_ROW_BLOCK
            WT = ROT_COL_TILE
            block = min(PALLAS_BLOCK, 2048)
            ncb = padded_width(self.W) // WT
            nrb = self.H_pad // TH
            icx = gp.icx.astype(np.int64)
            icy = gp.icy.astype(np.int64)
            rb0 = np.where(valid, np.clip((icy - r) // TH, 0, nrb - 1), 0)
            rb1 = np.where(valid, np.clip((icy + r) // TH, 0, nrb - 1), 0)
            cb0 = np.where(valid, np.clip((icx - r) // WT, 0, ncb - 1), 0)
            cb1 = np.where(valid, np.clip((icx + r) // WT, 0, ncb - 1), 0)
            f0 = (np.ones(n, np.float32)
                  if rtype == ReductionType.Count else values)
            # completed-square fold shared with the packed rotp staging
            # (bit-identical coefficients; see _rot_quadratic_segs)
            quad = self._rot_quadratic_segs(gp, f0)
            icx_f = gp.icx.astype(np.float32)
            icy_f = gp.icy.astype(np.float32)
            segs = [(quad[0], 0.0), (quad[1], 0.0), (quad[2], 0.0),
                    (quad[3], 0.0), (quad[4], 0.0), (quad[5], 0.0),
                    (icx_f, 0.0), (icy_f, 0.0),
                    (r.astype(np.float32), -1.0)]
            buf, nsub, E = self._bucket_blocks_2d(rb0, rb1, cb0, cb1, ncb,
                                                  block, segs, th=TH)
            key = ("pallas_rot2", spec_idx, nsub, block, TH)
            builder = self._pallas_builder(info, nsub, block, TH, "rot",
                                           False, len(segs), E, two_d=True,
                                           wt=WT)
            return [StagedChunk(key, self._put(buf), builder, n)]
        if dense:
            staged = []
            for start, end in chunk_ranges(n):
                b = bucket_size(end - start)
                sl = slice(start, end)
                rmax = max(int(r[sl].max()) if end > start else 0, 0,
                           getattr(self, "_rmax_floor", 0))
                segs = [(gp.icx[sl], 0), (gp.icy[sl], 0),
                        (gp.sub_cx[sl], 0), (gp.sub_cy[sl], 0),
                        (gp.sx[sl], 1.0), (gp.sy[sl], 1.0),
                        (gp.cos_rot[sl], 1.0), (gp.sin_rot[sl], 0),
                        (r[sl], -1), (values[sl], 0)]
                key = ("gauss_rot", spec_idx, b, rmax)
                builder = (lambda info=info, b=b, rmax=rmax:
                           _build_gaussian_rotated_update(
                               info, self.cfg, b, rmax))
                staged.append(StagedChunk(
                    key, self._put(self._pack(b, segs)), builder,
                    end - start))
            return staged

        icy = gp.icy.astype(np.int64)
        rtype = ReductionType(info.type)
        f0 = (np.ones(n, np.float32)
              if rtype == ReductionType.Count else values)
        segs = [(gp.icx, 0), (gp.icy, 0),
                (gp.sub_cx, 0), (gp.sub_cy, 0),
                (gp.sx, 1.0), (gp.sy, 1.0), (r, -1), (f0, 0)]
        if self.pallas != "off":
            # 2-D (row-block x col-block) bucketing: the kernel's factor
            # matmul then spans only (TH, CT) per sub-chunk.
            from .pallas_kernels import (gauss_col_tile, gauss_row_block,
                                         padded_width)
            block = min(block, PALLAS_BLOCK)   # bounded by scoped VMEM
            # _rmax_floor: the sharded engine forces a common rmax across
            # sp shards (WT and the dense scan length feed jit keys)
            rmax = max(int(r.max()) if n else 0, 0,
                       getattr(self, "_rmax_floor", 0))
            WT = gauss_col_tile(self.W, rmax)
            TH = gauss_row_block(self.W, rmax)   # radius-adaptive rows
            nrb = self.H_pad // TH
            blk0 = np.where(valid, np.clip((icy - r) // TH, 0, nrb - 1), 0)
            blk1 = np.where(valid, np.clip((icy + r) // TH, 0, nrb - 1), 0)
            ncb = padded_width(self.W) // WT
            icx = gp.icx.astype(np.int64)
            cb0 = np.where(valid, np.clip((icx - r) // WT, 0, ncb - 1), 0)
            cb1 = np.where(valid, np.clip((icx + r) // WT, 0, ncb - 1), 0)
            buf, nsub, E = self._bucket_blocks_2d(blk0, blk1, cb0, cb1,
                                                  ncb, block, segs, th=TH)
            key = ("pallas_gauss2d", spec_idx, nsub, block, TH, WT, corr)
            builder = self._pallas_builder(info, nsub, block, TH, False,
                                           False, len(segs), E, two_d=True,
                                           wt=WT, corr_offsets=corr)
            return [StagedChunk(key, self._put(buf), builder, n)]
        TH = GAUSS_ROW_BLOCK
        nblocks = self.H_pad // TH
        blk0 = np.where(valid, np.clip((icy - r) // TH, 0, nblocks - 1), 0)
        blk1 = np.where(valid, np.clip((icy + r) // TH, 0, nblocks - 1), 0)
        buf, nsub, E = self._bucket_rowblocks(blk0, blk1, block, segs)
        key = ("gauss_sorted", spec_idx, nsub, block, TH)
        builder = (lambda info=info, nsub=nsub, block=block, TH=TH:
                   _build_sorted_matmul_update(
                       info, self.cfg, nsub, block, TH,
                       point_mode=False, with_f1=False))
        return [StagedChunk(key, self._put(buf), builder, n)]

    def prepare_line(self, spec_idx: int, lp, valid, values, col, row,
                     wire_cheap: bool = False):
        """Stage Line chunks (lp: routing.LineParams).

        wire_cheap=True (host-sourced ingest): ship exact integer
        endpoints (12-16 B/pt) and rebuild the staircase runs on device
        (device_prep) — bit-exact vs this host path.

        With the Pallas kernel available, each line decomposes into its
        exact Bresenham runs (routing.line_rects — closed-form staircase,
        clipped to home tile and grid) and the runs accumulate as interval
        rectangles through the fused 2-D sorted splat: min(ddx,ddy)+1
        entries per line instead of max(ddx,ddy)+1 scatter updates."""
        _, info = self.plans[spec_idx]
        if wire_cheap and self._wire_ok(info):
            staged = self._prepare_line_wire(spec_idx, lp, valid, values,
                                             col, row)
            if staged is not None:
                return staged
        values = np.asarray(values, dtype=np.float32)
        if self.pallas != "off":
            from . import routing as _routing
            from .pallas_kernels import padded_width, rect_col_tile
            rects = _routing.line_rects(lp, self.cfg, valid, col, row)
            block = PALLAS_BLOCK
            TH = GAUSS_ROW_BLOCK
            WT = rect_col_tile(self.W)
            ncb = padded_width(self.W) // WT
            rb0 = rects.ay.astype(np.int64) // TH
            rb1 = rects.by.astype(np.int64) // TH
            cb0 = rects.ax.astype(np.int64) // WT
            cb1 = rects.bx.astype(np.int64) // WT
            f0 = values[rects.owner]
            # pad fill makes an empty interval (ax=1 > bx=0)
            segs = [(rects.ax, 1), (rects.bx, 0),
                    (rects.ay, 1), (rects.by, 0), (f0, 0)]
            buf, nsub, E = self._bucket_blocks_2d(rb0, rb1, cb0, cb1,
                                                  ncb, block, segs)
            key = ("pallas_rect", spec_idx, nsub, block, TH)
            builder = self._pallas_builder(info, nsub, block, TH, "rect",
                                           False, len(segs), E, two_d=True,
                                           wt=WT)
            return [StagedChunk(key, self._put(buf), builder, len(lp.ix0))]
        s = _LINE_SENTINEL
        ix0 = np.where(valid, lp.ix0, s).astype(np.int32)
        iy0 = np.where(valid, lp.iy0, s).astype(np.int32)
        ix1 = np.where(valid, lp.ix1, s).astype(np.int32)
        iy1 = np.where(valid, lp.iy1, s).astype(np.int32)
        values = np.asarray(values, dtype=np.float32)
        multi_tile = self.cfg.total_tiles() > 1
        staged = []
        for start, end in chunk_ranges(len(ix0)):
            b = bucket_size(end - start)
            sl = slice(start, end)
            segs = [(ix0[sl], s), (iy0[sl], s), (ix1[sl], s), (iy1[sl], s)]
            if multi_tile:
                segs += [(col[sl], 0), (row[sl], 0)]
            segs.append((values[sl], 0))
            key = ("line", spec_idx, b, lp.k_cells)
            builder = (lambda info=info, b=b, ms=lp.k_cells:
                       _build_line_update(info, self.cfg, b, ms))
            staged.append(StagedChunk(key, self._put(self._pack(b, segs)),
                                      builder, end - start))
        return staged

    # -- commit ----------------------------------------------------------------

    def commit(self, spec_idx: int, staged) -> None:
        """Dispatch the staged chunks' updates (device compute only).

        Dispatch is async (measured ~0.3 ms), so committing eagerly starts
        device compute immediately and it overlaps the host's bookkeeping
        and the next chunk's routing. PCR_LAZY_COMMIT=1 queues instead and
        fuses everything into the next finalize/flush dispatch (useful when
        dispatch itself is expensive)."""
        staged = list(staged)
        if not staged:
            return
        pend = self._pending[spec_idx]
        pend.extend(staged)
        if (os.environ.get("PCR_LAZY_COMMIT", "0") != "1"
                or len(pend) >= self._pending_cap):
            self.flush_pending(spec_idx)

    def flush_pending(self, spec_idx: int | None = None) -> None:
        """Materialize queued chunks: one jit call PER CHUNK, each keyed by
        the chunk's own (bucket-ladder) key.

        Earlier rounds fused all queued chunks into one program keyed by
        the tuple of chunk keys to save dispatch round-trips — but every
        novel multiset of chunk keys (3x2M vs 5x1M, a different tail
        bucket, ...) then recompiled a fresh ~50-80 s program through the
        remote tunnel, and those combined programs never hit the
        persistent cache across differently-chunked runs.  Dispatches on
        the journaling tunnel pipeline without per-call round-trips, so
        per-chunk dispatch costs ~nothing and the compiled-program set
        stays exactly the bucket ladder (all persistent-cacheable)."""
        import jax
        specs = (range(len(self.plans)) if spec_idx is None else [spec_idx])
        for i in specs:
            staged = self._pending[i]
            if not staged:
                continue
            self._pending[i] = []
            for chunk in staged:
                fn = self._jits.get(chunk.key)
                if fn is None:
                    fn = jax.jit(chunk.builder(), donate_argnums=(0,))
                    self._jits[chunk.key] = fn
                self._states[i] = fn(self._states[i], chunk.buf)

    def finalize_strips(self, spec_idx: int, strip_rows: int = 256,
                        with_state: bool = False):
        """Apply pending updates, finalize, slice the output into row
        strips, and start async D2H for every strip — ALL in one
        dispatch. Returns [(row0, row1, device_strip), ...]; the caller
        fetches strips in order (np.asarray) while later strips are still
        in flight, overlapping transfer with host-side encoding.

        Without `with_state` each strip is the finalized band, shape
        (rows, W).  With `with_state` each strip is the raw state fields
        stacked as (K, rows, W) — the caller host-finalizes (cheap) and
        can also write PCRT checkpoints from the same bytes, so a
        checkpointing finalize pays K planes on the wire instead of K+1
        (reference flush_all+assemble is one pass too, pipeline.cpp:
        1154-1363)."""
        import jax
        spec, info = self.plans[spec_idx]
        # per-chunk dispatches keep the finalize program's key independent
        # of the pending-chunk history (one cacheable program per
        # (spec, strip_rows, with_state) instead of one per chunk multiset)
        self.flush_pending(spec_idx)
        H, W = self.H, self.W
        ranges = [(a, min(a + strip_rows, H))
                  for a in range(0, H, strip_rows)]
        key = ("finstrips", spec_idx, strip_rows, with_state)
        fn = self._jits.get(key)
        if fn is None:
            import jax.numpy as jnp
            grid_shaped = self._grid_shaped[spec_idx]
            C = self.C

            def combined(states):
                flds = gauss_state_flush(spec, info, list(states), jnp)
                if with_state:
                    planes = jnp.stack(
                        [(s[:H, :W] if grid_shaped
                          else s[:C].reshape(H, W)) for s in flds])
                    return states, tuple(planes[:, a:b] for a, b in ranges)
                band = info.finalize_arrays(flds)
                band = (band[:H, :W] if grid_shaped
                        else band[:C].reshape(H, W))
                return states, tuple(band[a:b] for a, b in ranges)

            fn = jax.jit(combined, donate_argnums=(0,))
            self._jits[key] = fn
        states, strips = fn(self._states[spec_idx])
        self._states[spec_idx] = states
        for s in strips:
            start_d2h(s)
        return [(a, b, s) for (a, b), s in zip(ranges, strips)]

    def finalize_packed_async(self, spec_idx: int, with_state: bool = False):
        """One fused dispatch: pending updates + finalize, returning a
        single stacked device array whose D2H is already initiated.

        Shape (1, H, W) = just the band, or (K, H, W) = the raw state
        fields when `with_state` (the caller host-finalizes — one plane
        fewer on the wire).  On a high-latency link one transfer beats
        per-field fetches: every fetch pays the round-trip, so
        block_until_ready + per-field fetch_state + finalize_band was
        ~4-5 RTTs where this is one."""
        import jax
        import jax.numpy as jnp
        spec, info = self.plans[spec_idx]
        # per-chunk dispatches first: the packed-finalize program is then
        # one cacheable executable per (spec, with_state) regardless of
        # how the run's ingest happened to be chunked
        self.flush_pending(spec_idx)
        H, W = self.H, self.W
        key = ("finpack", spec_idx, with_state)
        fn = self._jits.get(key)
        if fn is None:
            grid_shaped = self._grid_shaped[spec_idx]
            C = self.C

            def combined(states):
                flds = gauss_state_flush(spec, info, list(states), jnp)
                if with_state:
                    planes = [(s[:H, :W] if grid_shaped
                               else s[:C].reshape(H, W)) for s in flds]
                else:
                    band = info.finalize_arrays(flds)
                    planes = [band[:H, :W] if grid_shaped
                              else band[:C].reshape(H, W)]
                return states, jnp.stack(planes)

            fn = jax.jit(combined, donate_argnums=(0,))
            self._jits[key] = fn
        states, packed = fn(self._states[spec_idx])
        self._states[spec_idx] = states
        start_d2h(packed)
        return packed

    # -- one-shot ingest ---------------------------------------------------------

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

    def block_until_ready(self):
        import jax
        self.flush_pending()
        for st in self._states:
            jax.block_until_ready(st)
