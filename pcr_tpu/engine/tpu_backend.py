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
    separable form; the matmul keeps those sub-1e-6 weights, a deviation
    bounded by 1e-6 per point per cell (validated under the 1e-5 parity bar).
  * **Gaussian glyph (rotation != 0)**: exact masked window expansion +
    scatter-add (matches the oracle bit-for-bit in cell selection, including
    the cutoff), O(N * (2r+1)^2) — used only for rotated splats.
  * **Line glyph**: vectorized Bresenham — all N lines advance one step per
    iteration (glyph_kernels.cu:252-279 semantics) and each step is a masked
    scatter-add.
  * **Max/Min**: XLA scatter-max/min. **MostRecent**: three-scatter argmax
    (max timestamp, then min point-index among ties, then value write) —
    deterministic, unlike the reference's CAS race
    (accumulator_kernels.cu:139-167).

Coordinates never reach the device in float64: the host computes integer
cells + float32 sub-cell fractions in f64 numpy (assign), so the device works
purely in f32/i32 (TPU has no fast f64).

All update functions are jitted once per (spec signature, chunk bucket) and
donate the state buffers, so ingest is pure device-resident accumulation.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

from ..core.grid_config import GridConfig
from ..core.types import ReductionType, Status, StatusCode
from ..ops.reduction import FLT_MAX, ReductionInfo
from .glyph import GlyphSpec, GlyphType
from . import cpu_backend as cpu

__all__ = ["TpuEngine", "bucket_size", "CHUNK_BUCKETS"]

# Fixed chunk buckets: pad every ingest chunk up to one of these sizes so XLA
# compiles a bounded number of program shapes (reference analogue: the
# billion-point scripts chunk ingest; here chunking also pins static shapes).
CHUNK_BUCKETS = (8_192, 65_536, 524_288, 2_097_152, 8_388_608)


def bucket_size(n: int) -> int:
    for b in CHUNK_BUCKETS:
        if n <= b:
            return b
    return CHUNK_BUCKETS[-1]


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


# ---------------------------------------------------------------------------
# Jitted update builders.  Each returns f(states, *inputs) -> states where
# `states` is a tuple of flat (C,) float32 arrays for one reduction spec.
# ---------------------------------------------------------------------------


def _build_point_update(info: ReductionInfo, C: int):
    """Point glyph scatter for one reduction."""
    jax, jnp = _jax()
    kind = info.scatter_kind

    def update(states, cells, valid, values, weights, timestamps):
        fields = info.fields(values, weights, timestamps)
        cells = jnp.where(valid, cells, 0)
        if kind == "sum":
            out = []
            for f, fv in enumerate(fields):
                fv = jnp.where(valid, fv, 0.0).astype(jnp.float32)
                out.append(states[f].at[cells].add(fv))
            return tuple(out)
        if kind == "max":
            fv = jnp.where(valid, fields[0], -FLT_MAX).astype(jnp.float32)
            return (states[0].at[cells].max(fv),)
        if kind == "min":
            fv = jnp.where(valid, fields[0], FLT_MAX).astype(jnp.float32)
            return (states[0].at[cells].min(fv),)
        if kind == "argmax_ts":
            return _argmax_ts_update(states, cells, valid,
                                     fields[0], fields[1])
        raise NotImplementedError(kind)

    return update


def _argmax_ts_update(states, cells, valid, values, ts):
    """Deterministic MostRecent scatter (see module docstring).

    Semantics match builtin_ops.h:114-116: a strictly greater timestamp
    replaces; among equal timestamps within the batch the earliest point
    wins; existing state wins ties against the batch.
    """
    jax, jnp = _jax()
    cur_v, cur_t = states
    n = cells.shape[0]
    C = cur_v.shape[0]
    ts = jnp.where(valid, ts, -FLT_MAX).astype(jnp.float32)
    values = values.astype(jnp.float32)
    # 1) winning timestamp per cell (among batch)
    m = jnp.full((C,), -FLT_MAX, jnp.float32).at[cells].max(ts)
    # 2) among batch points achieving the winner ts, the smallest index wins
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    big = jnp.int32(2**31 - 1)
    is_win = valid & (ts == m[cells]) & (ts > cur_t[cells])
    idx_masked = jnp.where(is_win, idx, big)
    widx = jnp.full((C,), big, jnp.int32).at[cells].min(idx_masked)
    final = is_win & (idx == widx[cells])
    # 3) unique winners write value+timestamp (out-of-range index drops)
    safe = jnp.where(final, cells, C)
    new_v = cur_v.at[safe].set(values, mode="drop")
    new_t = cur_t.at[safe].set(ts, mode="drop")
    return (new_v, new_t)


def _build_gaussian_separable_update(info: ReductionInfo, H: int, W: int,
                                     block: int = 8_192):
    """Rotation-free Gaussian splat as blocked soft-one-hot matmuls.

    Grid state is carried as (H, W) per field; the scan blocks points to
    bound the (B, H)/(B, W) factor footprint.
    """
    jax, jnp = _jax()
    kind_fields = {
        ReductionType.WeightedAverage: 2, ReductionType.Average: 2,
        ReductionType.Sum: 1, ReductionType.Count: 1,
    }
    rtype = info.type
    nf = kind_fields[ReductionType(rtype)]
    # field multipliers on the column factor: [val, 1] / [val] / [1]
    use_val = ReductionType(rtype) != ReductionType.Count

    def make():
        def update_full(states, icx, icy, sub_cx, sub_cy, sx, sy, r, valid,
                        values, col_s, col_e, row_s, row_e):
            n = icx.shape[0]
            nb = n // block
            hs = jax.lax.broadcasted_iota(jnp.float32, (1, H), 1)
            ws = jax.lax.broadcasted_iota(jnp.float32, (1, W), 1)
            hs_i = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
            ws_i = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

            def body(carry, args):
                (bicx, bicy, bsub_cx, bsub_cy, bsx, bsy, br, bvalid, bval,
                 bcs, bce, brs, bre) = args
                dy = hs - bicy[:, None].astype(jnp.float32)
                rdy = dy - bsub_cy[:, None]
                qy = rdy / bsy[:, None]
                wy = jnp.exp(-0.5 * qy * qy)
                my = (jnp.abs(hs_i - bicy[:, None]) <= br[:, None])
                my &= (hs_i >= brs[:, None]) & (hs_i < bre[:, None])
                # The reference drops cells with product weight wx*wy < 1e-6
                # (glyph_kernels.cu:167); the product cutoff is not separable,
                # but zeroing per-axis factors below 1e-6 removes the worst of
                # the deviation (any surviving dropped-by-reference cell then
                # contributes < 1e-6 weight).
                my &= wy >= 1e-6
                wy = jnp.where(my & bvalid[:, None], wy, 0.0)

                dx = ws - bicx[:, None].astype(jnp.float32)
                rdx = dx - bsub_cx[:, None]
                qx = rdx / bsx[:, None]
                wx = jnp.exp(-0.5 * qx * qx)
                mx = (jnp.abs(ws_i - bicx[:, None]) <= br[:, None])
                mx &= (ws_i >= bcs[:, None]) & (ws_i < bce[:, None])
                mx &= wx >= 1e-6
                wx = jnp.where(mx, wx, 0.0)

                cols = []
                if use_val:
                    cols.append(wx * bval[:, None])
                if nf == 2:
                    cols.append(wx)
                if not use_val:
                    cols = [wx]
                colfac = (jnp.concatenate(cols, axis=1)
                          if len(cols) > 1 else cols[0])
                contrib = jax.lax.dot_general(
                    wy, colfac, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                out = []
                for f in range(nf):
                    out.append(carry[f] + contrib[:, f * W:(f + 1) * W])
                return tuple(out), None

            def rb(a):
                return a[: nb * block].reshape(nb, block)

            args = tuple(map(rb, (icx, icy, sub_cx, sub_cy, sx, sy, r,
                                  valid, values, col_s, col_e, row_s, row_e)))
            states, _ = jax.lax.scan(body, states, args)
            return states

        return update_full

    return make()


def _build_gaussian_rotated_update(info: ReductionInfo, C: int, W: int,
                                   rmax: int):
    """Exact rotated-Gaussian splat: masked (2r+1)^2 window expansion +
    scatter-add, matching glyph_kernels.cu:145-176 including the 1e-6
    product cutoff. O(N * (2*rmax+1)^2) — for rotated splats only."""
    jax, jnp = _jax()
    rtype = ReductionType(info.type)
    two_fields = rtype in (ReductionType.WeightedAverage, ReductionType.Average)
    use_val = rtype != ReductionType.Count

    def update(states, icx, icy, sub_cx, sub_cy, sx, sy, cos_rot, sin_rot,
               r, valid, values, col_s, col_e, row_s, row_e):
        s0 = states[0]
        s1 = states[1] if two_fields else None

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
            ok = (valid & (w >= 1e-6)
                  & (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r)
                  & (gx >= col_s) & (gx < col_e)
                  & (gy >= row_s) & (gy < row_e))
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
        return (s0, s1) if two_fields else (s0,)

    return update


def _build_line_update(info: ReductionInfo, C: int, W: int, max_steps: int):
    """Vectorized Bresenham line splat: all lines advance together, one
    masked scatter-add per step (glyph_kernels.cu:252-279 semantics)."""
    jax, jnp = _jax()
    rtype = ReductionType(info.type)
    two_fields = rtype in (ReductionType.WeightedAverage, ReductionType.Average)
    use_val = rtype != ReductionType.Count

    def update(states, ix0, iy0, ix1, iy1, valid, values,
               col_s, col_e, row_s, row_e):
        s0 = states[0]
        s1 = states[1] if two_fields else None
        ddx = jnp.abs(ix1 - ix0)
        ddy = jnp.abs(iy1 - iy0)
        sx = jnp.where(ix0 < ix1, 1, -1).astype(jnp.int32)
        sy = jnp.where(iy0 < iy1, 1, -1).astype(jnp.int32)
        per_point_max = 2 * (ddx + ddy) + 2

        def body(step, carry):
            s0, s1, cx, cy, err, done = carry
            active = (~done) & valid & (step <= per_point_max)
            hit = (active & (cx >= col_s) & (cx < col_e)
                   & (cy >= row_s) & (cy < row_e))
            flat = jnp.where(hit, cy * W + cx, 0)
            w = jnp.where(hit, 1.0, 0.0).astype(jnp.float32)
            if use_val:
                s0 = s0.at[flat].add(values * w)
            else:
                s0 = s0.at[flat].add(w)
            if s1 is not None:
                s1 = s1.at[flat].add(w)
            at_end = active & (cx == ix1) & (cy == iy1)
            done = done | at_end
            adv = active & (~at_end)
            e2 = 2 * err
            step_x = adv & (e2 > -ddy)
            step_y = adv & (e2 < ddx)
            err = err - jnp.where(step_x, ddy, 0) + jnp.where(step_y, ddx, 0)
            cx = cx + jnp.where(step_x, sx, 0)
            cy = cy + jnp.where(step_y, sy, 0)
            return (s0, s1, cx, cy, err, done)

        n = ix0.shape[0]
        init = (s0, s1, ix0, iy0, (ddx - ddy).astype(jnp.int32),
                jnp.zeros((n,), bool))
        s0, s1, *_ = jax.lax.fori_loop(0, max_steps + 1, body, init)
        return (s0, s1) if two_fields else (s0,)

    return update


# ---------------------------------------------------------------------------
# TpuEngine — owns device state + compiled update functions for one pipeline
# ---------------------------------------------------------------------------

class TpuEngine:
    """Device-resident accumulation engine for one Pipeline run.

    One instance owns, per ReductionSpec, a tuple of flat (C,) float32 state
    arrays in device HBM (grid-shaped (H, W) for the separable Gaussian
    path), plus jit-compiled donated update functions keyed by chunk bucket.
    """

    def __init__(self, cfg: GridConfig, plans, device=None):
        # plans: list of (ReductionSpec, ReductionInfo)
        import jax
        self.cfg = cfg
        self.plans = plans
        self.device = device or jax.devices()[0]
        self.H = cfg.height
        self.W = cfg.width
        self.C = self.H * self.W
        self._states = []      # per spec: tuple of jax arrays
        self._grid_shaped = []  # per spec: True if state is (H, W) not (C,)
        self._jits = {}
        for spec, info in plans:
            glyph_t = GlyphType(spec.glyph.type)
            grid_shaped = (glyph_t == GlyphType.Gaussian)
            self._grid_shaped.append(grid_shaped)
            shape = (self.H, self.W) if grid_shaped else (self.C,)
            st = tuple(
                jax.device_put(
                    np.full(shape, info.identity[f], dtype=np.float32),
                    self.device)
                for f in range(info.state_floats))
            self._states.append(st)

    # -- state access ---------------------------------------------------------

    def load_state(self, spec_idx: int, fields_hw: list[np.ndarray]) -> None:
        """Replace device state from host (K, H, W) field arrays (resume)."""
        import jax
        grid_shaped = self._grid_shaped[spec_idx]
        st = []
        for f in fields_hw:
            a = np.asarray(f, dtype=np.float32)
            if not grid_shaped:
                a = a.reshape(-1)
            st.append(jax.device_put(a, self.device))
        self._states[spec_idx] = tuple(st)

    def fetch_state(self, spec_idx: int) -> list[np.ndarray]:
        """Download state to host as a list of (H, W) float32 arrays."""
        out = []
        for f in self._states[spec_idx]:
            a = np.asarray(f)
            out.append(a.reshape(self.H, self.W))
        return out

    # -- compiled function cache ----------------------------------------------

    def _get_jit(self, key, builder):
        fn = self._jits.get(key)
        if fn is None:
            import jax
            fn = jax.jit(builder(), donate_argnums=(0,))
            self._jits[key] = fn
        return fn

    # -- ingest ------------------------------------------------------------------

    def ingest_point(self, spec_idx: int, cells: np.ndarray,
                     valid: np.ndarray, values: np.ndarray,
                     weights: np.ndarray | None,
                     timestamps: np.ndarray | None) -> None:
        """Accumulate one already-assigned chunk via Point-glyph scatter."""
        import jax
        _, info = self.plans[spec_idx]
        n = len(cells)
        for start in range(0, max(n, 1), CHUNK_BUCKETS[-1]):
            end = min(start + CHUNK_BUCKETS[-1], n)
            b = bucket_size(end - start)
            fn = self._get_jit(
                ("point", spec_idx, b),
                lambda: _build_point_update(info, self.C))
            dv = partial(self._pad_put, start, end, b)
            self._states[spec_idx] = fn(
                self._states[spec_idx],
                dv(cells, np.int32),
                dv(valid, bool),
                dv(values, np.float32),
                dv(weights, np.float32) if weights is not None else
                dv(np.ones(0), np.float32, fill=1.0, n=end - start),
                dv(timestamps, np.float32) if timestamps is not None else
                dv(np.ones(0), np.float32, fill=-FLT_MAX, n=end - start),
            )

    def ingest_gaussian(self, spec_idx: int, *, icx, icy, sub_cx, sub_cy,
                        sx, sy, cos_rot, sin_rot, r, valid, values,
                        col_s, col_e, row_s, row_e, rotated: bool) -> None:
        spec, info = self.plans[spec_idx]
        n = len(icx)
        for start in range(0, max(n, 1), CHUNK_BUCKETS[-1]):
            end = min(start + CHUNK_BUCKETS[-1], n)
            b = bucket_size(end - start)
            dv = partial(self._pad_put, start, end, b)
            if rotated:
                rmax = int(np.max(r[start:end])) if end > start else 0
                fn = self._get_jit(
                    ("gauss_rot", spec_idx, b, rmax),
                    lambda: _build_gaussian_rotated_update(
                        info, self.C, self.W, rmax))
                self._states[spec_idx] = fn(
                    self._states[spec_idx],
                    dv(icx, np.int32), dv(icy, np.int32),
                    dv(sub_cx, np.float32), dv(sub_cy, np.float32),
                    dv(sx, np.float32, fill=1.0),
                    dv(sy, np.float32, fill=1.0),
                    dv(cos_rot, np.float32, fill=1.0),
                    dv(sin_rot, np.float32),
                    dv(r, np.int32), dv(valid, bool),
                    dv(values, np.float32),
                    dv(col_s, np.int32), dv(col_e, np.int32),
                    dv(row_s, np.int32), dv(row_e, np.int32))
            else:
                block = min(b, 8_192)
                fn = self._get_jit(
                    ("gauss_sep", spec_idx, b, block),
                    lambda: _build_gaussian_separable_update(
                        info, self.H, self.W, block))
                self._states[spec_idx] = fn(
                    self._states[spec_idx],
                    dv(icx, np.int32), dv(icy, np.int32),
                    dv(sub_cx, np.float32), dv(sub_cy, np.float32),
                    dv(sx, np.float32, fill=1.0),
                    dv(sy, np.float32, fill=1.0),
                    dv(r, np.int32), dv(valid, bool),
                    dv(values, np.float32),
                    dv(col_s, np.int32), dv(col_e, np.int32),
                    dv(row_s, np.int32), dv(row_e, np.int32))

    def ingest_line(self, spec_idx: int, *, ix0, iy0, ix1, iy1, valid,
                    values, col_s, col_e, row_s, row_e,
                    max_steps: int) -> None:
        spec, info = self.plans[spec_idx]
        n = len(ix0)
        for start in range(0, max(n, 1), CHUNK_BUCKETS[-1]):
            end = min(start + CHUNK_BUCKETS[-1], n)
            b = bucket_size(end - start)
            dv = partial(self._pad_put, start, end, b)
            fn = self._get_jit(
                ("line", spec_idx, b, max_steps),
                lambda: _build_line_update(info, self.C, self.W, max_steps))
            self._states[spec_idx] = fn(
                self._states[spec_idx],
                dv(ix0, np.int32), dv(iy0, np.int32),
                dv(ix1, np.int32), dv(iy1, np.int32),
                dv(valid, bool), dv(values, np.float32),
                dv(col_s, np.int32), dv(col_e, np.int32),
                dv(row_s, np.int32), dv(row_e, np.int32))

    # -- helpers ----------------------------------------------------------------

    def _pad_put(self, start, end, bucket, arr, dtype, fill=0, n=None):
        """Slice [start:end), pad to bucket with `fill`, move to device."""
        import jax
        m = (end - start) if n is None else n
        if arr is None or len(arr) == 0:
            a = np.full(m, fill, dtype=dtype)
        else:
            a = np.asarray(arr[start:end], dtype=dtype)
        if len(a) < bucket:
            pad = np.full(bucket - len(a), fill, dtype=dtype)
            a = np.concatenate([a, pad])
        return jax.device_put(a, self.device)

    def block_until_ready(self):
        import jax
        for st in self._states:
            jax.block_until_ready(st)
