"""Stage-by-stage timing of the hybrid glyph device program.

The round-2 Hybrid glyph collapse was re-measured in round 3 at 0.2-0.9
Mpts/s after the minimal-wire redesign (glyph_sweep.csv) — far under the
~5 Mpts/s point-hybrid wire ceiling on the same link. This decomposes one
representative chunk into its device stages so the slow one is a fact,
not a guess:

  h2d        wire upload (12-16 B/pt)
  runenum    line run enumeration (searchsorted over starts) [line only]
  expand     halo expansion to (eb, pidx) entries
  sort       lax.sort_key_val of entry block ids
  layout     gather-based placement into the (nsub, nseg, block) layout
  splat      the fused Pallas kernel itself
  full       the complete jitted update (what production runs)

Run on the real chip:  python benchmarks/profile_hybrid_device.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N = 2_000_000          # one production chunk
REPEATS = 3


def pick_device():
    ds = [d for d in jax.devices() if d.platform != "cpu"]
    return ds[0] if ds else jax.devices()[0]


DEV = pick_device()


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))       # compile + warm
    # remote backends can return early from block_until_ready; force a
    # 1-element fetch of some leaf for a true sync
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:10s} {best * 1e3:9.1f} ms   "
          f"{N / best / 1e6:8.2f} Mpts/s-equiv")
    return out


def main():
    print(f"device: {DEV.platform}, chunk N={N}")
    rng = np.random.default_rng(0)

    # ---- representative line_hl1 chunk on the 1000x1000 bench grid ----
    B = N
    jmax = 2
    rme = 1 << 22
    nrb, ncb = 8, 8          # 1024/128 row blocks x 1024/128 col blocks
    nblocks = nrb * ncb
    block = 2048
    nsub_pad = -(-rme * jmax // block) + nblocks

    nruns_np = rng.integers(1, 4, B).astype(np.int32)
    starts_np = np.concatenate(
        [[0], np.cumsum(nruns_np)]).astype(np.int32)
    e0_np = rng.integers(0, 1000, B).astype(np.int32) << 16 \
        | rng.integers(0, 1000, B).astype(np.int32)
    val_np = rng.random(B, np.float32).view(np.int32)
    buf_np = np.concatenate([e0_np, e0_np, val_np])

    starts = jax.device_put(starts_np, DEV)
    buf = jax.device_put(buf_np, DEV)

    print("== line stages ==")
    timed("h2d", lambda a: jax.device_put(a, DEV), buf_np)

    t = jnp.arange(rme, dtype=jnp.int32)

    @jax.jit
    def runenum_ss(starts):
        return jnp.searchsorted(starts[1:], t, side="right").astype(jnp.int32)

    line_ss = timed("runenum_ss", runenum_ss, starts)

    @jax.jit
    def runenum_cs(starts):
        # scatter one marker per line boundary, prefix-sum to get the
        # line id of every entry slot — one scatter + one cumsum instead
        # of log2(B) sequential gather passes
        marker = jnp.zeros(rme, jnp.int32).at[starts[1:-1]].add(
            1, mode="drop")
        return jnp.cumsum(marker)

    line_cs = timed("runenum_cs", runenum_cs, starts)
    live = np.asarray(line_ss) < B   # dead slots (t >= starts[-1]) differ
    assert np.array_equal(np.asarray(line_ss)[live],
                          np.asarray(line_cs)[live]), \
        "cumsum run enumeration disagrees with searchsorted on live slots"

    @jax.jit
    def gathers(starts, line):
        linec = jnp.minimum(line, B - 1)
        o = lambda a: a[linec]
        # production gathers ~10 per-line arrays at entry resolution
        outs = [o(starts[:-1])]
        for k in range(9):
            outs.append(o(starts[1:] + k))
        return sum(outs)

    timed("gathers10", gathers, starts, line_cs)

    # entry expansion + sort + layout at line entry scale (E0 = rme*jmax)
    E0 = rme * jmax
    eb_np = rng.integers(0, nblocks, E0).astype(np.int32)
    eb = jax.device_put(eb_np, DEV)
    pidx = jax.device_put(np.arange(E0, dtype=np.int32) % B, DEV)

    @jax.jit
    def sort_entries(eb, pidx):
        return lax.sort_key_val(eb, pidx)

    eb_s, pidx_s = timed("sort", sort_entries, eb, pidx)

    @jax.jit
    def counting_rank(eb):
        # chunked one-hot cumsum: stable rank of each entry within its
        # block + per-block counts, no bitonic sort
        S = 64
        C = E0 // S
        ebc = eb.reshape(S, C)
        onehot = (ebc[:, :, None] == jnp.arange(nblocks)[None, None, :])
        within = jnp.cumsum(onehot, axis=1)           # (S, C, nblocks)
        per_chunk = within[:, -1, :]                  # (S, nblocks)
        carry = jnp.concatenate(
            [jnp.zeros((1, nblocks), within.dtype),
             jnp.cumsum(per_chunk, axis=0)[:-1]])     # (S, nblocks)
        rank = (within - onehot + carry[:, None, :])
        own = jnp.take_along_axis(
            rank, jnp.clip(ebc, 0, nblocks - 1)[:, :, None],
            axis=2)[:, :, 0]
        counts = per_chunk.sum(0)
        return own.reshape(-1), counts

    timed("count_rank", counting_rank, eb)

    @jax.jit
    def layout(eb_s, pidx_s, vals):
        bounds = jnp.searchsorted(
            eb_s, jnp.arange(nblocks + 1, dtype=jnp.int32))
        counts = bounds[1:] - bounds[:-1]
        subs = jnp.maximum((counts + block - 1) // block, 1)
        sub_start = jnp.concatenate(
            [jnp.zeros(1, subs.dtype), jnp.cumsum(subs)])
        s_idx = jnp.arange(nsub_pad, dtype=sub_start.dtype)
        bids = jnp.clip(
            jnp.searchsorted(sub_start[1:], s_idx, side="right"),
            0, nblocks - 1).astype(jnp.int32)
        j = jnp.arange(nsub_pad * block, dtype=jnp.int32)
        b = bids[j // block]
        pos = j - sub_start[b].astype(jnp.int32) * block
        live = pos < counts[b]
        src = bounds[b] + jnp.minimum(pos, jnp.maximum(counts[b] - 1, 0))
        idx2 = pidx_s[jnp.clip(src, 0, E0 - 1)]
        planes = [jnp.where(live, vals[k][idx2], 0).reshape(nsub_pad, block)
                  for k in range(5)]
        return jnp.stack(planes, axis=1)

    vals = tuple(jax.device_put(
        rng.integers(0, 1000, B).astype(np.int32), DEV) for _ in range(5))
    timed("layout5", layout, eb_s, pidx_s, vals)

    # ---- the full production paths, via the engine -----------------------
    print("== full production hybrid updates (one chunk, via engine) ==")
    import pcr_tpu as pcr
    from pcr_tpu.engine import tpu_backend as tb

    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0, 0, 1000, 1000
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()

    xs = rng.uniform(0, 1000, N)
    ys = rng.uniform(0, 1000, N)
    vs = rng.random(N).astype(np.float32)

    for label, spec in (
        ("line_hl1", pcr.line_splat_spec(
            "value", default_direction=0.7, default_half_length=1.0)),
        ("gauss_s4", pcr.gaussian_splat_spec("value", default_sigma=4.0)),
        ("rot_s4", pcr.gaussian_splat_spec(
            "value", default_sigma_x=4.0, default_sigma_y=1.5, default_rotation=0.6)),
    ):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [spec]
        cfg.exec_mode = pcr.ExecutionMode.Hybrid
        pipe = pcr.Pipeline.create(cfg)
        cloud = pcr.PointCloud.create(N)
        cloud.set_x_array(xs)
        cloud.set_y_array(ys)
        cloud.add_channel("value", pcr.DataType.Float32)
        cloud.set_channel_array_f32("value", vs)
        pipe.ingest(cloud)          # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pipe.ingest(cloud)
            eng = pipe._engine
            eng.flush_pending()
            st = eng._states[0][0]
            head = st[:1, :1] if st.ndim == 2 else st[:1]
            np.asarray(head)
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:10s} {best * 1e3:9.1f} ms   "
              f"{N / best / 1e6:8.2f} Mpts/s (ingest incl. host+wire)")


if __name__ == "__main__":
    main()
