#!/usr/bin/env python
"""Per-stage decomposition of the PRODUCTION hybrid glyph update.

profile_hybrid_device.py times synthetic analogues of the device stages;
this script times the real thing: it builds the exact staged chunk the
Hybrid pipeline ships (prepare_*_raw wire pack), then runs the builder's
own stage closures (device_prep fn.entries/group/finish/upd) as separate
jits on the real chip, so each row is the cost of that stage inside the
production program shapes.

Stages per 2M-point chunk:
  pack     host wire pack (native), _put stubbed out
  h2d      device_put of the packed buffer (wire)
  entries  decode + run/halo expansion -> (eb_full, payloads)
  group    aligned_sorted_planes (the payload sort)
  finish   post-sort unpack -> params_2d
  splat    the fused Pallas kernel
  full     the complete production update fn
  ingest   pipeline.ingest of the chunk (pack + wire + full, serial)

Run on the real chip:  python benchmarks/profile_hybrid_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 2_000_000
REPEATS = 3


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])
    return x


def timed(name, fn, *args, n=N):
    import jax
    out = sync(fn(*args))
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:8s} {best * 1e3:9.1f} ms   "
          f"{n / best / 1e6:8.2f} Mpts/s-equiv", flush=True)
    return out


def main():
    import jax
    import pcr_tpu as pcr
    from pcr_tpu.engine import routing

    rng = np.random.default_rng(0)
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0, 0, 1000, 1000
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()

    x = rng.uniform(0, 1000, N)
    y = rng.uniform(0, 1000, N)
    vs = rng.random(N, np.float64).astype(np.float32)
    col, row, valid = routing.assign(gc, x, y)

    # honest-mode flip: one fetch before any timing
    dev = [d for d in jax.devices() if d.platform != "cpu"][0]
    np.asarray(jax.device_put(np.ones(8, np.float32), dev))

    for label, spec in (
        ("line_hl1", pcr.line_splat_spec(
            "value", default_half_length=1.0)),
        ("line_hl16", pcr.line_splat_spec(
            "value", default_half_length=16.0)),
        ("gauss_s4", pcr.gaussian_splat_spec("value", default_sigma=4.0)),
        ("gauss_s16", pcr.gaussian_splat_spec("value", default_sigma=16.0)),
        ("rot_s4", pcr.gaussian_splat_spec(
            "value", default_sigma_x=4.0, default_sigma_y=1.5,
            default_rotation=0.6)),
        ("point", None),
    ):
        if len(sys.argv) > 1 and label not in sys.argv[1:]:
            continue
        print(f"== {label} ==", flush=True)
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        if spec is None:
            s = pcr.ReductionSpec()
            s.value_channel = "value"
            s.type = pcr.ReductionType.Average
            spec = s
        cfg.reductions = [spec]
        cfg.exec_mode = pcr.ExecutionMode.Hybrid
        pipe = pcr.Pipeline.create(cfg)
        eng = pipe._engine

        gt = spec.glyph.type
        # -- host pack without the device put --------------------------------
        orig_put = eng._put
        eng._put = lambda b: b
        try:
            if gt == pcr.GlyphType.Line:
                prep = lambda: eng.prepare_line_raw(
                    0, spec.glyph, x, y, valid, vs, col, row)
            elif gt == pcr.GlyphType.Gaussian:
                prep = lambda: eng.prepare_gaussian_raw(
                    0, spec.glyph, x, y, valid, vs)
            else:
                prep = lambda: eng.prepare_point(
                    0, None, valid, vs, None, None, wire_cheap=True,
                    col=col, row=row)
            staged = prep()
            assert staged, f"{label}: raw wire path not engaged"
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                staged = prep()
                best = min(best, time.perf_counter() - t0)
            print(f"  pack     {best * 1e3:9.1f} ms   "
                  f"{N / best / 1e6:8.2f} Mpts/s-equiv "
                  f"({len(staged)} chunk(s))", flush=True)
        finally:
            eng._put = orig_put
        ch = staged[0]
        npts = ch.npoints
        host_buf = ch.buf
        print(f"  chunk: {npts} pts, wire {host_buf.nbytes / 1e6:.1f} MB "
              f"({host_buf.nbytes / npts:.1f} B/pt), key={ch.key[0]}",
              flush=True)

        buf = timed("h2d", lambda a: jax.device_put(a, dev), host_buf,
                    n=npts)
        fn = ch.builder()
        if not hasattr(fn, "entries"):
            # point wire has no stage split; time the full update only
            full = jax.jit(fn)
            st = eng._states[0]
            timed("full", full, st, buf, n=npts)
            continue
        entries = jax.jit(fn.entries)
        group = jax.jit(fn.group)
        finish = jax.jit(fn.finish)
        upd = jax.jit(fn.upd)
        full = jax.jit(fn)

        ep = timed("entries", entries, buf, n=npts)
        pl = timed("group", group, *ep, n=npts)
        pp = timed("finish", finish, *pl, n=npts)
        st = eng._states[0]
        timed("splat", upd, st, *pp, n=npts)
        timed("full", full, st, buf, n=npts)

        cloud = pcr.PointCloud.create(N)
        cloud.set_x_array(x)
        cloud.set_y_array(y)
        cloud.add_channel("value", pcr.DataType.Float32)
        cloud.set_channel_array_f32("value", vs)
        pipe.ingest(cloud)    # warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            pipe.ingest(cloud)
            eng.flush_pending()
            sync(eng._states[0])
            best = min(best, time.perf_counter() - t0)
        print(f"  ingest   {best * 1e3:9.1f} ms   "
              f"{N / best / 1e6:8.2f} Mpts/s  (full cloud, serial)",
              flush=True)


if __name__ == "__main__":
    main()
