#!/usr/bin/env python
"""Decompose the device-staged ingest+finalize wall into its physical parts.

VERDICT r2 weak #1: point_device wall is 0.158 s at 5M points while device
accumulate alone runs at ~214 Mpts/s (0.023 s).  This bench measures, on the
live accelerator link, each component that can contribute to the tail:

  rtt_s           dispatch round-trip of a trivial jitted op + 1-elem fetch
  d2h_4mb_s       one 4 MB (1000x1000 f32) device->host fetch
  d2h_strips_s    4 MB fetched as K strips, async-initiated back-to-back
  h2d_4mb_s       one 4 MB host->device put
  accumulate_s    one 5M-point ingest dispatch, synced (amortized over K)
  encode_s        LZW GeoTIFF encode of the 4 MB band on the host (native)
  finalize_s      finalize_strips dispatch + all strips fetched
  wall_s          composed pipeline ingest+finalize (best of R)

Output: benchmark_results/wall_decomposition.json

The reference's analogous tail is PCIe D2H at ~12 GB/s (0.3 ms for 4 MB)
plus a 6-core host encode; docs/BENCHMARK_RESULTS.md:28-42.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PCR_BENCH_N", 5_000_000))
R = int(os.environ.get("PCR_BENCH_REPEATS", 5))


def best(f, r=R):
    b = float("inf")
    for _ in range(r):
        t0 = time.perf_counter()
        f()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    import jax
    import jax.numpy as jnp

    import pcr_tpu as pcr

    dev = next((d for d in jax.devices() if d.platform != "cpu"),
               jax.devices()[0])
    out = {"device": str(dev), "n_points": N}

    # --- raw link characteristics ------------------------------------------------
    one = jax.device_put(np.zeros((1,), np.float32), dev)
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(one))  # compile
    out["rtt_s"] = best(lambda: np.asarray(tiny(one)))

    band_host = np.random.default_rng(0).random((1000, 1000)).astype(np.float32)
    band_dev = jax.device_put(band_host, dev)
    np.asarray(band_dev)
    # jax.Array caches fetched host values (_npy_value): every rep must
    # fetch a FRESH jit output or the measurement collapses to ~0
    bump = jax.jit(lambda x, i: x + i)
    jax.block_until_ready(bump(band_dev, 0.0))

    def fresh(shape_src, i):
        y = bump(shape_src, float(i + 1))
        jax.block_until_ready(y)
        return y

    def best_fresh(src, r=R):
        b = float("inf")
        for i in range(r):
            y = fresh(src, i)
            t0 = time.perf_counter()
            np.asarray(y)
            b = min(b, time.perf_counter() - t0)
        return b

    out["d2h_4mb_s"] = best_fresh(band_dev)

    strips_src = [jax.device_put(band_host[a:a + 250], dev) for a in
                  range(0, 1000, 250)]

    def fetch_strips_fresh(i):
        # NOTE: no copy_to_host_async here — on the axon tunnel one call
        # permanently degrades every later transfer in the process ~30x
        # (see tpu_backend.start_d2h); plain in-order asarray is what the
        # production finalize does on this platform.
        ys = [fresh(s, i) for s in strips_src]
        t0 = time.perf_counter()
        for y in ys:
            np.asarray(y)
        return time.perf_counter() - t0

    out["d2h_strips_s"] = min(fetch_strips_fresh(i) for i in range(R))

    head = jax.jit(lambda x: x[:1, :1])
    jax.block_until_ready(head(band_dev))

    def h2d_once(i):
        # band_host is random (incompressible — the tunnel transport
        # compresses frames) and the rep ends with a 1-element fetch
        # (block_until_ready on a put stays optimistic on the tunnel)
        a = band_host + np.float32(i + 1)   # fresh host buffer per rep
        t0 = time.perf_counter()
        d = jax.device_put(a, dev)
        np.asarray(head(d))
        return time.perf_counter() - t0
    out["h2d_4mb_s"] = min(h2d_once(i) for i in range(R)) - out["rtt_s"]

    # --- host encode --------------------------------------------------------------
    import tempfile
    tmp = tempfile.mkdtemp(prefix="pcr_walldec_")
    from pcr_tpu.io.geotiff import GeoTiffOptions, write_geotiff
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0.0, 0.0, 1000.0, 1000.0
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()
    grid = pcr.Grid.create(1000, 1000,
                           [pcr.BandDesc(name="value_avg",
                                         dtype=pcr.DataType.Float32,
                                         is_state=False)],
                           pcr.MemoryLocation.Host)
    grid.set_band_array(0, band_host)
    out["encode_lzw_s"] = best(lambda: write_geotiff(
        os.path.join(tmp, "enc.tif"), grid, gc, GeoTiffOptions()))

    # --- pipeline components ------------------------------------------------------
    rng = np.random.default_rng(42)
    cloud = pcr.PointCloud.create(N)
    cloud.set_x_array(rng.uniform(0, 1000, N))
    cloud.set_y_array(rng.uniform(0, 1000, N))
    cloud.add_channel("value", pcr.DataType.Float32)
    cloud.set_channel_array_f32("value",
                                rng.uniform(0, 1, N).astype(np.float32))

    def glyph_specs():
        avg = pcr.ReductionSpec(value_channel="value",
                                type=pcr.ReductionType.Average)
        yield "point", avg
        for hl in (1.0, 16.0):
            yield f"line_hl{hl:g}", pcr.line_splat_spec(
                "value", default_half_length=hl)
        for s in (1.0, 4.0, 16.0):
            yield f"gauss_s{s:g}", pcr.gaussian_splat_spec(
                "value", default_sigma=s)
        yield "gauss_rot_s4", pcr.gaussian_splat_spec(
            "value", default_sigma_x=4.0, default_sigma_y=1.5,
            default_rotation=0.6)

    out["glyphs"] = {}
    for label, spec in glyph_specs():
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [spec]
        cfg.exec_mode = pcr.ExecutionMode.GPU
        cfg.output_path = os.path.join(tmp, "out.tif")
        pipe = pcr.Pipeline.create(cfg)
        staged = pipe.stage(cloud)
        pipe.ingest(staged)
        pipe.finalize()

        eng = pipe._engine

        def sync():
            eng.flush_pending()
            st = eng._states[0][0]
            h = st[:1, :1] if st.ndim == 2 else st[:1]
            return float(np.asarray(h).ravel()[0])

        K = 5
        bacc = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K):
                pipe.ingest(staged)
            sync()
            bacc = min(bacc, (time.perf_counter() - t0) / K)

        def run_finalize():
            strips_d = eng.finalize_strips(0, 256)
            for (_, _, s) in strips_d:
                np.asarray(s)
        fin = best(run_finalize)

        def wall():
            pipe.ingest(staged)
            pipe.finalize()
        w = best(wall)
        # the streamed finalize overlaps strip D2H with the LZW encode, so
        # the serial tail is whichever is longer, plus ~2 dispatch RTTs
        floor = (bacc + max(out["d2h_4mb_s"], out["encode_lzw_s"])
                 + 2 * out["rtt_s"])
        g = {"accumulate_s": round(bacc, 5),
             "accumulate_mpts_per_s": round(N / bacc / 1e6, 2),
             "finalize_fetch_s": round(fin, 5),
             "wall_s": round(w, 5),
             "mpts_per_s_wall": round(N / w / 1e6, 2),
             "floor_estimate_s": round(floor, 4),
             "floor_mpts_per_s": round(N / floor / 1e6, 2),
             "tail_unexplained_s": round(w - floor, 4)}
        out["glyphs"][label] = g
        print(f"{label:12s} acc {bacc * 1e3:6.1f} ms  wall {w * 1e3:7.1f}"
              f" ms  floor {floor * 1e3:6.1f} ms  "
              f"{g['mpts_per_s_wall']:6.2f} Mpts/s "
              f"(floor {g['floor_mpts_per_s']:6.2f})", flush=True)
        if label == "point":   # keep the round-3 top-level schema
            out.update({k: g[k] for k in
                        ("accumulate_s", "finalize_fetch_s", "wall_s",
                         "mpts_per_s_wall", "floor_estimate_s",
                         "floor_mpts_per_s", "tail_unexplained_s")})

    # --- primary-metric mirror: 160x160 grid (reference GPU-Device mode,
    # benchmark_cpu_gpu.py) — Average, state_dir + output_path set --------------
    mb = pcr.BBox()
    mb.min_x, mb.min_y, mb.max_x, mb.max_y = 0.0, 0.0, 160.0, 160.0
    mgc = pcr.GridConfig()
    mgc.bounds = mb
    mgc.cell_size_x, mgc.cell_size_y = 1.0, -1.0
    mgc.crs = pcr.CRS.from_epsg(32610)
    mgc.compute_dimensions()
    mcloud = pcr.PointCloud.create(N)
    mcloud.set_x_array(rng.uniform(0, 160, N))
    mcloud.set_y_array(rng.uniform(0, 160, N))
    mcloud.add_channel("value", pcr.DataType.Float32)
    mcloud.set_channel_array_f32("value",
                                 rng.uniform(0, 100, N).astype(np.float32))
    mcfg = pcr.PipelineConfig()
    mcfg.grid = mgc
    mcfg.reductions = [pcr.ReductionSpec(value_channel="value",
                                         type=pcr.ReductionType.Average)]
    mcfg.exec_mode = pcr.ExecutionMode.GPU
    mcfg.state_dir = os.path.join(tmp, "mirror_state")
    mcfg.output_path = os.path.join(tmp, "mirror.tif")
    mpipe = pcr.Pipeline.create(mcfg)
    mstaged = mpipe.stage(mcloud)
    mpipe.ingest(mstaged)
    mpipe.finalize()

    def mwall():
        mpipe.ingest(mstaged)
        mpipe.finalize()
    out["mirror_wall_s"] = best(mwall)
    out["mirror_mpts_per_s"] = round(N / out["mirror_wall_s"] / 1e6, 2)
    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 5)
    os.makedirs("benchmark_results", exist_ok=True)
    path = os.path.join("benchmark_results", "wall_decomposition.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
