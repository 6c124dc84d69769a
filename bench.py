#!/usr/bin/env python
"""
PCR-TPU benchmark — mirrors the reference harnesses, outage-proof.

Prints ONE (final) JSON line on stdout:
  {"metric": ..., "value": N, "unit": "Mpts/s", "vs_baseline": N, ...}

The remote-attached TPU tunnel has real outages (round 4's driver window
was consumed entirely by "accelerator unavailable" retries and produced
no artifact at all).  This harness therefore guarantees an artifact under
EVERY failure mode:

  * An artifact line is printed IMMEDIATELY at startup, populated from
    the committed last-healthy record (benchmark_results/bench.json)
    with "stale": true — so even a kill -9 one second in leaves a
    parseable line in the output tail.
  * Device health is probed briefly (PCR_BENCH_WAIT, default 300 s) in a
    subprocess; if the tunnel is down the stale artifact (plus probe
    diagnostics) is the final answer and the exit code is 0.
  * Measurements run in a CHILD process that streams one result line per
    row; the parent re-emits the merged artifact after every row and
    enforces per-row + whole-run deadlines, so a mid-run wedge still
    yields every row measured up to that point (the rest stay stale).

Primary metric: the reference's GPU-Device mode, mirrored EXACTLY from
scripts/benchmarks/benchmark_cpu_gpu.py — 160x160 grid (1 m cells over a
160 m bbox), EPSG:32610, Average reduction, state_dir AND output_path set,
cloud staged on device before timing, ingest+finalize walled, best-of.
Reference: 54.02 Mpts/s @5M on an RTX 2060 (docs/BENCHMARK_RESULTS.md:37),
with 1M/10M/25M scaling rows (14.95 / 64.06 / 111.70).

Secondary details: the benchmark_glyph_full.py suite (1000x1000 grid,
README.md:193-201) — point_host replicates its host-sourced definition
(H2D inside the timed region; wire-bound on this tunnel); the Gaussian
sigma=1/4/16, rotated, and Line hl=1/4/16 rows report the device-staged
surrogate on the same grid, each against its reference GPU baseline.
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

N = int(os.environ.get("PCR_BENCH_N", 5_000_000))
REPEATS = int(os.environ.get("PCR_BENCH_REPEATS", 4))

REPO = os.path.dirname(os.path.abspath(__file__))
COMMITTED_PATH = os.path.join(REPO, "benchmark_results", "bench.json")

BASELINES = {
    # GPU-Device rows measured by scripts/benchmarks/benchmark_cpu_gpu.py:
    # bbox 0..160 x 0..160 at 1 m cells (160x160 grid), EPSG:32610, Average,
    # state_dir + output_path set, cloud pre-staged on device
    # (docs/BENCHMARK_RESULTS.md:28-42). bench.py mirrors that harness
    # exactly for these rows.
    "point_device": 54.02,      # @5M, BENCHMARK_RESULTS.md:37
    "point_device_1m": 14.95,   # BENCHMARK_RESULTS.md:33
    "point_device_10m": 64.06,  # BENCHMARK_RESULTS.md:40
    "point_device_25m": 111.70, # BENCHMARK_RESULTS.md:42
    # Glyph rows measured by scripts/benchmarks/benchmark_glyph_full.py:
    # 1000x1000 grid, cloud in HOST memory (H2D inside the timed region —
    # trivial over the reference's PCIe, dominant over this environment's
    # ~50 MB/s tunnel), README.md:193-201. point_host replicates that
    # harness including the transfer; the other glyph rows report the
    # device-staged surrogate on the same 1000x1000 grid (upload excluded,
    # result D2H + GeoTIFF included) since the wire — not the TPU — caps
    # any host-sourced run here.
    "point_host": 60.26,      # Point @5M GPU, README.md:195
    "point_1k_device": 60.26, # device-staged surrogate for the same row
    "gauss_s1": 47.40,
    "gauss_s4": 21.59,
    "gauss_s16": 2.43,
    # Anisotropic rotated Gaussian: the reference has no rotated benchmark;
    # its window-loop kernel runs rotated at the same speed as unrotated,
    # so its sigma=4 number is the bar (README.md:200).
    "gauss_rot_s4": 21.59,
    "line_hl1": 50.60,
    "line_hl4": 50.41,
    "line_hl16": 46.61,
}

ROW_ORDER = [
    "point_device", "point_device_1m", "point_device_10m",
    "point_device_25m", "point_host", "point_1k_device",
    "gauss_s1", "gauss_s4", "gauss_s16", "gauss_rot_s4",
    "line_hl1", "line_hl4", "line_hl16",
]

# Healthy-window reference points from the committed record
# (benchmark_results/bench.json / BENCH_r03.json): a row landing well
# below ITS OWN healthy value indicates a degraded-link window, not a
# framework change. Keying retries off these (rather than the reference
# baselines) stops structurally-below-baseline rows (point_host is
# wire-bound at ~6 on this link; line walls are link-floor-bound) from
# burning the retry budget on every run.
EXPECTED = {
    "point_device": 98.0, "point_device_1m": 28.0,
    "point_device_10m": 142.0, "point_device_25m": 203.0,
    "point_host": 6.0, "point_1k_device": 26.0,
    "gauss_s1": 24.0, "gauss_s4": 23.0, "gauss_s16": 18.5,
    "gauss_rot_s4": 22.0,
    "line_hl1": 26.0, "line_hl4": 25.5, "line_hl16": 27.0,
}


def probe_device_once(timeout_s=180):
    """One bounded subprocess probe of the accelerator: init + a tiny jit
    + a synchronous fetch that must complete in 5 s (degraded windows
    dispatch fine but stall fetches for minutes). Returns (ok, detail)."""
    probe = (
        "import time, numpy as np, jax;"
        "d=[x for x in jax.devices() if x.platform != 'cpu']; assert d;"
        "y=jax.jit(lambda a: a + 1)("
        "jax.device_put(np.ones(256, np.float32), d[0]));"
        "t0=time.time(); np.asarray(y); assert time.time()-t0 < 5.0")
    t0 = time.monotonic()
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, timeout=timeout_s)
        ok = r.returncode == 0
        detail = "" if ok else (r.stderr or b"").decode()[-200:]
    except subprocess.TimeoutExpired:
        ok, detail = False, f"probe timed out after {timeout_s}s"
    return ok, detail, round(time.monotonic() - t0, 1)


def wait_for_device(max_wait_s=None):
    """Retry the bounded probe until healthy or the (SHORT) wait budget
    drains. Round 4 showed an unbounded pre-bench wait can eat the whole
    driver window and leave no artifact — so the default is 5 minutes,
    and the caller must degrade gracefully when this returns False."""
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("PCR_BENCH_WAIT", 300))
    deadline = time.monotonic() + max_wait_s
    while True:
        remaining = deadline - time.monotonic()
        ok, detail, _t = probe_device_once(
            timeout_s=max(10, min(180, remaining + 10)))
        if ok:
            return True, ""
        if time.monotonic() > deadline:
            return False, detail
        print(f"# accelerator unavailable or link degraded ({detail!r}), "
              "retry in 30s", file=sys.stderr)
        time.sleep(min(30, max(0, deadline - time.monotonic())))


# ---------------------------------------------------------------------------
# Parent orchestrator: always emits an artifact.
# ---------------------------------------------------------------------------

def load_committed():
    """Last-healthy per-row record for stale fallback."""
    try:
        with open(COMMITTED_PATH) as f:
            rec = json.load(f)
        rows = {}
        for name, d in rec.get("details", {}).items():
            rows[name] = {
                "mpts": d.get("mpts_per_s"),
                "accum": d.get("device_accumulate_mpts_per_s"),
            }
        return rows
    except Exception as e:
        print(f"# no committed record ({e}); stale rows unavailable",
              file=sys.stderr)
        return {}


def build_artifact(results, probe_info):
    """Merge measured + stale rows into the artifact dict. `results`
    maps row name -> {"mpts": float, "accum": float|None, "stale": bool}."""
    details = {}
    n_meas = n_stale = 0
    for name in ROW_ORDER:
        r = results.get(name)
        if r is None or r.get("mpts") is None:
            continue
        d = {"mpts_per_s": round(r["mpts"], 2),
             "baseline": BASELINES[name],
             "vs_baseline": round(r["mpts"] / BASELINES[name], 3)}
        if r.get("accum") is not None:
            d["device_accumulate_mpts_per_s"] = round(r["accum"], 2)
        if r.get("stale"):
            d["stale"] = True
            n_stale += 1
        else:
            n_meas += 1
        details[name] = d

    head = results.get("point_device") or {}
    value = head.get("mpts")
    out = {
        "metric": ("Average-reduction ingest+finalize Mpts/s @5M pts, "
                   "GPU-Device harness mirror (160x160 grid, state_dir + "
                   "GeoTIFF output, cloud staged on device; "
                   "benchmark_cpu_gpu.py / BENCHMARK_RESULTS.md:37)"),
        "value": round(value, 2) if value is not None else None,
        "unit": "Mpts/s",
        "vs_baseline": (round(value / BASELINES["point_device"], 3)
                        if value is not None else None),
        "stale": bool(head.get("stale", True)),
        "rows_measured": n_meas,
        "rows_stale": n_stale,
        "probe": probe_info,
        "details": details,
        "env": {
            "host_cpu_count": os.cpu_count(),
            "note": ("TPU reached via remote tunnel (~50-58 MB/s host "
                     "link, ~20-27 ms per-transfer overhead); "
                     "point_device/_1m/_10m/_25m mirror the reference "
                     "GPU-Device harness exactly (160x160 grid). The "
                     "1000x1000 glyph rows include result D2H (4 MB) + "
                     "LZW GeoTIFF write on the 1-core host — see "
                     "benchmark_results/wall_decomposition.json for the "
                     "measured link floor; the reference GPU baseline is "
                     "PCIe-local with a 6-core host. point_host is "
                     "wire-bound: 40 MB up + 4 MB down on this link; the "
                     "Hybrid pipeline runs at ~75% of that ceiling. "
                     "Rows marked stale:true are the committed "
                     "last-healthy values, emitted because the tunnel "
                     "was down or the row's window expired this run."),
        },
    }
    return out


def emit(artifact):
    print(json.dumps(artifact), flush=True)


class ChildRunner:
    """Runs the measurement child, streaming @ROW lines; enforces
    per-row inactivity timeouts so an in-process jax wedge cannot
    swallow the run."""

    def __init__(self, rows):
        self.rows = rows
        self.queue = []
        self.lock = threading.Lock()
        env = dict(os.environ)
        # The parent has just verified tunnel health; give the child's
        # in-library device probe (default 30 s) more slack so a slow
        # first contact can't demote a healthy run to CPU fallback.
        env.setdefault("PCR_TPU_PROBE_TIMEOUT", "150")
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"]
            + rows,
            stdout=subprocess.PIPE, stderr=None, text=True,
            cwd=REPO, env=env)
        self.reader = threading.Thread(target=self._read, daemon=True)
        self.reader.start()

    def _read(self):
        for line in self.proc.stdout:
            if line.startswith("@ROW "):
                try:
                    rec = json.loads(line[5:])
                except json.JSONDecodeError:
                    continue
                with self.lock:
                    self.queue.append(rec)
            else:
                sys.stderr.write(line)

    def next_row(self, timeout_s):
        """Wait up to timeout_s for the next @ROW record. Returns the
        record, or None on timeout / child exit with empty queue."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self.lock:
                if self.queue:
                    return self.queue.pop(0)
            if self.proc.poll() is not None:
                # drain whatever the reader thread still buffers
                self.reader.join(timeout=5)
                with self.lock:
                    if self.queue:
                        return self.queue.pop(0)
                return None
            time.sleep(0.5)
        return None

    def alive(self):
        return self.proc.poll() is None

    def kill(self):
        if self.proc.poll() is None:
            self.proc.kill()
            try:
                self.proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass


def parent_main():
    t_start = time.monotonic()
    deadline = t_start + float(os.environ.get("PCR_BENCH_DEADLINE", 3300))
    committed = load_committed()
    results = {name: {"mpts": committed.get(name, {}).get("mpts"),
                      "accum": committed.get(name, {}).get("accum"),
                      "stale": True}
               for name in ROW_ORDER if name in committed}
    probe_info = {"healthy": None, "detail": "", "wait_s": 0.0}

    # Artifact line #1: before touching jax at all. Guarantees the
    # output tail contains a parseable line under any later failure.
    emit(build_artifact(results, probe_info))

    t0 = time.monotonic()
    if os.environ.get("PCR_BENCH_SKIP_PROBE") == "1":
        # Testing hook: exercise the child machinery without a tunnel
        # (rows then measure whatever backend jax resolves, e.g. CPU).
        healthy, detail = True, "probe skipped"
    else:
        healthy, detail = wait_for_device()
    probe_info = {"healthy": healthy, "detail": detail,
                  "wait_s": round(time.monotonic() - t0, 1)}
    if not healthy:
        print("# tunnel down after bounded wait; emitting stale artifact",
              file=sys.stderr)
        emit(build_artifact(results, probe_info))
        return 0

    rows_wanted = [r for r in ROW_ORDER
                   if not (r.startswith("point_device_")
                           and os.environ.get("PCR_BENCH_SCALING", "1")
                           != "1")]
    pending = list(rows_wanted)
    spawns = 0
    while pending and spawns < 3 and time.monotonic() < deadline - 60:
        spawns += 1
        runner = ChildRunner(pending)
        first = True
        while pending:
            # First row of a child run pays compile; give it longer.
            row_budget = 1500 if first else 900
            row_budget = min(row_budget,
                             max(60, deadline - time.monotonic()))
            rec = runner.next_row(row_budget)
            if rec is None:
                stuck = "exited" if not runner.alive() else "wedged"
                print(f"# child {stuck} during row {pending[0]!r}; "
                      f"skipping it", file=sys.stderr)
                runner.kill()
                pending.pop(0)  # skip the row it died on
                break
            first = False
            name = rec.get("row")
            if name in pending:
                pending.remove(name)
            results[name] = {"mpts": rec.get("mpts"),
                             "accum": rec.get("accum"), "stale": False}
            emit(build_artifact(results, probe_info))
            if time.monotonic() > deadline - 60:
                print("# run deadline reached; remaining rows stay stale",
                      file=sys.stderr)
                pending.clear()
        runner.kill()
        if pending and time.monotonic() < deadline - 120:
            # Re-probe before respawning: if the tunnel died mid-run,
            # don't burn the rest of the window on a dead link.
            ok, d, _ = probe_device_once()
            if not ok:
                print(f"# tunnel unhealthy after child loss ({d!r}); "
                      "stopping", file=sys.stderr)
                break

    emit(build_artifact(results, probe_info))
    return 0


# ---------------------------------------------------------------------------
# Child: actual measurements, one @ROW line per completed row.
# ---------------------------------------------------------------------------

_FRUITLESS_RETRIES = 0
# Run-wide wall-clock pool for degraded-window waits: if the link stays
# degraded across the whole run, retries stop once the pool drains rather
# than multiplying every row's wall by the per-retry wait.
_RETRY_POOL_S = float(os.environ.get("PCR_BENCH_RETRY_BUDGET", 900))


def measure_with_retry(measure, n_pts, name):
    """Healthy-probed retries for a row landing well below its own
    committed healthy-window value: a degraded link window poisons every
    repeat of a row at once (fetch stalls of 100 ms+), so re-probe link
    health and give the row more windows — the record should measure the
    framework, not an outage. A retry that fails to improve the number
    after the probe reported healthy counts as fruitless; after two
    fruitless retries, stop retrying for the rest of the run (the gap is
    then evidence of a framework change, which SHOULD be recorded)."""
    global _FRUITLESS_RETRIES, _RETRY_POOL_S
    best = measure()
    expected = EXPECTED.get(name)
    attempts = 0
    while (expected is not None and attempts < 3
           and _FRUITLESS_RETRIES < 2 and _RETRY_POOL_S > 0
           and n_pts / best / 1e6 < 0.75 * expected):
        t0 = time.monotonic()
        healthy, _d = wait_for_device(
            max_wait_s=min(300, _RETRY_POOL_S))
        if not healthy:
            # No healthy window within the budget — further retries of
            # this or any other row are pointless; record what we have.
            _RETRY_POOL_S -= time.monotonic() - t0
            break
        again = measure()
        _RETRY_POOL_S -= time.monotonic() - t0
        if again > best * 0.9:  # healthy probe, same number
            _FRUITLESS_RETRIES += 1
        best = min(best, again)
        attempts += 1
    return best


def child_main(rows):
    if os.environ.get("PCR_BENCH_FORCE_CPU") == "1":
        # Testing hook. The environment's site config pins
        # jax_platforms=axon regardless of the JAX_PLATFORMS env var, so
        # CPU must be forced through the config API before any backend
        # initializes (same trick as tests/conftest.py).
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["PCR_FORCE_JAX"] = "1"   # JAX-CPU acts as the device
    import pcr_tpu as pcr

    if not pcr.tpu_device_available():
        # CPU-fallback run (testing / tunnel died between probe and
        # spawn): the EXPECTED thresholds describe TPU windows and would
        # send every row into futile degraded-link retries.
        EXPECTED.clear()

    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0.0, 0.0, 1000.0, 1000.0
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()

    rng = np.random.default_rng(42)
    cloud = pcr.PointCloud.create(N)
    cloud.set_x_array(rng.uniform(0, 1000, N))
    cloud.set_y_array(rng.uniform(0, 1000, N))
    cloud.add_channel("value", pcr.DataType.Float32)
    cloud.set_channel_array_f32("value",
                                rng.uniform(0, 1, N).astype(np.float32))

    tmp = tempfile.mkdtemp(prefix="pcr_bench_")

    def report(name, mpts, accum=None):
        rec = {"row": name, "mpts": round(mpts, 2)}
        if accum is not None:
            rec["accum"] = round(accum, 2)
        print("@ROW " + json.dumps(rec), flush=True)

    def run(name, spec, host_sourced=False):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [spec]
        # Host-sourced ingest pipelines routing/packing/upload across
        # chunks (Hybrid); device-staged runs pure GPU mode.
        cfg.exec_mode = (pcr.ExecutionMode.Hybrid if host_sourced
                         else pcr.ExecutionMode.GPU)
        cfg.output_path = os.path.join(tmp, f"{name}.tif")
        pipe = pcr.Pipeline.create(cfg)
        staged = None if host_sourced else pipe.stage(cloud)
        src = cloud if host_sourced else staged
        # warmup (compile; cached across runs via the persistent jit cache)
        pipe.ingest(src)
        pipe.finalize()
        def measure():
            b = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                pipe.ingest(src)
                pipe.finalize()
                b = min(b, time.perf_counter() - t0)
            return b
        best = measure_with_retry(measure, N, name)
        mpts = N / best / 1e6
        accum = None
        if not host_sourced:
            # pure device-accumulate throughput, amortized over K ingests
            # (the ingest+finalize wall above is dominated by a fixed
            # ~0.3s floor on this remote tunnel: result D2H + TIFF write
            # on a 1-core host + dispatch latency)
            def sync():
                # block_until_ready is unreliable on the remote backend
                # (returns before compute completes); a 1-element state
                # fetch forces an actual device sync
                pipe._engine.flush_pending()
                st = pipe._engine._states[0][0]
                head = st[:1, :1] if st.ndim == 2 else st[:1]
                return float(np.asarray(head).ravel()[0])

            K = 5
            abest = 0.0
            for _ in range(2):      # remote windows vary; take the best
                t0 = time.perf_counter()
                for _ in range(K):
                    pipe.ingest(src)
                sync()              # 1-element state fetch syncs compute
                dt = time.perf_counter() - t0
                abest = max(abest, N * K / max(dt, 1e-9) / 1e6)
            accum = abest
        print(f"# {name:16s} best {best:7.3f}s  {mpts:8.2f} Mpts/s  "
              f"(baseline {BASELINES[name]:6.2f}, "
              f"x{mpts / BASELINES[name]:.2f})"
              + (f"  accum {accum:.1f}" if accum is not None else ""),
              file=sys.stderr)
        report(name, mpts, accum)

    def run_device_mirror(name, n):
        """Exact mirror of the reference's GPU-Device mode: 160x160 grid
        (1 m cells over a 160 m bbox), EPSG:32610, Average on 'value',
        state_dir + output_path set, cloud staged on device before timing
        (benchmark_cpu_gpu.py:46-90; docs/BENCHMARK_RESULTS.md:28-42)."""
        mb = pcr.BBox()
        mb.min_x, mb.min_y, mb.max_x, mb.max_y = 0.0, 0.0, 160.0, 160.0
        mgc = pcr.GridConfig()
        mgc.bounds = mb
        mgc.cell_size_x, mgc.cell_size_y = 1.0, -1.0
        mgc.crs = pcr.CRS.from_epsg(32610)
        mgc.compute_dimensions()
        mrng = np.random.default_rng(42)
        mcloud = pcr.PointCloud.create(n)
        mcloud.set_x_array(mrng.uniform(0.5, 159.5, n))
        mcloud.set_y_array(mrng.uniform(0.5, 159.5, n))
        mcloud.add_channel("value", pcr.DataType.Float32)
        mcloud.set_channel_array_f32(
            "value", mrng.uniform(0, 100, n).astype(np.float32))
        cfg = pcr.PipelineConfig()
        cfg.grid = mgc
        spec = pcr.ReductionSpec(value_channel="value",
                                 type=pcr.ReductionType.Average,
                                 output_band_name="out")
        cfg.reductions = [spec]
        cfg.exec_mode = pcr.ExecutionMode.GPU
        cfg.output_path = os.path.join(tmp, f"{name}.tif")
        cfg.state_dir = os.path.join(tmp, f"{name}_state")
        pipe = pcr.Pipeline.create(cfg)
        staged = pipe.stage(mcloud)
        pipe.ingest(staged)
        pipe.finalize()
        def measure():
            b = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                pipe.ingest(staged)
                pipe.finalize()
                b = min(b, time.perf_counter() - t0)
            return b
        best = measure_with_retry(measure, n, name)
        mpts = n / best / 1e6
        print(f"# {name:16s} best {best:7.3f}s  {mpts:8.2f} Mpts/s  "
              f"(baseline {BASELINES[name]:6.2f}, "
              f"x{mpts / BASELINES[name]:.2f})", file=sys.stderr)
        report(name, mpts)

    avg = lambda: pcr.ReductionSpec(value_channel="value",
                                    type=pcr.ReductionType.Average)
    SPECS = {
        "point_device": lambda: run_device_mirror("point_device", N),
        "point_device_1m":
            lambda: run_device_mirror("point_device_1m", 1_000_000),
        "point_device_10m":
            lambda: run_device_mirror("point_device_10m", 10_000_000),
        "point_device_25m":
            lambda: run_device_mirror("point_device_25m", 25_000_000),
        "point_host": lambda: run("point_host", avg(), host_sourced=True),
        "point_1k_device": lambda: run("point_1k_device", avg()),
        "gauss_s1": lambda: run(
            "gauss_s1", pcr.gaussian_splat_spec("value", default_sigma=1.0)),
        "gauss_s4": lambda: run(
            "gauss_s4", pcr.gaussian_splat_spec("value", default_sigma=4.0)),
        "gauss_s16": lambda: run(
            "gauss_s16", pcr.gaussian_splat_spec("value",
                                                 default_sigma=16.0)),
        "gauss_rot_s4": lambda: run(
            "gauss_rot_s4", pcr.gaussian_splat_spec(
                "value", default_sigma_x=4.0, default_sigma_y=1.5,
                default_rotation=0.6)),
        "line_hl1": lambda: run(
            "line_hl1", pcr.line_splat_spec("value", default_half_length=1.0)),
        "line_hl4": lambda: run(
            "line_hl4", pcr.line_splat_spec("value", default_half_length=4.0)),
        "line_hl16": lambda: run(
            "line_hl16", pcr.line_splat_spec("value",
                                             default_half_length=16.0)),
    }
    for name in rows:
        if name in SPECS:
            SPECS[name]()
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        sys.exit(child_main(sys.argv[2:]))
    sys.exit(parent_main())
