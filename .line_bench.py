import time, numpy as np, jax
import pcr_tpu as pcr
from pcr_tpu.engine.tpu_backend import TpuEngine
from pcr_tpu.engine import routing
from pcr_tpu.ops.reduction import get_reduction_info

N = 5_000_000
bbox = pcr.BBox(); bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0,0,1000,1000
gc = pcr.GridConfig(); gc.bounds=bbox; gc.crs=pcr.CRS.from_epsg(3857); gc.compute_dimensions()
rng = np.random.default_rng(42)
x = rng.uniform(0,1000,N); y = rng.uniform(0,1000,N)
vals = rng.uniform(0,1,N).astype(np.float32)
dirs = rng.uniform(0, 2*np.pi, N).astype(np.float32)
col, row, valid = routing.assign(gc, x, y)
ginfo = get_reduction_info(pcr.ReductionType.WeightedAverage)

for hl in (1.0, 4.0, 16.0):
    spec = pcr.line_splat_spec('v', direction_channel='dir', default_half_length=hl)
    eng = TpuEngine(gc, [(spec, ginfo)])
    lp = routing.line_params(spec.glyph, gc, x, y, dirs, None)
    t0=time.perf_counter()
    staged = eng.prepare_line(0, lp, valid, vals, col, row)
    tstage = time.perf_counter()-t0
    def gs():
        float(np.asarray(eng._states[0][0][0:1,0:1]).ravel()[0])
    t0=time.perf_counter(); eng.commit(0, staged); gs(); warm=time.perf_counter()-t0
    best=1e9
    for _ in range(4):
        t0=time.perf_counter(); eng.commit(0, staged); gs(); best=min(best,time.perf_counter()-t0)
    print(f"line hl={hl}: stage {tstage:.1f}s warm {warm:.1f}s best {best*1e3:.1f} ms = {N/best/1e6:.1f} Mpts/s", flush=True)

# correctness vs oracle on subset
from pcr_tpu.engine import cpu_backend as cpu
sub = slice(0, 200000); vl = valid[sub]
spec = pcr.line_splat_spec('v', direction_channel='dir', default_half_length=4.0)
st = ginfo.init_state((1000,1000))
cpu.accumulate_line_cpu(spec.glyph, pcr.ReductionType.WeightedAverage, gc, st,
                        x[sub][vl], y[sub][vl], vals[sub][vl], dirs[sub][vl], None, col[sub][vl], row[sub][vl])
eng2 = TpuEngine(gc, [(spec, ginfo)])
lp2 = routing.line_params(spec.glyph, gc, x[sub], y[sub], dirs[sub], None)
eng2.commit(0, eng2.prepare_line(0, lp2, valid[sub], vals[sub], col[sub], row[sub]))
got = eng2.fetch_state(0)
for f in range(2):
    d = np.abs(got[f]-st[f])
    print(f"line field{f} abs {d.max():.2e}", flush=True)
print("DONE", flush=True)
