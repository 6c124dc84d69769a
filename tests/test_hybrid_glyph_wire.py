"""Hybrid (host-sourced) glyph ingest through the minimal-wire device
expansion path (engine/device_prep.py).

The round-2 Hybrid glyph path shipped the full 8-10-segment host-bucketed
layout (32-64 B/point) and collapsed to 0.10-0.66 Mpts/s; the wire path
ships 12-20 B/point and rebuilds the layout on device. Contract:

  * Gaussian hybrid matches the CPU oracle within the reference's own
    CPU<->GPU bar of 1e-4 relative (sub-cell offsets ride the wire as u16
    fixed point; scripts/patterns/compare_cpu_gpu_patterns.py:28-41).
  * Line hybrid has the EXACT staged footprint and values within 1 ulp
    (endpoints are exact integers on the wire; run accumulation order
    differs slightly), and the 4-bit delta wire is bit-identical to the
    full-e1 wire.
  * Multi-tile grids keep the home-tile glyph clip.
"""

import numpy as np
import pytest

import pcr_tpu as pcr
from conftest import make_grid_config


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """The wire paths gate on the Pallas splat (_wire_ok); without this
    the CPU test backend auto-selects pallas='off' and every test here
    would silently exercise the staged fallback instead of the wire."""
    monkeypatch.setenv("PCR_PALLAS", "interpret")


def _cloud(n, extent, seed=3, channels=("value",)):
    rng = np.random.default_rng(seed)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, extent, n))
    c.set_y_array(rng.uniform(0, extent, n))
    for ch in channels:
        c.add_channel(ch, pcr.DataType.Float32)
    if "value" in channels:
        c.set_channel_array_f32(
            "value", rng.uniform(0, 1, n).astype(np.float32))
    if "sigma" in channels:
        c.set_channel_array_f32(
            "sigma", rng.uniform(0.5, 2.5, n).astype(np.float32))
    if "direction" in channels:
        c.set_channel_array_f32(
            "direction", rng.uniform(0, np.pi, n).astype(np.float32))
    return c


def _run(gc, spec, cloud, mode, staged=False):
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = mode
    p = pcr.Pipeline.create(cfg)
    src = p.stage(cloud) if staged else cloud
    p.ingest(src)
    p.finalize()
    return p.result().band_array(0)


def _rel_close(a, b, tol):
    """Value parity at `tol` relative (NaN treated as 0), with empty-cell
    mask flips bounded to the footprint fringe: u16 sub-offset quantization
    can flip a cell across the w >= 1e-6 gaussian cutoff, turning an
    untouched (NaN) cell into a ~1e-6 contribution or back — the same
    class of fringe disagreement the reference tolerates between its own
    CPU and GPU paths (compare_cpu_gpu_patterns.py:28-41)."""
    flips = np.isnan(a) != np.isnan(b)
    assert flips.mean() < 0.01, f"{flips.sum()} mask flips"
    an, bn = np.nan_to_num(a), np.nan_to_num(b)
    # any flipped cell must be a fringe cell (near-zero on the other side)
    if flips.any():
        assert float(np.abs(np.where(flips, an - bn, 0.0)).max()) < 1e-3
    denom = max(float(np.nanmax(np.abs(a))), 1e-12)
    assert float(np.abs(np.where(flips, 0.0, an - bn)).max()) / denom <= tol


# Worst-cell parity scales as q*(sub quantum)/sigma (q <= ~5.3 at the
# 1e-6 cutoff): ~1e-4 for sigma >= 1, ~1e-3 when sigma dips to 0.5.
GAUSS_CASES = [
    ("uniform", pcr.gaussian_splat_spec("value", default_sigma=2.0),
     ("value",), 1e-4),
    ("perpoint", pcr.gaussian_splat_spec("value", sigma_x_channel="sigma"),
     ("value", "sigma"), 2e-3),
    ("rot", pcr.gaussian_splat_spec("value", default_sigma_x=3.0,
                                    default_sigma_y=1.2,
                                    default_rotation=0.7),
     ("value",), 1e-4),
]


@pytest.mark.parametrize("name,spec,channels,tol", GAUSS_CASES,
                         ids=[c[0] for c in GAUSS_CASES])
def test_hybrid_gaussian_wire_oracle_parity(name, spec, channels, tol):
    gc = make_grid_config(w=128.0, h=128.0)
    cloud = _cloud(2000, 128.0, channels=channels)
    ref = _run(gc, spec, cloud, pcr.ExecutionMode.CPU)
    hyb = _run(gc, spec, cloud, pcr.ExecutionMode.Hybrid)
    _rel_close(ref, hyb, tol)


def test_hybrid_line_wire_matches_staged():
    """Per-point-direction lines: exact footprint and values to 1 ulp.
    The wire enumerates runs in a slightly different within-cell order
    than the host bucketing, so Average sums can differ in the last ulp
    (the delta-wire test below additionally pins the packed wire
    bit-equal to the full-e1 wire)."""
    gc = make_grid_config(w=128.0, h=128.0)
    cloud = _cloud(2000, 128.0, channels=("value", "direction"))
    spec = pcr.line_splat_spec("value", default_half_length=5.0,
                               direction_channel="direction")
    staged = _run(gc, spec, cloud, pcr.ExecutionMode.GPU, staged=True)
    hyb = _run(gc, spec, cloud, pcr.ExecutionMode.Hybrid)
    assert (np.isnan(staged) == np.isnan(hyb)).all()
    m = np.isfinite(staged)
    assert float(np.abs(staged[m] - hyb[m]).max()) <= 1e-6


def test_hybrid_gaussian_wire_multi_tile_clip():
    """Home-tile clipping survives the device expansion (reference
    semantics: glyph footprints clip to the owner's tile)."""
    gc = make_grid_config(w=160.0, h=160.0)
    gc.tile_width = gc.tile_height = 64
    gc.compute_dimensions()
    cloud = _cloud(1500, 160.0, channels=("value",))
    spec = pcr.gaussian_splat_spec("value", default_sigma=2.0)
    ref = _run(gc, spec, cloud, pcr.ExecutionMode.CPU)
    hyb = _run(gc, spec, cloud, pcr.ExecutionMode.Hybrid)
    _rel_close(ref, hyb, 1e-4)


def test_hybrid_line_wire_multi_tile_clip():
    gc = make_grid_config(w=160.0, h=160.0)
    gc.tile_width = gc.tile_height = 64
    gc.compute_dimensions()
    cloud = _cloud(1500, 160.0, channels=("value", "direction"))
    spec = pcr.line_splat_spec("value", default_half_length=6.0,
                               direction_channel="direction")
    staged = _run(gc, spec, cloud, pcr.ExecutionMode.GPU, staged=True)
    hyb = _run(gc, spec, cloud, pcr.ExecutionMode.Hybrid)
    assert (np.isnan(staged) == np.isnan(hyb)).all()
    m = np.isfinite(staged)
    assert float(np.abs(staged[m] - hyb[m]).max()) <= 1e-6


def test_hybrid_wire_repeat_ingest_stable_keys():
    """Repeated hybrid ingests of same-bucket clouds must reuse compiled
    programs (the round-2 collapse suspect was per-chunk nsub recompiles);
    correctness check: two ingests double the Sum."""
    gc = make_grid_config(w=128.0, h=128.0)
    spec = pcr.gaussian_splat_spec("value", default_sigma=1.5)
    spec.type = pcr.ReductionType.Sum
    cloud = _cloud(1000, 128.0)
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = pcr.ExecutionMode.Hybrid
    p = pcr.Pipeline.create(cfg)
    p.ingest(cloud)
    keys_after_first = set(p._engine._jits.keys())
    p.ingest(cloud)
    assert set(p._engine._jits.keys()) == keys_after_first
    p.finalize()
    once = _run(gc, spec, _cloud(1000, 128.0), pcr.ExecutionMode.Hybrid)
    twice = p.result().band_array(0)
    assert np.allclose(np.nan_to_num(twice), 2 * np.nan_to_num(once),
                       rtol=1e-6, atol=1e-6)


def test_commit_programs_keyed_per_chunk_not_per_multiset():
    """Multi-chunk ingests must not mint programs keyed by the multiset of
    chunk keys: through a remote tunnel every novel combination was a
    fresh ~50-80 s compile that never hit the persistent cache across
    differently-chunked runs. The compiled set must stay the bucket
    ladder (per-chunk keys) plus pending-independent finalize programs."""
    gc = make_grid_config(w=128.0, h=128.0)
    spec = pcr.ReductionSpec(value_channel="value",
                             type=pcr.ReductionType.Average)
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = pcr.ExecutionMode.Hybrid
    cfg.chunk_size = 300          # 1000 points -> 4 chunks
    p = pcr.Pipeline.create(cfg)
    p.ingest(_cloud(1000, 128.0))
    p.finalize()
    for key in p._engine._jits:
        head = key[0] if isinstance(key, tuple) else key
        assert head != "multi", f"multiset-keyed commit program: {key}"
        if head in ("finstrips", "finpack"):
            assert not any(isinstance(part, tuple) for part in key), (
                f"finalize program keyed by chunk history: {key}")


def test_line_delta_wire_engages_and_matches(monkeypatch):
    """Uniform-shape lines must ship 4-bit endpoint deltas (the packed
    key carries the (dminx, dminy) tuple), reconstructing endpoints so
    exactly that the raster is BIT-IDENTICAL to the full-e1 wire; vs the
    staged path the usual wire contract holds (exact footprint, values
    to the last ulp)."""
    gc = make_grid_config(w=200.0, h=200.0)
    spec = pcr.line_splat_spec("value", default_direction=0.9,
                               default_half_length=5.0)
    cloud = _cloud(4000, 200.0)
    staged = _run(gc, spec, cloud, pcr.ExecutionMode.GPU, staged=True)
    monkeypatch.setenv("PCR_LINE_DELTA_WIRE", "0")
    plain = _run(gc, spec, cloud, pcr.ExecutionMode.Hybrid)
    monkeypatch.setenv("PCR_LINE_DELTA_WIRE", "1")
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = pcr.ExecutionMode.Hybrid
    p = pcr.Pipeline.create(cfg)
    p.ingest(cloud)
    # the jit cache is shared across engines, so the plain-wire key from
    # the run above coexists; a packed-delta key must be present — either
    # the static uniform-run form (preferred) or the packed-stream form
    line_keys = [k for k in p._engine._jits
                 if k[0] in ("line_wire", "line_wire_static")]
    assert any(k[0] == "line_wire_static"
               or (isinstance(k[-1], tuple) and len(k[-1]) == 2)
               for k in line_keys), \
        f"delta wire did not engage: {line_keys}"
    p.finalize()
    hyb = p.result().band_array(0)
    assert np.array_equal(plain, hyb, equal_nan=True)
    assert (np.isnan(staged) == np.isnan(hyb)).all()
    m = np.isfinite(staged)
    assert float(np.abs(staged[m] - hyb[m]).max()) <= 1e-6


def test_line_delta_wire_multi_tile():
    """Delta wire + home-tile clip: the packed codes segment follows the
    ctr plane on multi-tile grids; footprint stays exact vs staged."""
    gc = make_grid_config(w=160.0, h=160.0)
    gc.tile_width = gc.tile_height = 64
    gc.compute_dimensions()
    cloud = _cloud(1500, 160.0)
    spec = pcr.line_splat_spec("value", default_direction=0.4,
                               default_half_length=6.0)
    staged = _run(gc, spec, cloud, pcr.ExecutionMode.GPU, staged=True)
    hyb = _run(gc, spec, cloud, pcr.ExecutionMode.Hybrid)
    assert (np.isnan(staged) == np.isnan(hyb)).all()
    m = np.isfinite(staged)
    assert float(np.abs(staged[m] - hyb[m]).max()) <= 1e-6
