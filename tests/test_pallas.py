"""Pallas fused-splat kernel tests (interpret mode on CPU).

The kernel is exercised in Pallas interpret mode so its logic is validated
without TPU hardware; on real TPUs the engine compiles the same kernel
(PCR_PALLAS=auto → 'compiled')."""

import numpy as np
import pytest

import pcr_tpu as pcr
from conftest import make_grid_config

RT = pcr.ReductionType


def cloud(n=3000, seed=0, w=200.0, h=150.0):
    rng = np.random.default_rng(seed)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(-5, w + 5, n))    # includes invalid points
    c.set_y_array(rng.uniform(-5, h + 5, n))
    for name, arr in [("v", rng.normal(0, 1, n)),
                      ("w", rng.uniform(0.1, 2.0, n)),
                      ("sig", rng.uniform(0.5, 2.5, n))]:
        c.add_channel(name, pcr.DataType.Float32)
        c.set_channel_array_f32(name, arr.astype(np.float32))
    return c


def run(mode, specs, gc, pallas, monkeypatch):
    import copy
    if pallas:
        monkeypatch.setenv("PCR_PALLAS", "interpret")
    else:
        monkeypatch.setenv("PCR_PALLAS", "0")
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = copy.deepcopy(specs)
    cfg.exec_mode = mode
    p = pcr.Pipeline.create(cfg)
    p.ingest(cloud())
    p.finalize()
    return [p.result().band_array(i).copy() for i in range(len(specs))]


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    for x, y in zip(a, b):
        assert (np.isnan(x) == np.isnan(y)).all()
        m = ~np.isnan(x)
        if m.any():
            excess = np.abs(x[m] - y[m]) - (atol + rtol * np.abs(x[m]))
            assert float(excess.max()) <= 0


@pytest.mark.parametrize("rtype", [RT.Sum, RT.Average, RT.Count,
                                   RT.WeightedAverage])
def test_point_pallas_matches_oracle(monkeypatch, rtype):
    gc = make_grid_config(w=200.0, h=150.0)
    spec = pcr.ReductionSpec(value_channel="v", type=rtype)
    if rtype == RT.WeightedAverage:
        spec.weight_channel = "w"
    oracle = run(pcr.ExecutionMode.CPU, [spec], gc, False, monkeypatch)
    got = run(pcr.ExecutionMode.GPU, [spec], gc, True, monkeypatch)
    assert_close(oracle, got)


def test_gaussian_pallas_matches_oracle(monkeypatch):
    gc = make_grid_config(w=200.0, h=150.0)
    spec = pcr.gaussian_splat_spec("v", sigma_x_channel="sig",
                                   sigma_y_channel="sig",
                                   max_radius_cells=6.0)
    oracle = run(pcr.ExecutionMode.CPU, [spec], gc, False, monkeypatch)
    got = run(pcr.ExecutionMode.GPU, [spec], gc, True, monkeypatch)
    # WeightedAverage cells with near-zero weight sums amplify the sub-1e-6
    # cutoff deviation; the reference's own CPU/GPU bar is 1e-4 absolute.
    assert_close(oracle, got, atol=1e-4)


def test_gauss_corr_offsets_routing():
    """Candidate-set routing: tiny sigmas stay dense (None), mildly-small
    sigmas get a small static offset set, comfortable sigmas none. The
    worst-case sub-cell offset shifts the window asymmetrically (|d-sub|
    peaks at d-1 for positive d), so negative corners bite first."""
    from pcr_tpu.engine.tpu_backend import gauss_corr_offsets
    assert gauss_corr_offsets(2, 0.5, 0.5) is None        # dense
    assert gauss_corr_offsets(3, 1.0, 1.0) == ((-3, -3),)
    assert gauss_corr_offsets(6, 2.0, 2.0) == ()          # plain separable
    offs = gauss_corr_offsets(4, 1.2, 1.2)
    assert offs is not None and (-4, -4) in offs and (4, 4) not in offs


@pytest.mark.parametrize("sigma", [1.0, 1.3])
def test_gaussian_small_sigma_corr_pass_matches_oracle(monkeypatch, sigma):
    """Mildly-small uniform sigmas route to the separable splat PLUS the
    exact-cancellation product-cutoff correction (gauss_corr_offsets)
    instead of the dense kernel — NaN footprints must stay exact and
    values within the parity bar."""
    from pcr_tpu.engine.tpu_backend import (gauss_corr_offsets,
                                            gauss_product_cutoff_bites)
    import math
    r = math.ceil(3.0 * sigma)
    assert gauss_product_cutoff_bites(r, sigma, sigma)
    offs = gauss_corr_offsets(r, sigma, sigma)
    assert offs, "corr offsets expected to engage for this sigma"
    gc = make_grid_config(w=200.0, h=150.0)
    spec = pcr.gaussian_splat_spec("v", default_sigma=float(sigma),
                                   max_radius_cells=8.0)
    oracle = run(pcr.ExecutionMode.CPU, [spec], gc, False, monkeypatch)
    got = run(pcr.ExecutionMode.GPU, [spec], gc, True, monkeypatch)
    assert_close(oracle, got, atol=1e-4)


def test_gaussian_small_sigma_corr_footprint_exact(monkeypatch):
    """A point whose window corner falls below the product cutoff: the
    corrected separable path must reproduce the oracle's NaN footprint
    EXACTLY (the corner deposit cancels to +0.0 bitwise)."""
    gc = make_grid_config(w=64.0, h=64.0)
    monkeypatch.setenv("PCR_PALLAS", "interpret")
    spec = pcr.gaussian_splat_spec("v", default_sigma=1.0,
                                   max_radius_cells=8.0)
    # sub-cell offsets near 1.0 maximize the corner distance: the (-3,-3)
    # corner's product weight dips under 1e-6 while both axis factors pass
    c = pcr.PointCloud.create(4)
    c.set_x_array(np.array([32.99, 10.97, 50.01, 20.5]))
    c.set_y_array(np.array([32.99, 40.98, 12.02, 20.5]))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", np.ones(4, np.float32))
    import copy
    bands = {}
    for mode in (pcr.ExecutionMode.CPU, pcr.ExecutionMode.GPU):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [copy.deepcopy(spec)]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        p.ingest(c)
        p.finalize()
        bands[mode] = p.result().band_array(0).copy()
    a, b = bands[pcr.ExecutionMode.CPU], bands[pcr.ExecutionMode.GPU]
    assert (np.isnan(a) == np.isnan(b)).all(), "NaN footprint mismatch"
    m = ~np.isnan(a)
    assert float(np.abs(a[m] - b[m]).max()) <= 1e-5


def test_gaussian_pallas_tiled_clipping(monkeypatch):
    gc = make_grid_config(w=200.0, h=150.0, tile=64)
    spec = pcr.gaussian_splat_spec("v", default_sigma=2.0,
                                   max_radius_cells=6.0)
    oracle = run(pcr.ExecutionMode.CPU, [spec], gc, False, monkeypatch)
    got = run(pcr.ExecutionMode.GPU, [spec], gc, True, monkeypatch)
    assert_close(oracle, got)


def test_pallas_multi_ingest_accumulates(monkeypatch):
    gc = make_grid_config(w=200.0, h=150.0)
    monkeypatch.setenv("PCR_PALLAS", "interpret")
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [pcr.ReductionSpec(value_channel="v", type=RT.Count)]
    cfg.exec_mode = pcr.ExecutionMode.GPU
    p = pcr.Pipeline.create(cfg)
    p.ingest(cloud(seed=1))
    p.ingest(cloud(seed=2))
    p.finalize()
    total = np.nansum(p.result().band_array(0))
    assert total == p.stats().points_processed


def test_line_rect_pallas_matches_oracle(monkeypatch):
    """Line glyphs via the rect-mode fused splat (pallas) must match the
    oracle cell-for-cell (closed-form Bresenham runs)."""
    gc = make_grid_config(w=200.0, h=150.0)
    spec = pcr.line_splat_spec("v", default_direction=0.7,
                               default_half_length=5.0,
                               max_radius_cells=8.0)
    oracle = run(pcr.ExecutionMode.CPU, [spec], gc, False, monkeypatch)
    got = run(pcr.ExecutionMode.GPU, [spec], gc, True, monkeypatch)
    assert_close(oracle, got)


def test_line_rect_pallas_per_point_tiled(monkeypatch):
    gc = make_grid_config(w=200.0, h=150.0, tile=64)
    c = cloud()
    rng = np.random.default_rng(5)
    n = c.count()
    c.add_channel("dir", pcr.DataType.Float32)
    c.set_channel_array_f32("dir",
                            rng.uniform(0, 6.28, n).astype(np.float32))
    c.add_channel("hl", pcr.DataType.Float32)
    c.set_channel_array_f32("hl",
                            rng.uniform(0.5, 6.0, n).astype(np.float32))
    spec = pcr.line_splat_spec("v", direction_channel="dir",
                               half_length_channel="hl",
                               max_radius_cells=8.0)
    import copy

    def run_cloud(mode, pallas):
        if pallas:
            monkeypatch.setenv("PCR_PALLAS", "interpret")
        else:
            monkeypatch.setenv("PCR_PALLAS", "0")
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [copy.deepcopy(spec)]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        p.ingest(c)
        p.finalize()
        return p.result().band_array(0).copy()

    a = run_cloud(pcr.ExecutionMode.CPU, False)
    b = run_cloud(pcr.ExecutionMode.GPU, True)
    assert (np.isnan(a) == np.isnan(b)).all()
    m = ~np.isnan(a)
    assert np.abs(a[m] - b[m]).max() <= 1e-5 + 1e-5 * np.abs(a[m]).max()


def test_rect_interpret_dot_full_precision(monkeypatch):
    """Regression: under interpret mode the rect/point contraction must
    carry full f32 value precision. XLA:CPU's simplifier folds the 3-limb
    bf16 residual dots to exact zero inside jit at production shapes
    (the kernel then truncates every accumulated value to 8 mantissa
    bits, ~4e-3 relative); interpret mode therefore uses a HIGHEST f32
    dot, which is bit-equal to the intended exact 3-limb result. The
    small shapes above don't trigger the rewrite — this runs at one
    that does (30k points, 300x300 grid)."""
    gc = make_grid_config(w=300.0, h=300.0)
    n = 30_000
    rng = np.random.default_rng(7)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, 300, n))
    c.set_y_array(rng.uniform(0, 300, n))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", rng.random(n).astype(np.float32))
    spec = pcr.line_splat_spec("v", default_direction=0.7,
                               default_half_length=4.0)
    spec.type = RT.Sum
    import copy

    def run_cloud(mode, pallas):
        monkeypatch.setenv("PCR_PALLAS", "interpret" if pallas else "0")
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [copy.deepcopy(spec)]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        p.ingest(c)
        p.finalize()
        return p.result().band_array(0).copy()

    a = run_cloud(pcr.ExecutionMode.CPU, False)
    b = run_cloud(pcr.ExecutionMode.GPU, True)
    assert (np.isnan(a) == np.isnan(b)).all()
    m = ~np.isnan(a)
    rel = np.abs(a[m] - b[m]) / np.maximum(np.abs(a[m]), 1e-12)
    assert float(rel.max()) <= 1e-5


@pytest.mark.parametrize("sigma", [0.5, 1.0])
@pytest.mark.parametrize("mode", [pcr.ExecutionMode.GPU,
                                  pcr.ExecutionMode.Hybrid])
def test_small_sigma_product_cutoff(monkeypatch, sigma, mode):
    """Regression (pattern scene02): the reference drops cells where the
    PRODUCT weight exp(-(qx^2+qy^2)/2) < 1e-6, which the separable
    per-axis factorization cannot express — at sigma <~ 1.7 the square
    3-sigma window pokes outside the cutoff ellipse and corner cells
    survived wrongly (NaN/value mismatches vs the oracle). Small-sigma
    chunks must route to the dense quadratic-form kernel. Checks the
    NaN footprint exactly and values to the reference's own CPU<->GPU
    bar (1e-4)."""
    monkeypatch.setenv("PCR_PALLAS", "interpret")
    gc = make_grid_config(w=120.0, h=100.0)
    n = 4000
    rng = np.random.default_rng(11)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, 120, n))
    c.set_y_array(rng.uniform(0, 100, n))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", rng.uniform(1, 2, n).astype(np.float32))
    spec = pcr.gaussian_splat_spec("v", default_sigma=sigma)
    import copy

    def run_cloud(m):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [copy.deepcopy(spec)]
        cfg.exec_mode = m
        p = pcr.Pipeline.create(cfg)
        p.ingest(c)
        p.finalize()
        return p.result().band_array(0).copy()

    a = run_cloud(pcr.ExecutionMode.CPU)
    b = run_cloud(mode)
    assert (np.isnan(a) == np.isnan(b)).all(), (
        f"footprint (cutoff) mismatch: {int((np.isnan(a) != np.isnan(b)).sum())} cells")
    m_ = ~np.isnan(a)
    assert float(np.abs(a[m_] - b[m_]).max()) <= 1e-4
