"""End-to-end pipeline tests (reference: tests/cpp/test_pipeline.cpp:43-482)."""

import os

import numpy as np
import pytest

import pcr_tpu as pcr
from pcr_tpu.io.geotiff import read_geotiff_band, read_geotiff_info
from conftest import make_cloud, make_grid_config

RT = pcr.ReductionType


def known_cloud():
    """4 points with known cells on a 10x10 grid (cell 1.0, north-up):
    (1.5, 9.5)→cell(1,0); (1.7, 9.2)→(1,0); (5.5, 5.5)→(5,4); (9.5,0.5)→(9,9)."""
    c = pcr.PointCloud.create(4)
    c.set_x_array(np.array([1.5, 1.7, 5.5, 9.5]))
    c.set_y_array(np.array([9.5, 9.2, 5.5, 0.5]))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", np.array([2.0, 4.0, 10.0, -1.0], np.float32))
    return c


def pipeline(gc, specs, mode=pcr.ExecutionMode.CPU, **cfg_kw):
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = specs
    cfg.exec_mode = mode
    for k, v in cfg_kw.items():
        setattr(cfg, k, v)
    return pcr.Pipeline.create(cfg)


class TestEndToEndExactValues:
    def test_sum_exact(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])
        p.ingest(known_cloud())
        p.finalize()
        band = p.result().band_array(0)
        assert band[0, 1] == 6.0          # 2 + 4
        assert band[4, 5] == 10.0
        assert band[9, 9] == -1.0
        # reference semantics (pipeline.cpp:1204-1283): Sum finalize inside a
        # touched tile yields identity 0.0 for empty cells
        assert band[0, 0] == 0.0

    def test_sum_untouched_tiles_nan(self):
        gc = make_grid_config(w=10.0, h=10.0, tile=5)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])
        c = pcr.PointCloud.create(1)
        c.set_x_array(np.array([1.5]))
        c.set_y_array(np.array([9.5]))   # cell (1, 0): tile (0, 0)
        c.add_channel("v", pcr.DataType.Float32)
        c.set_channel_array_f32("v", np.array([2.0], np.float32))
        p.ingest(c)
        p.finalize()
        band = p.result().band_array(0)
        assert band[0, 1] == 2.0
        assert band[0, 0] == 0.0           # empty cell, touched tile
        assert np.isnan(band[9, 9])        # untouched tile stays NaN
        assert np.isnan(band[0, 7])        # untouched tile (0, 1)

    def test_average_exact(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v",
                                            type=RT.Average)])
        p.ingest(known_cloud())
        p.finalize()
        band = p.result().band_array(0)
        assert band[0, 1] == 3.0
        assert np.isnan(band[5, 5])

    def test_multi_reduction(self):
        gc = make_grid_config(w=10.0, h=10.0)
        specs = [
            pcr.ReductionSpec(value_channel="v", type=RT.Sum),
            pcr.ReductionSpec(value_channel="v", type=RT.Max),
            pcr.ReductionSpec(value_channel="v", type=RT.Count,
                              output_band_name="npts"),
        ]
        p = pipeline(gc, specs)
        p.ingest(known_cloud())
        p.finalize()
        g = p.result()
        assert g.num_bands() == 3
        assert g.band_desc(0).name == f"v_{int(RT.Sum)}"
        assert g.band_desc(2).name == "npts"
        assert g.band_array(0)[0, 1] == 6.0
        assert g.band_array(1)[0, 1] == 4.0
        assert g.band_array(2)[0, 1] == 2.0

    def test_multi_cloud_accumulation(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])
        p.ingest(known_cloud())
        p.ingest(known_cloud())
        p.finalize()
        assert p.result().band_array(0)[0, 1] == 12.0
        assert p.stats().collections_processed == 2
        assert p.stats().points_processed == 8

    def test_out_of_bounds_points_dropped(self):
        gc = make_grid_config(w=10.0, h=10.0)
        c = pcr.PointCloud.create(2)
        c.set_x_array(np.array([50.0, 5.0]))
        c.set_y_array(np.array([5.0, 5.0]))
        c.add_channel("v", pcr.DataType.Float32)
        c.set_channel_array_f32("v", np.array([1.0, 1.0], np.float32))
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Count)])
        p.ingest(c)
        p.finalize()
        assert p.stats().points_processed == 1


class TestLifecycle:
    def test_result_none_before_finalize(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])
        assert p.result() is None

    def test_run_convenience(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])
        p.run([known_cloud(), known_cloud()])
        assert p.result() is not None
        assert p.result().band_array(0)[0, 1] == 12.0

    def test_geotiff_output(self, tmp_path):
        gc = make_grid_config(w=10.0, h=10.0)
        out = str(tmp_path / "out.tif")
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)],
                     output_path=out)
        p.ingest(known_cloud())
        p.finalize()
        assert os.path.exists(out)
        band = read_geotiff_band(out, 0)
        assert band[0, 1] == 6.0
        w, h, nb, crs, bounds = read_geotiff_info(out)
        assert (w, h, nb) == (10, 10, 1)
        assert crs.epsg == 3857

    def test_progress_callback(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])
        seen = []
        p.set_progress_callback(lambda info: (seen.append(info), True)[1])
        p.ingest(known_cloud())
        p.ingest(known_cloud())
        assert len(seen) == 2
        assert seen[1].collections_processed == 2
        assert seen[1].points_processed == 8
        assert seen[1].elapsed_seconds >= 0.0

    def test_cancellation(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])
        p.set_progress_callback(lambda info: False)
        with pytest.raises(pcr.PcrError, match="cancelled"):
            p.ingest(known_cloud())
        with pytest.raises(pcr.PcrError, match="cancelled"):
            p.ingest(known_cloud())


class TestValidation:
    def test_no_reductions(self):
        gc = make_grid_config(w=10.0, h=10.0)
        with pytest.raises(pcr.PcrError):
            pipeline(gc, [])

    def test_invalid_grid(self):
        gc = pcr.GridConfig()
        with pytest.raises(pcr.PcrError):
            pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)])

    def test_unregistered_reduction(self):
        gc = make_grid_config(w=10.0, h=10.0)
        with pytest.raises(pcr.PcrError, match="unregistered"):
            pipeline(gc, [pcr.ReductionSpec(value_channel="v",
                                            type=RT.Custom)])

    def test_missing_value_channel(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="nope",
                                            type=RT.Sum)])
        with pytest.raises(pcr.PcrError, match="not found"):
            p.ingest(known_cloud())

    def test_glyph_with_unsupported_reduction(self):
        gc = make_grid_config(w=10.0, h=10.0)
        spec = pcr.ReductionSpec(value_channel="v", type=RT.Max)
        spec.glyph.type = pcr.GlyphType.Gaussian
        with pytest.raises(pcr.PcrError, match="glyph"):
            pipeline(gc, [spec])

    def test_count_without_value_channel_ok(self):
        gc = make_grid_config(w=10.0, h=10.0)
        p = pipeline(gc, [pcr.ReductionSpec(type=RT.Count)])
        p.ingest(known_cloud())
        p.finalize()
        assert p.result().band_array(0)[0, 1] == 2.0


class TestStateCheckpointResume:
    def test_state_files_written(self, tmp_path):
        gc = make_grid_config(w=10.0, h=10.0)
        sd = str(tmp_path / "state")
        p = pipeline(gc, [pcr.ReductionSpec(value_channel="v", type=RT.Sum)],
                     state_dir=sd)
        p.ingest(known_cloud())
        p.finalize()
        files = []
        for root, _, names in os.walk(sd):
            files += [n for n in names if n.endswith(".pcrt")]
        assert files   # tile state persisted

    def test_resume_accumulates(self, tmp_path):
        gc = make_grid_config(w=10.0, h=10.0)
        sd = str(tmp_path / "state")
        spec = [pcr.ReductionSpec(value_channel="v", type=RT.Sum)]
        p1 = pipeline(gc, list(spec), state_dir=sd)
        p1.ingest(known_cloud())
        p1.finalize()
        # a fresh pipeline pointed at the same state dir resumes
        p2 = pipeline(gc, list(spec), state_dir=sd)
        p2.ingest(known_cloud())
        p2.finalize()
        assert p2.result().band_array(0)[0, 1] == 12.0

    def test_resume_average_state(self, tmp_path):
        gc = make_grid_config(w=10.0, h=10.0)
        sd = str(tmp_path / "state")
        spec = [pcr.ReductionSpec(value_channel="v", type=RT.Average)]
        p1 = pipeline(gc, list(spec), state_dir=sd)
        p1.ingest(known_cloud())
        p1.finalize()
        p2 = pipeline(gc, list(spec), state_dir=sd)
        p2.ingest(known_cloud())
        p2.finalize()
        # average of {2,4,2,4} is still 3
        assert p2.result().band_array(0)[0, 1] == 3.0

    def test_corrupt_state_reinitialized(self, tmp_path):
        gc = make_grid_config(w=10.0, h=10.0)
        sd = str(tmp_path / "state")
        spec = [pcr.ReductionSpec(value_channel="v", type=RT.Sum)]
        p1 = pipeline(gc, list(spec), state_dir=sd)
        p1.ingest(known_cloud())
        p1.finalize()
        # corrupt every state file
        for root, _, names in os.walk(sd):
            for n in names:
                with open(os.path.join(root, n), "wb") as f:
                    f.write(b"garbage")
        p2 = pipeline(gc, list(spec), state_dir=sd)
        p2.ingest(known_cloud())
        p2.finalize()
        assert p2.result().band_array(0)[0, 1] == 6.0   # fresh, not resumed

    @pytest.mark.parametrize("order", ["cpu_then_tpu", "tpu_then_cpu"])
    def test_resume_cross_engine(self, tmp_path, order):
        """PCRT state written by one engine resumes in the other: the
        on-disk tile-state format (io/tile_state_io.py) is the shared
        checkpoint contract, exactly like the reference's TileManager
        (tile_manager.cpp:272-302 loads whatever state files exist)."""
        gc = make_grid_config(w=10.0, h=10.0)
        sd = str(tmp_path / "state")
        spec = [pcr.ReductionSpec(value_channel="v", type=RT.Average)]
        modes = [pcr.ExecutionMode.CPU, pcr.ExecutionMode.GPU]
        if order == "tpu_then_cpu":
            modes.reverse()
        p1 = pipeline(gc, list(spec), mode=modes[0], state_dir=sd)
        p1.ingest(known_cloud())
        p1.finalize()
        p2 = pipeline(gc, list(spec), mode=modes[1], state_dir=sd)
        p2.ingest(known_cloud())
        p2.finalize()
        # average of {2,4} twice is still 3; untouched cells stay NaN
        band = p2.result().band_array(0)
        assert band[0, 1] == 3.0
        assert band[4, 5] == 10.0
        assert np.isnan(band[0, 0])


class TestHybridMode:
    def test_hybrid_matches_gpu_mode(self):
        """Hybrid pipelines host routing against device accumulation; the
        result must match the plain accelerated path exactly."""
        gc = make_grid_config(w=50.0, h=50.0)
        c = known_cloud()
        out = {}
        for mode in (pcr.ExecutionMode.GPU, pcr.ExecutionMode.Hybrid):
            p = pipeline(gc, [pcr.ReductionSpec(value_channel="v",
                                                type=RT.Sum)], mode)
            p.ingest(c)
            p.finalize()
            out[mode] = p.result().band_array(0)
        assert np.array_equal(out[pcr.ExecutionMode.GPU],
                              out[pcr.ExecutionMode.Hybrid], equal_nan=True)


def test_multichunk_fused_commit(monkeypatch):
    """A staged ingest larger than the chunk ladder splits into several
    chunks which commit as ONE fused jit call; the result must match the
    CPU oracle exactly (shrunk ladder forces >= 3 chunks)."""
    import copy

    import numpy as np

    from pcr_tpu.engine import tpu_backend as tb
    from conftest import make_grid_config

    monkeypatch.setattr(tb, "CHUNK_BUCKETS", (1024, 4096))
    gc = make_grid_config(w=100.0, h=80.0)
    rng = np.random.default_rng(3)
    n = 10_000   # -> 2x4096 + 1x4096-bucket chunks
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(-2, 102, n))
    c.set_y_array(rng.uniform(-2, 82, n))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", rng.normal(0, 1, n).astype(np.float32))
    spec = pcr.ReductionSpec(value_channel="v",
                             type=pcr.ReductionType.Average)
    outs = []
    for mode in (pcr.ExecutionMode.CPU, pcr.ExecutionMode.GPU):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [copy.deepcopy(spec)]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        if mode == pcr.ExecutionMode.GPU:
            staged = p.stage(c)
            p.ingest(staged)
            p.ingest(staged)        # repeat reuses the fused jit
        else:
            p.ingest(c)
            p.ingest(c)
        p.finalize()
        outs.append(p.result().band_array(0).copy())
    a, b = outs
    assert (np.isnan(a) == np.isnan(b)).all()
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], atol=1e-5, rtol=1e-5)


def test_priority_merge(tmp_path):
    """PriorityMerge keeps the value with the highest priority channel
    value per cell (reference types.h:44 — TODO there, implemented here);
    ties keep the first-ingested point. CPU and accelerator agree."""
    import copy

    import numpy as np

    gc = make_grid_config(w=4.0, h=1.0)
    n = 6
    c = pcr.PointCloud.create(n)
    #                 cell0  cell0  cell1  cell1  cell2  cell2(tie)
    c.set_x_array(np.array([0.5, 0.5, 1.5, 1.5, 2.5, 2.5]))
    c.set_y_array(np.full(n, 0.5))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", np.array([1, 2, 3, 4, 5, 6], np.float32))
    c.add_channel("prio", pcr.DataType.Float32)
    c.set_channel_array_f32("prio",
                            np.array([9, 1, 2, 8, 5, 5], np.float32))
    spec = pcr.ReductionSpec(value_channel="v",
                             type=pcr.ReductionType.PriorityMerge)
    spec.priority_channel = "prio"
    expected = [1.0, 4.0, 5.0]          # hi-prio wins; tie -> first point
    for mode in (pcr.ExecutionMode.CPU, pcr.ExecutionMode.GPU):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [copy.deepcopy(spec)]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        p.ingest(c)
        p.finalize()
        band = p.result().band_array(0)[0]
        assert list(band[:3]) == expected, (mode, band)
        assert np.isnan(band[3])


def test_warmup_is_side_effect_free(tmp_path):
    """warmup() pre-compiles the grid-shaped programs on a throwaway
    pipeline without touching this pipeline's state, output, or stats."""
    gc = make_grid_config()
    out = str(tmp_path / "warm.tif")
    spec = pcr.gaussian_splat_spec("v", default_sigma=1.5)
    cfg = pcr.PipelineConfig(grid=gc, reductions=[spec],
                             exec_mode=pcr.ExecutionMode.GPU,
                             output_path=out)
    p = pcr.Pipeline.create(cfg)
    p.warmup(chunk_points=64)
    assert p.stats().points_processed == 0
    assert not os.path.exists(out)
    cloud = make_cloud(500, seed=4, channels=("v",))
    p.ingest(cloud)
    p.finalize()
    cfg2 = pcr.PipelineConfig(grid=gc, reductions=[spec],
                              exec_mode=pcr.ExecutionMode.GPU)
    p2 = pcr.Pipeline.create(cfg2)
    p2.ingest(make_cloud(500, seed=4, channels=("v",)))
    p2.finalize()
    np.testing.assert_array_equal(p.result().band_array(0),
                                  p2.result().band_array(0))
