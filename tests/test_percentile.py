"""Median / Percentile — order statistics implemented as collect-based
reductions (the reference declares them but leaves them TODO,
registry.cpp:183-185)."""

import numpy as np
import pytest

import pcr_tpu as pcr
from pcr_tpu.ops.reduction import compute_percentile_band
from conftest import make_grid_config

RT = pcr.ReductionType


class TestComputePercentileBand:
    def test_exact_median(self):
        cells = np.array([0, 0, 0, 5, 5], np.int64)
        vals = np.array([3.0, 1.0, 2.0, 10.0, 20.0], np.float32)
        band = compute_percentile_band(cells, vals, (2, 4), 0.5)
        assert band[0, 0] == 2.0          # median of {1,2,3}
        assert band[1, 1] == 10.0         # lower interpolation of {10,20}
        assert np.isnan(band[0, 1])

    def test_quantiles(self):
        cells = np.zeros(10, np.int64)
        vals = np.arange(10, dtype=np.float32)
        for q, expect in [(0.0, 0.0), (0.5, 4.0), (1.0, 9.0), (0.25, 2.0)]:
            band = compute_percentile_band(cells, vals, (1, 1), q)
            assert band[0, 0] == expect

    def test_matches_numpy_quantile_lower(self):
        rng = np.random.default_rng(0)
        cells = rng.integers(0, 50, 5000).astype(np.int64)
        vals = rng.normal(0, 1, 5000).astype(np.float32)
        band = compute_percentile_band(cells, vals, (5, 10), 0.3).ravel()
        for c in range(50):
            sel = vals[cells == c]
            if len(sel):
                expect = np.quantile(sel, 0.3, method="lower")
                assert band[c] == np.float32(expect), c


@pytest.mark.parametrize("mode", [pcr.ExecutionMode.CPU,
                                  pcr.ExecutionMode.GPU])
class TestPipelinePercentile:
    def cloud(self, n=5000, seed=0):
        rng = np.random.default_rng(seed)
        c = pcr.PointCloud.create(n)
        c.set_x_array(rng.uniform(0, 20, n))
        c.set_y_array(rng.uniform(0, 20, n))
        c.add_channel("v", pcr.DataType.Float32)
        c.set_channel_array_f32("v", rng.normal(0, 1, n).astype(np.float32))
        return c

    def test_median_end_to_end(self, mode):
        gc = make_grid_config(w=20.0, h=20.0)
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [pcr.ReductionSpec(value_channel="v",
                                            type=RT.Median)]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        cloud = self.cloud()
        p.ingest(cloud)
        p.finalize()
        band = p.result().band_array(0)
        col, row, valid = gc.world_to_cell_array(cloud.x_array(),
                                                 cloud.y_array())
        v = cloud.channel_array_f32("v")
        flat = row[valid].astype(np.int64) * 20 + col[valid]
        for c in [0, 95, 210, 399]:
            sel = v[valid][flat == c]
            if len(sel):
                assert band.ravel()[c] == np.float32(
                    np.quantile(sel, 0.5, method="lower"))
            else:
                assert np.isnan(band.ravel()[c])

    def test_percentile_multi_ingest(self, mode):
        gc = make_grid_config(w=20.0, h=20.0)
        spec = pcr.ReductionSpec(value_channel="v", type=RT.Percentile)
        spec.percentile = 0.9
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [spec]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        c1, c2 = self.cloud(seed=1), self.cloud(seed=2)
        p.ingest(c1)
        p.ingest(c2)
        p.finalize()
        band = p.result().band_array(0)
        # oracle over the union of both clouds
        x = np.concatenate([c1.x_array(), c2.x_array()])
        y = np.concatenate([c1.y_array(), c2.y_array()])
        v = np.concatenate([c1.channel_array_f32("v"),
                            c2.channel_array_f32("v")])
        col, row, valid = gc.world_to_cell_array(x, y)
        flat = row[valid].astype(np.int64) * 20 + col[valid]
        sel = v[valid][flat == 111]
        if len(sel):
            assert band.ravel()[111] == np.float32(
                np.quantile(sel, 0.9, method="lower"))

    def test_mixed_with_other_reductions(self, mode):
        gc = make_grid_config(w=20.0, h=20.0)
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [
            pcr.ReductionSpec(value_channel="v", type=RT.Average),
            pcr.ReductionSpec(value_channel="v", type=RT.Median),
            pcr.ReductionSpec(value_channel="v", type=RT.Count),
        ]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        p.ingest(self.cloud())
        p.finalize()
        g = p.result()
        assert g.num_bands() == 3
        m = np.isfinite(g.band_array(1))
        assert m.any()
        # median band finite exactly where count band is finite
        assert (m == np.isfinite(g.band_array(2))).all()
