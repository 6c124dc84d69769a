"""GridConfig tests (reference: tests/cpp/test_grid_config.cpp:12-300)."""

import numpy as np

import pcr_tpu as pcr
from conftest import make_grid_config


class TestComputeDimensions:
    def test_exact(self):
        gc = make_grid_config(w=100.0, h=50.0, cell=1.0)
        assert gc.width == 100 and gc.height == 50

    def test_non_integer_cells_ceil(self):
        gc = make_grid_config(w=100.0, h=100.0, cell=3.0)
        assert gc.width == 34 and gc.height == 34   # ceil(100/3)

    def test_tiles(self):
        gc = make_grid_config(w=1000.0, h=1000.0, cell=1.0, tile=256)
        assert gc.tiles_x == 4 and gc.tiles_y == 4
        assert gc.total_tiles() == 16
        assert gc.total_cells() == 1_000_000

    def test_invalid_bounds(self):
        gc = pcr.GridConfig()
        gc.compute_dimensions()
        assert gc.width == 0 and gc.tiles_x == 0


class TestWorldToCell:
    def test_basic_and_roundtrip(self):
        gc = make_grid_config(w=100.0, h=100.0)
        # north-up: top-left cell is (0, 0) at (min_x, max_y)
        assert gc.world_to_cell(0.5, 99.5) == (0, 0)
        assert gc.world_to_cell(99.5, 0.5) == (99, 99)
        for col, row in [(0, 0), (42, 17), (99, 99)]:
            wx, wy = gc.cell_to_world(col, row)
            assert gc.world_to_cell(wx, wy) == (col, row)

    def test_outside_returns_none(self):
        gc = make_grid_config()
        assert gc.world_to_cell(-0.1, 50.0) is None
        assert gc.world_to_cell(50.0, 100.1) is None

    def test_edges_clamped_inside(self):
        gc = make_grid_config()
        # inclusive bbox edges clamp into the outermost cells
        assert gc.world_to_cell(100.0, 0.0) == (99, 99)
        assert gc.world_to_cell(0.0, 100.0) == (0, 0)

    def test_vectorized_matches_scalar(self):
        gc = make_grid_config()
        rng = np.random.default_rng(1)
        x = rng.uniform(-10, 110, 500)
        y = rng.uniform(-10, 110, 500)
        col, row, valid = gc.world_to_cell_array(x, y)
        for i in range(len(x)):
            scalar = gc.world_to_cell(x[i], y[i])
            if scalar is None:
                assert not valid[i]
            else:
                assert valid[i]
                assert (col[i], row[i]) == scalar


class TestTiles:
    def test_cell_to_tile(self):
        gc = make_grid_config(w=1000.0, h=1000.0, tile=256)
        assert gc.cell_to_tile(0, 0) == pcr.TileIndex(row=0, col=0)
        assert gc.cell_to_tile(255, 255) == pcr.TileIndex(row=0, col=0)
        assert gc.cell_to_tile(256, 0) == pcr.TileIndex(row=0, col=1)
        assert gc.cell_to_tile(999, 999) == pcr.TileIndex(row=3, col=3)

    def test_tile_cell_range_edge_clamping(self):
        gc = make_grid_config(w=1000.0, h=1000.0, tile=256)
        cs, rs, cc, rc = gc.tile_cell_range(pcr.TileIndex(row=0, col=0))
        assert (cs, rs, cc, rc) == (0, 0, 256, 256)
        cs, rs, cc, rc = gc.tile_cell_range(pcr.TileIndex(row=3, col=3))
        assert (cs, rs, cc, rc) == (768, 768, 232, 232)   # 1000 - 768

    def test_tile_bounds(self):
        gc = make_grid_config(w=1000.0, h=1000.0, tile=256)
        b = gc.tile_bounds(pcr.TileIndex(row=0, col=0))
        assert b.min_x == 0.0 and b.max_x == 256.0
        assert b.max_y == 1000.0 and b.min_y == 1000.0 - 256.0


class TestGeotransform:
    def test_north_up(self):
        gc = make_grid_config(w=100.0, h=50.0)
        gt = gc.gdal_geotransform()
        assert gt == [0.0, 1.0, 0.0, 50.0, 0.0, -1.0]


class TestValidate:
    def test_valid(self):
        assert make_grid_config().validate().ok()

    def test_invalid_bounds(self):
        gc = pcr.GridConfig()
        gc.crs = pcr.CRS.from_epsg(3857)
        st = gc.validate()
        assert not st.ok()
        assert st.code == pcr.StatusCode.InvalidArgument

    def test_zero_cell_size(self):
        gc = make_grid_config()
        gc.cell_size_x = 0.0
        assert not gc.validate().ok()

    def test_bad_tiles(self):
        gc = make_grid_config()
        gc.tile_width = 0
        assert not gc.validate().ok()

    def test_missing_dimensions(self):
        gc = make_grid_config()
        gc.width = 0
        assert not gc.validate().ok()

    def test_missing_crs(self):
        gc = make_grid_config()
        gc.crs = pcr.CRS()
        st = gc.validate()
        assert st.code == pcr.StatusCode.CrsError
