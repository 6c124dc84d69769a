"""Native router kernel tests — bit-parity with the numpy path."""

import numpy as np
import pytest

from pcr_tpu import native
from pcr_tpu.engine import routing
from conftest import make_grid_config

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain for native kernels")


def test_assign_matches_numpy():
    gc = make_grid_config(w=123.0, h=77.0, cell=0.7)
    rng = np.random.default_rng(0)
    n = 200_000
    x = rng.uniform(-20, 150, n)
    y = rng.uniform(-20, 110, n)
    # sprinkle exact edges
    x[:4] = [gc.bounds.min_x, gc.bounds.max_x, gc.bounds.min_x, 50.0]
    y[:4] = [gc.bounds.min_y, gc.bounds.max_y, gc.bounds.max_y, 50.0]
    col_n, row_n, val_n = gc.world_to_cell_array(x, y)
    col_c, row_c, val_c = native.assign(gc, x, y)
    assert np.array_equal(val_n, val_c)
    assert np.array_equal(col_n, col_c)
    assert np.array_equal(row_n, row_c)


def test_assign_cells_sentinel():
    gc = make_grid_config(w=100.0, h=100.0)
    x = np.array([-5.0, 50.0, 200.0])
    y = np.array([50.0, 50.0, 50.0])
    cells = native.assign_cells(gc, x, y, sentinel=gc.total_cells())
    assert cells[0] == gc.total_cells()
    assert cells[2] == gc.total_cells()
    col, row, _ = gc.world_to_cell_array(x, y)
    assert cells[1] == row[1] * gc.width + col[1]


def test_fractional_cells_match_numpy():
    gc = make_grid_config(w=100.0, h=100.0, cell=0.5)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 50, 10_000)
    y = rng.uniform(0, 50, 10_000)
    fcx, fcy = gc.fractional_cell_array(x, y)
    icx_n = np.floor(fcx).astype(np.int32)
    icy_n = np.floor(fcy).astype(np.int32)
    sub_cx_n = (fcx - np.floor(fcx)).astype(np.float32)
    sub_cy_n = (fcy - np.floor(fcy)).astype(np.float32)
    icx, icy, sub_cx, sub_cy = native.fractional_cells(gc, x, y)
    assert np.array_equal(icx, icx_n)
    assert np.array_equal(icy, icy_n)
    assert np.array_equal(sub_cx, sub_cx_n)
    assert np.array_equal(sub_cy, sub_cy_n)


def test_routing_uses_native_transparently():
    gc = make_grid_config(w=100.0, h=100.0)
    rng = np.random.default_rng(2)
    n = 70_000   # above the native threshold
    x = rng.uniform(-10, 110, n)
    y = rng.uniform(-10, 110, n)
    col_a, row_a, val_a = routing.assign(gc, x, y)
    col_b, row_b, val_b = gc.world_to_cell_array(x, y)
    assert np.array_equal(col_a, col_b)
    assert np.array_equal(row_a, row_b)
    assert np.array_equal(val_a, val_b)


def test_native_metadata():
    L = native.lib()
    assert L.pcr_native_version() == 1
    assert L.pcr_native_threads() >= 1
