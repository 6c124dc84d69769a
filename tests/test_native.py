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


def test_pack_point_wire_matches_numpy():
    """The fused native staging pack must reproduce the numpy
    flatten+sentinel+field+pad chain bit-exactly for all three modes."""
    rng = np.random.default_rng(7)
    n, W, C = 10_000, 137, 137 * 53
    col = rng.integers(0, W, n).astype(np.int32)
    row = rng.integers(0, 53, n).astype(np.int32)
    valid = rng.random(n) > 0.1
    values = rng.normal(size=n).astype(np.float32)
    weights = rng.uniform(0.1, 2.0, n).astype(np.float32)
    cells_ref = np.where(valid, row.astype(np.int32) * W + col,
                         np.int32(C)).astype(np.int32)
    start, end, bucket = 100, 8_300, 16_384
    m = end - start

    def ref(f0, f1=None):
        nseg = 2 if f1 is None else 3
        out = np.zeros(nseg * bucket, np.int32)
        out[:m] = cells_ref[start:end]
        out[m:bucket] = C
        out[bucket:bucket + m] = f0[start:end].view(np.int32)
        if f1 is not None:
            out[2 * bucket:2 * bucket + m] = f1[start:end].view(np.int32)
        return out

    # mode 0: Sum/Average
    got = native.pack_point_wire(col, row, valid, values, None,
                                 start, end, bucket, W, C, 0)
    assert np.array_equal(got, ref(values))
    # mode 1: Count
    got = native.pack_point_wire(col, row, valid, values, None,
                                 start, end, bucket, W, C, 1)
    assert np.array_equal(got, ref(np.ones(n, np.float32)))
    # mode 2: WeightedAverage (f0 = v*w, f1 = w)
    got = native.pack_point_wire(col, row, valid, values, weights,
                                 start, end, bucket, W, C, 2)
    assert np.array_equal(got, ref(values * weights, weights))
    # mode 2 with missing weights -> w = 1
    got = native.pack_point_wire(col, row, valid, values, None,
                                 start, end, bucket, W, C, 2)
    assert np.array_equal(got, ref(values, np.ones(n, np.float32)))


def test_fin_kernels_match_numpy():
    """Native single-pass finalizes vs the numpy forms, bit-exact
    (reference NaN semantics: builtin_ops.h:29,42,55)."""
    if not native.available():
        pytest.skip("no native build")
    rng = np.random.default_rng(3)
    n = 10_000
    s = rng.uniform(-5, 5, n).astype(np.float32)
    c = rng.integers(0, 3, n).astype(np.float32)
    got = native.fin_avg(s, c)
    want = np.where(c > 0, s / np.where(c > 0, c, 1.0), np.nan)
    np.testing.assert_array_equal(got, want.astype(np.float32))

    FLT_MAX = np.float32(np.finfo(np.float32).max)
    m = np.where(rng.random(n) < 0.3, -FLT_MAX, s).astype(np.float32)
    np.testing.assert_array_equal(
        native.fin_sentinel(m, -FLT_MAX),
        np.where(m == -FLT_MAX, np.float32(np.nan), m))
    np.testing.assert_array_equal(
        native.fin_sentinel(-m, FLT_MAX),
        np.where(-m == FLT_MAX, np.float32(np.nan), -m))
    np.testing.assert_array_equal(
        native.fin_count(c), np.where(c > 0, c, np.float32(np.nan)))
