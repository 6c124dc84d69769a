"""Accumulator semantics tests
(reference: tests/cpp/test_accumulator.cpp:19-305 + test_tile_router.cpp)."""

import numpy as np
import pytest

import pcr_tpu as pcr
from pcr_tpu.engine import cpu_backend as cpu
from pcr_tpu.engine import routing
from pcr_tpu.ops.reduction import get_reduction_info
from conftest import make_grid_config

RT = pcr.ReductionType


def accumulate(rtype, cells, values, shape=(4, 4), weights=None, ts=None,
               state=None):
    info = get_reduction_info(rtype)
    if state is None:
        state = info.init_state(shape)
    st = cpu.accumulate_point_cpu(info, state,
                                  np.asarray(cells, np.int64),
                                  np.asarray(values, np.float32),
                                  None if weights is None
                                  else np.asarray(weights, np.float32),
                                  None if ts is None
                                  else np.asarray(ts, np.float32))
    assert st.ok()
    return state, info


class TestSingleBatch:
    def test_sum(self):
        state, info = accumulate(RT.Sum, [0, 0, 5], [1.0, 2.0, 7.0])
        assert state[0].ravel()[0] == 3.0
        assert state[0].ravel()[5] == 7.0

    def test_max_min(self):
        state, _ = accumulate(RT.Max, [1, 1], [3.0, -2.0])
        assert state[0].ravel()[1] == 3.0
        state, _ = accumulate(RT.Min, [1, 1], [3.0, -2.0])
        assert state[0].ravel()[1] == -2.0

    def test_count(self):
        state, _ = accumulate(RT.Count, [2, 2, 2], [9.0, 9.0, 9.0])
        assert state[0].ravel()[2] == 3.0

    def test_average_state(self):
        state, info = accumulate(RT.Average, [0, 0], [4.0, 8.0])
        assert state[0].ravel()[0] == 12.0   # sum
        assert state[1].ravel()[0] == 2.0    # count
        out = info.finalize_arrays(state)
        assert out.ravel()[0] == 6.0

    def test_weighted_average(self):
        state, info = accumulate(RT.WeightedAverage, [0, 0], [10.0, 20.0],
                                 weights=[1.0, 3.0])
        assert state[0].ravel()[0] == 70.0
        assert state[1].ravel()[0] == 4.0
        assert info.finalize_arrays(state).ravel()[0] == pytest.approx(17.5)

    def test_most_recent(self):
        state, info = accumulate(RT.MostRecent, [0, 0, 0], [1.0, 2.0, 3.0],
                                 ts=[5.0, 9.0, 7.0])
        out = info.finalize_arrays(state)
        assert out.ravel()[0] == 2.0

    def test_most_recent_tie_first_wins(self):
        state, info = accumulate(RT.MostRecent, [0, 0], [1.0, 99.0],
                                 ts=[5.0, 5.0])
        assert info.finalize_arrays(state).ravel()[0] == 1.0

    def test_empty_batch(self):
        info = get_reduction_info(RT.Sum)
        state = info.init_state((4, 4))
        st = cpu.accumulate_point_cpu(info, state, np.zeros(0, np.int64),
                                      np.zeros(0, np.float32))
        assert st.ok()
        assert (state[0] == 0).all()


class TestMultiBatch:
    def test_accumulation_across_batches(self):
        info = get_reduction_info(RT.Average)
        state = info.init_state((2, 2))
        for batch in ([1.0, 2.0], [3.0], [4.0, 5.0, 6.0]):
            cpu.accumulate_point_cpu(info, state,
                                     np.zeros(len(batch), np.int64),
                                     np.asarray(batch, np.float32))
        out = info.finalize_arrays(state)
        assert out.ravel()[0] == pytest.approx(3.5)

    def test_most_recent_across_batches_existing_wins_tie(self):
        info = get_reduction_info(RT.MostRecent)
        state = info.init_state((1, 1))
        cpu.accumulate_point_cpu(info, state, np.array([0]),
                                 np.array([1.0], np.float32),
                                 None, np.array([5.0], np.float32))
        cpu.accumulate_point_cpu(info, state, np.array([0]),
                                 np.array([2.0], np.float32),
                                 None, np.array([5.0], np.float32))
        assert info.finalize_arrays(state).ravel()[0] == 1.0


class TestRouting:
    """world→cell assignment (reference: tests/cpp/test_tile_router.cpp)."""

    def test_assign_validity(self):
        gc = make_grid_config(w=100.0, h=100.0)
        x = np.array([-1.0, 0.0, 50.0, 100.0, 101.0])
        y = np.array([50.0, 50.0, 50.0, 50.0, 50.0])
        col, row, valid = routing.assign(gc, x, y)
        assert valid.tolist() == [False, True, True, True, False]
        assert col[1] == 0 and col[3] == 99   # edge clamped

    def test_home_tile_ranges_edges(self):
        gc = make_grid_config(w=100.0, h=100.0, tile=64)
        col = np.array([0, 63, 64, 99], np.int32)
        row = np.array([0, 63, 64, 99], np.int32)
        cs, rs, ce, re = routing.home_tile_ranges(gc, col, row)
        assert cs.tolist() == [0, 0, 64, 64]
        assert ce.tolist() == [64, 64, 100, 100]

    def test_gaussian_params_signed_sigma(self):
        gc = make_grid_config(w=100.0, h=100.0)
        spec = pcr.GlyphSpec(type=pcr.GlyphType.Gaussian,
                             default_sigma_x=2.0, default_sigma_y=2.0)
        gp = routing.gaussian_params(spec, gc, np.array([10.3]),
                                     np.array([20.7]), None, None, None)
        assert gp.sx[0] == pytest.approx(2.0)
        assert gp.sy[0] == pytest.approx(-2.0)     # north-up negative
        assert gp.r[0] == 6                         # ceil(3 * max(2, -2))
        assert gp.icx[0] == 10
        assert gp.icy[0] == 79                      # floor((20.7-100)/-1)
        assert gp.sub_cx[0] == pytest.approx(0.3, abs=1e-5)

    def test_gaussian_radius_cap(self):
        gc = make_grid_config(w=100.0, h=100.0)
        spec = pcr.GlyphSpec(type=pcr.GlyphType.Gaussian,
                             default_sigma_x=50.0, default_sigma_y=50.0,
                             max_radius_cells=8.0)
        gp = routing.gaussian_params(spec, gc, np.array([50.0]),
                                     np.array([50.0]), None, None, None)
        assert gp.r[0] == 8

    def test_line_params_round_half_away(self):
        gc = make_grid_config(w=100.0, h=100.0)
        spec = pcr.GlyphSpec(type=pcr.GlyphType.Line,
                             default_direction=0.0, default_half_length=2.5)
        lp = routing.line_params(spec, gc, np.array([10.0]),
                                 np.array([50.0]), None, None)
        # fcx = 10.0, endpoints 7.5 and 12.5 → round half away: 8, 13
        assert lp.ix0[0] == 8 and lp.ix1[0] == 13


class TestGlyphValidation:
    def test_unsupported_reduction(self):
        gc = make_grid_config()
        info = get_reduction_info(RT.Max)
        st = cpu.accumulate_gaussian_cpu(
            pcr.GlyphSpec(type=pcr.GlyphType.Gaussian), RT.Max, gc,
            info.init_state((100, 100)), np.array([5.0]), np.array([5.0]),
            np.array([1.0], np.float32), None, None, None,
            np.array([5], np.int32), np.array([94], np.int32))
        assert st.code == pcr.StatusCode.NotImplemented


class TestBresenhamIterationBound:
    def test_walk_reaches_endpoint_in_max_dd_steps(self):
        """The device walk runs exactly max(ddx, ddy)+1 iterations
        (routing.LineParams.k_cells); verify by brute force that the
        reference's dual-step Bresenham always reaches the endpoint within
        that bound and visits identical cells."""
        for ddx in range(0, 40, 3):
            for ddy in range(0, 40, 3):
                for sx, sy in ((1, 1), (1, -1), (-1, 1)):
                    ix0, iy0 = 0, 0
                    ix1, iy1 = sx * ddx, sy * ddy
                    # full reference walk (loop guard 2(ddx+ddy)+2)
                    cells_full = []
                    cx, cy, err = ix0, iy0, ddx - ddy
                    for _ in range(2 * (ddx + ddy) + 3):
                        cells_full.append((cx, cy))
                        if cx == ix1 and cy == iy1:
                            break
                        e2 = 2 * err
                        if e2 > -ddy:
                            err -= ddy
                            cx += 1 if ix0 < ix1 else -1
                        if e2 < ddx:
                            err += ddx
                            cy += 1 if iy0 < iy1 else -1
                    k = max(ddx, ddy) + 1
                    assert len(cells_full) <= k, (ddx, ddy, sx, sy)
