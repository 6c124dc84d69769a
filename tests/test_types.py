"""Core type tests (reference: tests/cpp/test_types.cpp:12-195)."""

import math

import pytest

import pcr_tpu as pcr
from pcr_tpu.core.types import data_type_size


class TestBBox:
    def test_default_invalid(self):
        assert not pcr.BBox().valid()

    def test_expand_point(self):
        b = pcr.BBox()
        b.expand(1.0, 2.0)
        b.expand(-3.0, 5.0)
        assert b.valid()
        assert b.min_x == -3.0 and b.max_x == 1.0
        assert b.min_y == 2.0 and b.max_y == 5.0
        assert b.width() == 4.0 and b.height() == 3.0

    def test_expand_bbox(self):
        a = pcr.BBox()
        a.expand(0.0, 0.0)
        a.expand(1.0, 1.0)
        b = pcr.BBox()
        b.expand(5.0, -2.0)
        a.expand(b)
        assert a.max_x == 5.0 and a.min_y == -2.0

    def test_expand_invalid_bbox_noop(self):
        a = pcr.BBox()
        a.expand(0.0, 0.0)
        a.expand(pcr.BBox())   # invalid — ignored
        assert a.max_x == 0.0

    def test_contains_inclusive_edges(self):
        b = pcr.BBox()
        b.expand(0.0, 0.0)
        b.expand(10.0, 10.0)
        assert b.contains(0.0, 0.0)
        assert b.contains(10.0, 10.0)
        assert b.contains(5.0, 5.0)
        assert not b.contains(-0.001, 5.0)
        assert not b.contains(5.0, 10.001)


class TestCRS:
    def test_from_epsg(self):
        crs = pcr.CRS.from_epsg(3857)
        assert crs.is_valid()
        assert crs.epsg == 3857
        assert crs.is_projected()
        assert not crs.is_geographic()

    def test_geographic(self):
        crs = pcr.CRS.from_epsg(4326)
        assert crs.is_geographic()
        assert not crs.is_projected()

    def test_from_wkt_roundtrip(self):
        src = pcr.CRS.from_epsg(32618)
        crs = pcr.CRS.from_wkt(src.wkt)
        assert crs.epsg == 32618
        assert crs.is_projected()

    def test_from_wkt_garbage_raises(self):
        with pytest.raises(pcr.PcrError):
            pcr.CRS.from_wkt("this is not WKT")
        with pytest.raises(pcr.PcrError):
            pcr.CRS.from_wkt("")

    def test_equivalence(self):
        a = pcr.CRS.from_epsg(3857)
        b = pcr.CRS.from_epsg(3857)
        c = pcr.CRS.from_epsg(4326)
        assert a.equivalent_to(b)
        assert not a.equivalent_to(c)
        assert not pcr.CRS().equivalent_to(a)

    def test_invalid_epsg(self):
        with pytest.raises(pcr.PcrError):
            pcr.CRS.from_epsg(0)

    def test_default_invalid(self):
        assert not pcr.CRS().is_valid()


class TestDataType:
    @pytest.mark.parametrize("dt,size", [
        (pcr.DataType.Float32, 4), (pcr.DataType.Float64, 8),
        (pcr.DataType.Int32, 4), (pcr.DataType.UInt32, 4),
        (pcr.DataType.Int16, 2), (pcr.DataType.UInt16, 2),
        (pcr.DataType.UInt8, 1),
    ])
    def test_sizes(self, dt, size):
        assert data_type_size(dt) == size


class TestStatus:
    def test_success(self):
        st = pcr.Status.success()
        assert st.ok()
        assert bool(st)
        assert st.code == pcr.StatusCode.Ok

    def test_error(self):
        st = pcr.Status.error(pcr.StatusCode.InvalidArgument, "bad")
        assert not st.ok()
        assert not bool(st)
        assert "bad" in st.message

    def test_pcr_error_carries_status(self):
        st = pcr.Status.error(pcr.StatusCode.IoError, "io broke")
        err = pcr.PcrError(st)
        assert err.status.code == pcr.StatusCode.IoError
        assert "io broke" in str(err)


class TestNoDataPolicy:
    def test_nan_default(self):
        p = pcr.NoDataPolicy()
        assert math.isnan(p.sentinel())

    def test_custom_value(self):
        p = pcr.NoDataPolicy(value=-9999.0, use_nan=False)
        assert p.sentinel() == -9999.0


class TestTileIndex:
    def test_eq_lt(self):
        a = pcr.TileIndex(row=1, col=2)
        b = pcr.TileIndex(row=1, col=2)
        c = pcr.TileIndex(row=2, col=0)
        assert a == b
        assert a < c
        assert not (c < a)
        assert pcr.TileIndex(row=1, col=1) < a
