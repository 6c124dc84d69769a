"""PointCloud tests (reference: tests/cpp/test_point_cloud.cpp:12-360)."""

import numpy as np
import pytest

import pcr_tpu as pcr


class TestCreate:
    def test_empty(self):
        c = pcr.PointCloud.create(100)
        assert c.count() == 0
        assert c.capacity() == 100
        assert c.location() == pcr.MemoryLocation.Host

    def test_set_arrays_resizes(self):
        c = pcr.PointCloud.create(10)
        c.set_x_array(np.arange(5, dtype=np.float64))
        c.set_y_array(np.arange(5, dtype=np.float64) * 2)
        assert c.count() == 5
        assert c.x_array().tolist() == [0, 1, 2, 3, 4]
        assert c.y_array()[4] == 8.0

    def test_coords_are_float64(self):
        c = pcr.PointCloud.create(4)
        c.set_x_array([1.123456789012345] * 4)
        assert c.x_array().dtype == np.float64
        assert c.x_array()[0] == 1.123456789012345


class TestWrap:
    def test_wrap_external(self):
        x = np.arange(10, dtype=np.float64)
        y = np.arange(10, dtype=np.float64)
        c = pcr.PointCloud.wrap(x, y)
        assert c.count() == 10
        # non-owning view: mutating the source shows through
        x[0] = 99.0
        assert c.x_array()[0] == 99.0

    def test_wrap_mismatched(self):
        with pytest.raises(pcr.PcrError):
            pcr.PointCloud.wrap(np.zeros(3), np.zeros(4))


class TestChannels:
    def test_add_and_access(self):
        c = pcr.PointCloud.create(8)
        c.add_channel("intensity", pcr.DataType.Float32)
        c.add_channel("cls", pcr.DataType.UInt8)
        assert c.has_channel("intensity")
        assert not c.has_channel("zzz")
        assert set(c.channel_names()) == {"intensity", "cls"}
        desc = c.channel("cls")
        assert desc.dtype == pcr.DataType.UInt8
        assert c.channel("zzz") is None

    def test_duplicate_channel(self):
        c = pcr.PointCloud.create(8)
        c.add_channel("a")
        with pytest.raises(pcr.PcrError):
            c.add_channel("a")

    def test_empty_name(self):
        c = pcr.PointCloud.create(8)
        with pytest.raises(pcr.PcrError):
            c.add_channel("")

    def test_typed_roundtrip(self):
        c = pcr.PointCloud.create(4)
        c.set_x_array(np.zeros(4))
        c.add_channel("v", pcr.DataType.Float32)
        c.set_channel_array_f32("v", np.array([1, 2, 3, 4], np.float32))
        assert c.channel_array_f32("v").tolist() == [1, 2, 3, 4]

    def test_f32_view_casts_other_dtypes(self):
        c = pcr.PointCloud.create(4)
        c.set_x_array(np.zeros(4))
        c.add_channel("i", pcr.DataType.Int32)
        c.set_channel_array_f32("i", np.array([7, 8, 9, 10], np.int32))
        out = c.channel_array_f32("i")
        assert out.dtype == np.float32
        assert out.tolist() == [7, 8, 9, 10]

    def test_missing_channel_raises(self):
        c = pcr.PointCloud.create(4)
        with pytest.raises(pcr.PcrError):
            c.channel_array_f32("missing")


class TestResize:
    def test_within_capacity(self):
        c = pcr.PointCloud.create(50)
        c.set_x_array(np.zeros(50))
        c.resize(20)
        assert c.count() == 20
        assert len(c.x_array()) == 20

    def test_beyond_capacity_raises(self):
        c = pcr.PointCloud.create(10)
        with pytest.raises(pcr.PcrError):
            c.resize(11)


class TestCrs:
    def test_set_get(self):
        c = pcr.PointCloud.create(1)
        c.set_crs(pcr.CRS.from_epsg(32110))
        assert c.crs().epsg == 32110


class TestTransfer:
    def test_to_roundtrip(self):
        c = pcr.PointCloud.create(5)
        c.set_x_array(np.arange(5, dtype=np.float64))
        c.set_y_array(np.arange(5, dtype=np.float64))
        c.add_channel("v")
        c.set_channel_array_f32("v", np.ones(5, np.float32))
        d = c.to_device()
        assert d.location() == pcr.MemoryLocation.Device
        h = d.to_host()
        assert h.count() == 5
        assert h.channel_array_f32("v").tolist() == [1] * 5
