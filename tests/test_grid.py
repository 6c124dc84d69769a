"""Grid tests (reference: tests/cpp/test_grid.cpp:13-329)."""

import numpy as np
import pytest

import pcr_tpu as pcr
from conftest import make_grid_config


def bands(*names):
    return [pcr.BandDesc(name=n, dtype=pcr.DataType.Float32) for n in names]


class TestCreate:
    def test_basic(self):
        g = pcr.Grid.create(10, 20, bands("a", "b"))
        assert g.cols() == 10 and g.rows() == 20
        assert g.cell_count() == 200
        assert g.num_bands() == 2
        assert g.band_desc(0).name == "a"
        assert g.band_index("b") == 1
        assert g.band_index("nope") == -1
        assert g.location() == pcr.MemoryLocation.Host
        assert g.band_array(0).shape == (20, 10)

    def test_invalid_dims(self):
        with pytest.raises(pcr.PcrError):
            pcr.Grid.create(0, 10, bands("a"))

    def test_create_for_tile_edge(self):
        gc = make_grid_config(w=1000.0, h=1000.0, tile=256)
        g = pcr.Grid.create_for_tile(gc, pcr.TileIndex(row=3, col=3),
                                     bands("a"))
        assert g.cols() == 232 and g.rows() == 232


class TestFill:
    def test_fill_all(self):
        g = pcr.Grid.create(4, 4, bands("a", "b"))
        g.fill(7.5)
        assert (g.band_array(0) == 7.5).all()
        assert (g.band_array(1) == 7.5).all()

    def test_fill_band(self):
        g = pcr.Grid.create(4, 4, bands("a", "b"))
        g.fill_band(1, 3.0)
        assert (g.band_array(0) == 0.0).all()
        assert (g.band_array(1) == 3.0).all()

    def test_fill_band_out_of_range(self):
        g = pcr.Grid.create(4, 4, bands("a"))
        st = g.fill_band(5, 1.0)
        assert not st.ok()


class TestCopyAndSet:
    def test_copy_from(self):
        a = pcr.Grid.create(5, 5, bands("x"))
        a.fill(2.0)
        b = pcr.Grid.create(5, 5, bands("x"))
        st = b.copy_from(a)
        assert st.ok()
        assert (b.band_array(0) == 2.0).all()

    def test_copy_from_mismatch(self):
        a = pcr.Grid.create(5, 5, bands("x"))
        b = pcr.Grid.create(6, 5, bands("x"))
        assert not b.copy_from(a).ok()

    def test_set_band_array(self):
        g = pcr.Grid.create(3, 2, bands("x"))
        g.set_band_array(0, np.arange(6, dtype=np.float32).reshape(2, 3))
        assert g.band_array(0)[1, 2] == 5.0

    def test_set_band_array_wrong_shape(self):
        g = pcr.Grid.create(3, 2, bands("x"))
        with pytest.raises(pcr.PcrError):
            g.set_band_array(0, np.zeros((3, 3), np.float32))


class TestValidMask:
    def test_nan_inf(self):
        g = pcr.Grid.create(3, 1, bands("x"))
        g.set_band_array(0, np.array([[1.0, np.nan, np.inf]], np.float32))
        m = g.valid_mask(0)
        assert m.tolist() == [[True, False, True]]   # Inf is data, NaN is not


class TestTransfer:
    def test_to_device_roundtrip(self):
        g = pcr.Grid.create(8, 8, bands("x"))
        g.fill(1.25)
        d = g.to(pcr.MemoryLocation.Device)
        assert d.location() == pcr.MemoryLocation.Device
        h = d.to(pcr.MemoryLocation.Host)
        assert (np.asarray(h.band_array(0)) == 1.25).all()

    def test_large_grid(self):
        g = pcr.Grid.create(2048, 2048, bands("x"))
        g.fill(0.5)
        assert g.cell_count() == 2048 * 2048
        assert g.band_array(0)[2047, 2047] == 0.5
