"""PCRT tile-state format tests
(reference: tests/cpp/test_tile_state_io.cpp:36-366)."""

import os
import struct

import numpy as np

import pcr_tpu as pcr
from pcr_tpu.io.tile_state_io import (
    read_tile_state, read_tile_state_header, tile_state_filename,
    write_tile_state,
)

RT = pcr.ReductionType


def test_roundtrip(tmp_path):
    tile = pcr.TileIndex(row=3, col=7)
    state = np.arange(2 * 4 * 5, dtype=np.float32)
    path = str(tmp_path / "t.pcrt")
    st = write_tile_state(path, tile, 4, 5, 2, RT.Average, state)
    assert st.ok()
    out, st = read_tile_state(path)
    assert st.ok()
    t, cols, rows, sf, rtype, data = out
    assert t == tile and cols == 4 and rows == 5 and sf == 2
    assert rtype == RT.Average
    assert np.array_equal(data, state)


def test_multi_state_float(tmp_path):
    state = np.random.default_rng(0).random(3 * 8 * 8).astype(np.float32)
    path = str(tmp_path / "t.pcrt")
    assert write_tile_state(path, pcr.TileIndex(), 8, 8, 3, RT.Sum, state).ok()
    out, st = read_tile_state(path)
    assert st.ok()
    assert np.array_equal(out[5], state)


def test_header_only_read(tmp_path):
    path = str(tmp_path / "t.pcrt")
    state = np.zeros(16, np.float32)
    write_tile_state(path, pcr.TileIndex(row=1, col=2), 4, 4, 1, RT.Max, state)
    out, st = read_tile_state_header(path)
    assert st.ok()
    tile, cols, rows, sf, rtype = out
    assert tile == pcr.TileIndex(row=1, col=2)
    assert (cols, rows, sf) == (4, 4, 1)
    assert rtype == RT.Max


def test_special_floats(tmp_path):
    path = str(tmp_path / "t.pcrt")
    state = np.array([np.nan, np.inf, -np.inf, 0.0], np.float32)
    write_tile_state(path, pcr.TileIndex(), 2, 2, 1, RT.Sum, state)
    out, st = read_tile_state(path)
    assert st.ok()
    data = out[5]
    assert np.isnan(data[0])
    assert np.isinf(data[1]) and data[1] > 0
    assert np.isinf(data[2]) and data[2] < 0


def test_nonexistent_file():
    out, st = read_tile_state("/nonexistent/tile.pcrt")
    assert out is None
    assert st.code == pcr.StatusCode.IoError


def test_corrupt_magic(tmp_path):
    path = str(tmp_path / "bad.pcrt")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 40)
    out, st = read_tile_state(path)
    assert out is None and st.code == pcr.StatusCode.IoError


def test_truncated_body(tmp_path):
    path = str(tmp_path / "t.pcrt")
    state = np.zeros(16, np.float32)
    write_tile_state(path, pcr.TileIndex(), 4, 4, 1, RT.Sum, state)
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-8])
    out, st = read_tile_state(path)
    assert out is None and st.code == pcr.StatusCode.IoError


def test_size_mismatch_rejected(tmp_path):
    st = write_tile_state(str(tmp_path / "t.pcrt"), pcr.TileIndex(),
                          4, 4, 2, RT.Average, np.zeros(16, np.float32))
    assert not st.ok()


def test_invalid_dims_rejected(tmp_path):
    st = write_tile_state(str(tmp_path / "t.pcrt"), pcr.TileIndex(),
                          0, 4, 1, RT.Sum, np.zeros(0, np.float32))
    assert st.code == pcr.StatusCode.InvalidArgument


def test_filename_format():
    assert tile_state_filename("/tmp/s", pcr.TileIndex(row=3, col=12)) == \
        "/tmp/s/tile_0003_0012.pcrt"
    assert tile_state_filename("", pcr.TileIndex()) == "tile_0000_0000.pcrt"


def test_header_binary_layout(tmp_path):
    """Byte-level check against the reference layout
    (tile_state_io.cpp:25-37)."""
    path = str(tmp_path / "t.pcrt")
    write_tile_state(path, pcr.TileIndex(row=5, col=6), 2, 3, 1,
                     RT.Count, np.zeros(6, np.float32))
    raw = open(path, "rb").read()
    magic, version = struct.unpack("<II", raw[:8])
    assert magic == 0x54524350 and version == 1
    trow, tcol, cols, rows, sf = struct.unpack("<5i", raw[8:28])
    assert (trow, tcol, cols, rows, sf) == (5, 6, 2, 3, 1)
    assert raw[28] == int(RT.Count)
    assert len(raw) == 36 + 6 * 4
