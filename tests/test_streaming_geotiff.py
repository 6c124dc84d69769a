"""StreamingGeoTiffWriter — byte-identity with write_geotiff and
round-trips through both decoders.

The streamed writer exists to overlap device→host strip transfer with
tile encoding (pipeline._finalize_streamed); given the same bands and
options it must produce the exact bytes write_geotiff produces.
"""

import numpy as np
import pytest

import pcr_tpu as pcr
from pcr_tpu.core.grid import BandDesc, Grid
from pcr_tpu.core.types import DataType
from pcr_tpu.io.geotiff import (
    GeoTiffOptions, StreamingGeoTiffWriter, lzw_decode, read_geotiff_band,
    read_geotiff_info, write_geotiff,
)
from conftest import make_grid_config


def random_bands(gc, nb, seed=0, nan_frac=0.2):
    rng = np.random.default_rng(seed)
    bands = []
    for _ in range(nb):
        b = rng.normal(0, 10, (gc.height, gc.width)).astype(np.float32)
        b[rng.random(b.shape) < nan_frac] = np.nan
        bands.append(b)
    return bands


def write_both(tmp_path, gc, bands, options):
    names = [f"band{i}" for i in range(len(bands))]
    ref = str(tmp_path / "ref.tif")
    grid = Grid.create(gc.width, gc.height,
                       [BandDesc(name=n, dtype=DataType.Float32)
                        for n in names])
    for i, b in enumerate(bands):
        grid.set_band_array(i, b)
    assert write_geotiff(ref, grid, gc, options).ok()

    streamed = str(tmp_path / "streamed.tif")
    w = StreamingGeoTiffWriter(streamed, gc, names, options)
    for b in bands:
        # deliver in ragged row chunks to exercise the buffer
        r = 0
        for k in (100, 1, 37, 200, 10**9):
            rows = b[r:r + k]
            if rows.shape[0] == 0:
                break
            w.write_rows(rows)
            r += rows.shape[0]
        w.end_band()
    assert w.close(overview_bands=bands if options.cloud_optimized
                   else None).ok()
    return ref, streamed


@pytest.mark.parametrize("compress", ["LZW", "DEFLATE", "NONE"])
def test_byte_identity_with_write_geotiff(tmp_path, compress):
    gc = make_grid_config(w=300.0, h=217.0)   # non-tile-aligned height
    bands = random_bands(gc, 2, seed=1)
    opts = GeoTiffOptions(compress=compress)
    ref, streamed = write_both(tmp_path, gc, bands, opts)
    assert open(ref, "rb").read() == open(streamed, "rb").read()


def test_roundtrip_values(tmp_path):
    gc = make_grid_config(w=520.0, h=390.0, tile=256)
    bands = random_bands(gc, 3, seed=2)
    _, streamed = write_both(tmp_path, gc, bands, GeoTiffOptions())
    width, height, nbands, _, _ = read_geotiff_info(streamed)
    assert (width, height, nbands) == (gc.width, gc.height, len(bands))
    for i, b in enumerate(bands):
        got = read_geotiff_band(streamed, i)
        np.testing.assert_array_equal(got, b)


def test_cog_overviews_match(tmp_path):
    gc = make_grid_config(w=600.0, h=600.0)
    bands = random_bands(gc, 1, seed=3, nan_frac=0.0)
    opts = GeoTiffOptions(cloud_optimized=True)
    ref, streamed = write_both(tmp_path, gc, bands, opts)
    assert open(ref, "rb").read() == open(streamed, "rb").read()


def test_row_count_mismatch_rejected(tmp_path):
    gc = make_grid_config(w=64.0, h=64.0)
    w = StreamingGeoTiffWriter(str(tmp_path / "x.tif"), gc, ["b"],
                               GeoTiffOptions())
    w.write_rows(np.zeros((10, 64), np.float32))
    with pytest.raises(pcr.PcrError):
        w.end_band()


def test_repeated_pipeline_finalize_valid(tmp_path):
    """The streamed pipeline path rewrites its output on every finalize;
    each write must decode (regression guard for a one-off corrupt tile
    seen during bring-up)."""
    import os
    gc = make_grid_config(w=300.0, h=300.0, tile=128)
    rng = np.random.default_rng(4)
    n = 30000
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, 300, n))
    c.set_y_array(rng.uniform(0, 300, n))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", rng.uniform(0, 1, n).astype(np.float32))
    out = str(tmp_path / "rep.tif")
    cfg = pcr.PipelineConfig(
        grid=gc,
        reductions=[pcr.ReductionSpec(value_channel="v",
                                      type=pcr.ReductionType.Average)],
        exec_mode=pcr.ExecutionMode.GPU, output_path=out)
    p = pcr.Pipeline.create(cfg)
    staged = p.stage(c)
    for _ in range(3):
        p.ingest(staged)
        p.finalize()
        got = read_geotiff_band(out, 0)
        np.testing.assert_allclose(got, p.result().band_array(0),
                                   atol=1e-6, equal_nan=True)
