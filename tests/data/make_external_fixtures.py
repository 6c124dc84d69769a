"""Regenerate the externally-produced GeoTIFF interop fixtures.

The fixtures are written by Pillow/libtiff — NOT by this library's
writer — so tests/test_grid_io.py's interop cases prove the reader
handles stock external flavors (GDAL's LZW + horizontal-predictor
default among them; reference reads these via GDAL,
src/io/grid_io.cpp:372-497). Deterministic: seed 0, fixed shapes.

Run from the repo root:  python tests/data/make_external_fixtures.py
"""

import os

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))


def arrays():
    rng = np.random.default_rng(0)
    a16 = rng.integers(0, 60000, (37, 53), dtype=np.uint16)
    af = rng.normal(size=(37, 53)).astype(np.float32)
    a8 = rng.integers(0, 255, (37, 53), dtype=np.uint8)
    a32 = rng.integers(-5000, 5000, (37, 53), dtype=np.int32)
    rgb = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    return a16, af, a8, a32, rgb


def main():
    a16, af, a8, a32, rgb = arrays()
    p = lambda name: os.path.join(HERE, name)
    # GDAL's default integer flavor: LZW + horizontal predictor
    Image.fromarray(a16).save(p("external_uint16_lzw_pred2.tif"),
                              compression="tiff_lzw", tiffinfo={317: 2})
    # float + TIFF TechNote-3 floating-point predictor
    Image.fromarray(af, mode="F").save(p("external_float32_lzw_pred3.tif"),
                                       compression="tiff_lzw",
                                       tiffinfo={317: 3})
    Image.fromarray(a8).save(p("external_uint8_deflate_pred2.tif"),
                             compression="tiff_adobe_deflate",
                             tiffinfo={317: 2})
    Image.fromarray(a32, mode="I").save(p("external_int32_raw.tif"))
    # chunky (interleaved) multi-band, multi-strip
    Image.fromarray(rgb).save(p("external_rgb_lzw_pred2_strips.tif"),
                              compression="tiff_lzw",
                              tiffinfo={317: 2, 278: 8})
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
