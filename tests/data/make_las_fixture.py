"""Generate the committed LAS 1.2 interop fixture byte-by-byte.

This writer is INDEPENDENT of pcr_tpu.io (pure struct/numpy, following
the ASPRS LAS 1.2 specification directly: 227-byte public header block,
point data record format 1), so tests reading it exercise the native LAS
reader on a file the library did not write — the stand-in for a real
public-domain tile in this zero-egress environment (reference equivalent:
scripts/data/test_dc_lidar.py streams real DC tiles via laspy).

Deterministic: seed 12. Coordinates sit at UTM-scale absolute offsets
(the DC frame magnitude) with 0.01 m scale, so every stored coordinate
is exactly representable and the expected world doubles are known in
closed form (ix * 0.01 + offset).

Run from the repo root:  python tests/data/make_las_fixture.py
"""

import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

N = 5000
SCALE = 0.01
OX, OY, OZ = 389_000.0, 4_306_000.0, 0.0


def ground_truth():
    """The fixture's exact world coordinates and channels."""
    rng = np.random.default_rng(12)
    ix = rng.integers(0, 100_000, N)              # 0..1000 m extent
    iy = rng.integers(0, 100_000, N)
    iz = rng.integers(-5_000, 15_000, N)
    x = ix * SCALE + OX
    y = iy * SCALE + OY
    z = iz * SCALE + OZ
    intensity = rng.integers(0, 65535, N).astype(np.uint16)
    classification = rng.integers(1, 7, N).astype(np.uint8)
    gps_time = np.sort(rng.uniform(300_000.0, 300_600.0, N))
    return dict(ix=ix, iy=iy, iz=iz, x=x, y=y, z=z,
                intensity=intensity, classification=classification,
                gps_time=gps_time)


def main():
    g = ground_truth()
    hdr = bytearray(227)
    hdr[0:4] = b"LASF"
    struct.pack_into("<H", hdr, 4, 0)              # file source id
    struct.pack_into("<H", hdr, 6, 1)              # global encoding (GPS std)
    hdr[24] = 1                                    # version 1.2
    hdr[25] = 2
    hdr[26:26 + 20] = b"EXTERNAL FIXTURE GEN"      # system identifier
    hdr[58:58 + 16] = b"make_las_fixture"          # generating software
    struct.pack_into("<HH", hdr, 90, 229, 2025)    # day/year
    struct.pack_into("<H", hdr, 94, 227)           # header size
    struct.pack_into("<I", hdr, 96, 227)           # offset to point data
    struct.pack_into("<I", hdr, 100, 0)            # number of VLRs
    hdr[104] = 1                                   # point data format 1
    struct.pack_into("<H", hdr, 105, 28)           # point record length
    struct.pack_into("<I", hdr, 107, N)            # number of points
    struct.pack_into("<I", hdr, 111, N)            # points by return[0]
    struct.pack_into("<3d", hdr, 131, SCALE, SCALE, SCALE)
    struct.pack_into("<3d", hdr, 155, OX, OY, OZ)
    struct.pack_into("<6d", hdr, 179,
                     g["x"].max(), g["x"].min(),
                     g["y"].max(), g["y"].min(),
                     g["z"].max(), g["z"].min())

    rec = np.zeros(N, dtype=np.dtype([
        ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
        ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
        ("scan_angle", "i1"), ("user_data", "u1"),
        ("point_source_id", "<u2"), ("gps_time", "<f8")]))
    rec["X"] = g["ix"]
    rec["Y"] = g["iy"]
    rec["Z"] = g["iz"]
    rec["intensity"] = g["intensity"]
    rec["flags"] = 0b00001001          # return 1 of 1
    rec["classification"] = g["classification"]
    rec["point_source_id"] = 7001
    rec["gps_time"] = g["gps_time"]
    assert rec.dtype.itemsize == 28

    path = os.path.join(HERE, "external_tile_las12_pf1.las")
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(rec.tobytes())
    print("wrote", path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
