"""Staged parity for the quarter-slot lane-packed rotated-Gaussian splat
(pallas_kernels.build_rot_packed_pallas) against the CPU oracle.

The packed kernel reproduces the reference's rotated-Gaussian semantics
(glyph_kernels.cu:145-176: 3-sigma box AND the 1e-6 PRODUCT weight
cutoff) with per-contribution bit-equality to the unpacked 'rot' kernel;
only accumulation order differs, so value parity is fp-tolerance and the
empty-cell NaN footprint must be exact.
"""

import numpy as np
import pytest

import pcr_tpu as pcr
from conftest import make_grid_config


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    monkeypatch.setenv("PCR_PALLAS", "interpret")
    monkeypatch.setenv("PCR_ROT_PACKED", "1")


def _cloud(n, extent, seed=7):
    rng = np.random.default_rng(seed)
    c = pcr.PointCloud.create(n)
    # straddle the grid edges: window clipping must match the oracle
    c.set_x_array(rng.uniform(-3, extent + 3, n))
    c.set_y_array(rng.uniform(-3, extent + 3, n))
    c.add_channel("value", pcr.DataType.Float32)
    c.set_channel_array_f32("value", rng.uniform(0, 1, n).astype(np.float32))
    return c


def _run(gc, spec, cloud, mode, staged):
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = mode
    if staged:
        cfg.gpu_require_strict = True
    p = pcr.Pipeline.create(cfg)
    src = p.stage(cloud) if staged else cloud
    p.ingest(src)
    p.finalize()
    return p.result().band_array(0)


CASES = [
    ("rot_aniso", dict(default_sigma_x=3.0, default_sigma_y=1.2,
                       default_rotation=0.7)),
    ("rot_small", dict(default_sigma_x=0.8, default_sigma_y=0.6,
                       default_rotation=1.1)),
    ("rot_steep", dict(default_sigma_x=4.0, default_sigma_y=1.0,
                       default_rotation=-0.4)),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("rtype", ["avg", "sum"])
def test_rot_packed_staged_oracle_parity(name, kw, rtype):
    gc = make_grid_config(w=96.0, h=96.0)
    cloud = _cloud(1200, 96.0)
    spec = pcr.gaussian_splat_spec("value", **kw)
    if rtype == "sum":
        spec.type = pcr.ReductionType.Sum
    ref = _run(gc, spec, cloud, pcr.ExecutionMode.CPU, staged=False)
    got = _run(gc, spec, cloud, pcr.ExecutionMode.GPU, staged=True)
    assert (np.isnan(got) == np.isnan(ref)).all(), "NaN footprint must match"
    denom = max(float(np.nanmax(np.abs(ref))), 1e-12)
    d = float(np.nanmax(np.abs(np.nan_to_num(got) - np.nan_to_num(ref))))
    assert d / denom < 1e-4


def test_rotp_native_layout_matches_numpy(monkeypatch):
    """The fused native two-pass layout (rotp_counts + rotp_place) must
    reproduce the numpy stable-argsort layout bit-for-bit — same packed
    buffer, nsub, and E (native/router.cpp pcr_rotp_place)."""
    from pcr_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    from pcr_tpu.engine.tpu_backend import TpuEngine
    from pcr_tpu.ops.reduction import get_reduction_info

    gc = make_grid_config(w=200.0, h=136.0)
    spec = pcr.gaussian_splat_spec("value", default_sigma_x=3.0,
                                   default_sigma_y=1.2,
                                   default_rotation=0.7)
    plans = [(spec, get_reduction_info(spec.type))]
    eng = TpuEngine(gc, plans)

    rng = np.random.default_rng(3)
    n = 5000
    icx = rng.integers(-4, 204, n)
    icy = rng.integers(-4, 140, n)
    r = rng.integers(0, 9, n)
    valid = rng.random(n) > 0.1
    W1, H1 = gc.width - 1, gc.height - 1
    wlo = np.where(valid, np.maximum(icx - r, 0), 1).astype(np.float32)
    whi = np.where(valid, np.minimum(icx + r, W1), 0).astype(np.float32)
    rlo = np.where(valid, np.clip(icy - r, 0, H1), 0).astype(np.float32)
    rhi = np.where(valid, np.clip(icy + r, 0, H1), 0).astype(np.float32)
    segs = [(rng.random(n).astype(np.float32), 0.0) for _ in range(3)]

    from pcr_tpu.engine.pallas_kernels import padded_width
    ncb = padded_width(gc.width) // 128
    got = eng._bucket_blocks_2d_packed(rlo, rhi, wlo, whi, ncb, 256,
                                       segs, 16)
    monkeypatch.setattr(native, "available", lambda: False)
    want = eng._bucket_blocks_2d_packed(rlo, rhi, wlo, whi, ncb, 256,
                                        segs, 16)
    assert got[1] == want[1] and got[2] == want[2]
    assert np.array_equal(got[0], want[0])


def test_rot_packed_multitile_clip():
    """Multi-tile grids keep the reference's home-tile glyph clip
    (window bounds are host-folded into [wlo,whi]x[rlo,rhi])."""
    gc = make_grid_config(w=96.0, h=96.0, tile=48)
    cloud = _cloud(800, 96.0, seed=11)
    spec = pcr.gaussian_splat_spec("value", default_sigma_x=2.5,
                                   default_sigma_y=1.0,
                                   default_rotation=0.5)
    ref = _run(gc, spec, cloud, pcr.ExecutionMode.CPU, staged=False)
    got = _run(gc, spec, cloud, pcr.ExecutionMode.GPU, staged=True)
    assert (np.isnan(got) == np.isnan(ref)).all()
    d = float(np.nanmax(np.abs(np.nan_to_num(got) - np.nan_to_num(ref))))
    assert d < 1e-4
