"""Randomized CPU-oracle ↔ JAX-engine parity fuzzing.

test_parity.py samples the axes (glyph kinds, filters, tiling, chunking)
one at a time; this file samples the COMBINATION space — each seeded case
draws a random grid, tiling, multi-spec mix (point reductions + glyph
splats), optional filter, and multi-cloud ingest, and asserts the same
1e-5 parity bar with an exact NaN footprint. Seeds are fixed, so failures
reproduce; the intent mirrors the reference's system-level pattern sweep
(scripts/patterns/compare_cpu_gpu_patterns.py) but over randomly composed
pipelines rather than curated scenes.
"""

import numpy as np
import pytest

import pcr_tpu as pcr
from conftest import make_grid_config
from test_parity import assert_parity, run_mode

RT = pcr.ReductionType

POINT_TYPES = [RT.Sum, RT.Average, RT.Count, RT.Max, RT.Min]


def fuzz_cloud(rng, w, h, n):
    c = pcr.PointCloud.create(n)
    # straddle the bbox so out-of-grid masking and edge clamping fuzz too
    c.set_x_array(rng.uniform(-4, w + 4, n))
    c.set_y_array(rng.uniform(-4, h + 4, n))
    for name, arr in [
        ("v", rng.normal(0, 3, n)),
        ("w", rng.uniform(0.05, 4.0, n)),
        ("ts", rng.uniform(0, 50, n)),
        ("sig", rng.uniform(0.6, 3.5, n)),
        ("rot", rng.uniform(-np.pi, np.pi, n)),
        ("dir", rng.uniform(0, 2 * np.pi, n)),
        ("hl", rng.uniform(0.3, 5.0, n)),
    ]:
        c.add_channel(name, pcr.DataType.Float32)
        c.set_channel_array_f32(name, arr.astype(np.float32))
    return c


def random_spec(rng):
    kind = rng.choice(["point", "gauss", "line"])
    if kind == "point":
        t = POINT_TYPES[rng.integers(len(POINT_TYPES))]
        s = pcr.ReductionSpec(value_channel="v", type=t)
        if t in (RT.Sum, RT.Average) and rng.random() < 0.3:
            s = pcr.ReductionSpec(value_channel="v",
                                  type=RT.WeightedAverage,
                                  weight_channel="w")
        return s
    if kind == "gauss":
        kw = {}
        if rng.random() < 0.4:
            kw["sigma_x_channel"] = "sig"
            kw["sigma_y_channel"] = "sig"
        else:
            kw["default_sigma_x"] = float(rng.uniform(0.6, 4.0))
            kw["default_sigma_y"] = float(rng.uniform(0.6, 4.0))
        if rng.random() < 0.5:
            kw["default_rotation"] = float(rng.uniform(-1.5, 1.5))
        return pcr.gaussian_splat_spec(
            "v", max_radius_cells=float(rng.integers(4, 13)), **kw)
    if rng.random() < 0.5:
        return pcr.line_splat_spec(
            "v", direction_channel="dir", half_length_channel="hl",
            max_radius_cells=float(rng.integers(4, 11)))
    return pcr.line_splat_spec(
        "v", default_direction=float(rng.uniform(0, np.pi)),
        default_half_length=float(rng.uniform(0.5, 4.0)),
        max_radius_cells=float(rng.integers(4, 11)))


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_combined_pipeline(seed):
    rng = np.random.default_rng(1000 + seed)
    w = float(rng.integers(40, 130))
    h = float(rng.integers(40, 130))
    tile = int(rng.choice([4096, 32, 48]))
    gc = make_grid_config(w=w, h=h, tile=tile)
    nspec = int(rng.integers(1, 4))
    specs = [random_spec(rng) for _ in range(nspec)]
    nclouds = int(rng.integers(1, 3))
    clouds = [fuzz_cloud(rng, w, h, int(rng.integers(800, 4000)))
              for _ in range(nclouds)]
    assert_parity(specs, clouds, gc)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_filtered_pipeline(seed):
    rng = np.random.default_rng(2000 + seed)
    w, h = float(rng.integers(50, 110)), float(rng.integers(50, 110))
    gc = make_grid_config(w=w, h=h)
    specs = [random_spec(rng) for _ in range(int(rng.integers(1, 3)))]
    clouds = [fuzz_cloud(rng, w, h, 2500)]
    op = [pcr.CompareOp.Greater, pcr.CompareOp.LessEqual][seed % 2]
    filt = pcr.FilterSpec().add("w", op, float(rng.uniform(0.5, 2.5)))
    a = run_mode(pcr.ExecutionMode.CPU, specs, clouds, gc, filter=filt)
    b = run_mode(pcr.ExecutionMode.GPU, specs, clouds, gc, filter=filt)
    for i, (x, y) in enumerate(zip(a, b)):
        assert (np.isnan(x) == np.isnan(y)).all(), f"spec {i} NaN mismatch"
        m = ~np.isnan(x)
        if m.any():
            excess = np.abs(x[m] - y[m]) - (1e-5 + 1e-5 * np.abs(x[m]))
            assert float(excess.max()) <= 0, f"spec {i}"


MESH_POINT_TYPES = POINT_TYPES + [RT.MostRecent]


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_mesh_pipeline(seed):
    """Round-5 fuzz over the MESH engines: random grid/tiling x spec mix
    x (dp, sp) split, vs the CPU oracle. Single-tile grids exercise the
    shard_map fast paths (incl. the Max/Min/MostRecent packed scatter
    with kind-aware dp collectives); multi-tile grids exercise the
    partitioned per-device engines with row-offset home-tile clips."""
    rng = np.random.default_rng(3000 + seed)
    w = float(rng.integers(40, 130))
    h = float(rng.integers(40, 130))
    tile = int(rng.choice([4096, 32, 48]))
    gc = make_grid_config(w=w, h=h, tile=tile)
    nspec = int(rng.integers(1, 4))
    specs = []
    for _ in range(nspec):
        if rng.random() < 0.4:
            t = MESH_POINT_TYPES[rng.integers(len(MESH_POINT_TYPES))]
            if t == RT.MostRecent:
                specs.append(pcr.ReductionSpec(
                    value_channel="v", type=t, timestamp_channel="ts"))
            else:
                specs.append(pcr.ReductionSpec(value_channel="v", type=t))
        else:
            specs.append(random_spec(rng))
    clouds = [fuzz_cloud(rng, w, h, int(rng.integers(800, 3000)))
              for _ in range(int(rng.integers(1, 3)))]
    dp, sp = [(1, 8), (2, 4), (4, 2), (8, 1)][seed % 4]
    a = run_mode(pcr.ExecutionMode.CPU, specs, clouds, gc)
    b = run_mode(pcr.ExecutionMode.GPU, specs, clouds, gc,
                 mesh_devices=8, mesh_dp=dp, mesh_sp=sp)
    for i, (x, y) in enumerate(zip(a, b)):
        assert (np.isnan(x) == np.isnan(y)).all(), f"spec {i} NaN mismatch"
        m = ~np.isnan(x)
        if m.any():
            excess = np.abs(x[m] - y[m]) - (2e-5 + 2e-5 * np.abs(x[m]))
            assert float(excess.max()) <= 0, f"spec {i}"
