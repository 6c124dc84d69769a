"""Out-of-core pipeline tests: tiled TileManager-backed CPU ingest must
match resident-state results exactly (reference: the TileManager is always
in the loop; here it engages when state exceeds host_cache_budget)."""

import os

import numpy as np
import pytest

import pcr_tpu as pcr
from conftest import make_grid_config

RT = pcr.ReductionType


def cloud(n=30000, seed=0):
    rng = np.random.default_rng(seed)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, 200, n))
    c.set_y_array(rng.uniform(0, 200, n))
    for name in ("v", "dir", "hl", "sig"):
        c.add_channel(name, pcr.DataType.Float32)
    c.set_channel_array_f32("v", rng.normal(0, 1, n).astype(np.float32))
    c.set_channel_array_f32("dir", rng.uniform(0, 6.28, n).astype(np.float32))
    c.set_channel_array_f32("hl", rng.uniform(0.5, 4, n).astype(np.float32))
    c.set_channel_array_f32("sig", rng.uniform(0.5, 2, n).astype(np.float32))
    return c


def run(specs, tmp_path, budget=0, tile=64, seed_list=(0,)):
    import copy
    gc = make_grid_config(w=200.0, h=200.0, tile=tile)
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = copy.deepcopy(specs)
    cfg.exec_mode = pcr.ExecutionMode.CPU
    cfg.host_cache_budget = budget
    cfg.state_dir = str(tmp_path / f"state_{budget}_{tile}")
    p = pcr.Pipeline.create(cfg)
    assert p._tiled == (budget > 0)
    for s in seed_list:
        p.ingest(cloud(seed=s))
    p.finalize()
    return [p.result().band_array(i).copy() for i in range(len(specs))]


@pytest.mark.parametrize("rtype", [RT.Sum, RT.Average, RT.Max, RT.Min,
                                   RT.Count])
def test_tiled_matches_resident_point(tmp_path, rtype):
    specs = [pcr.ReductionSpec(value_channel="v", type=rtype)]
    a = run(specs, tmp_path, budget=0)
    # budget of one tile's bytes forces constant LRU eviction + reload
    b = run(specs, tmp_path, budget=64 * 64 * 4 * 2)
    assert np.array_equal(a[0], b[0], equal_nan=True)


def test_tiled_matches_resident_glyphs(tmp_path):
    specs = [
        pcr.gaussian_splat_spec("v", sigma_x_channel="sig",
                                sigma_y_channel="sig", max_radius_cells=6.0),
        pcr.line_splat_spec("v", direction_channel="dir",
                            half_length_channel="hl", max_radius_cells=6.0),
    ]
    a = run(specs, tmp_path, budget=0)
    b = run(specs, tmp_path, budget=64 * 64 * 4 * 3)
    for x, y in zip(a, b):
        assert np.array_equal(x, y, equal_nan=True)


def test_tiled_multicloud_resume(tmp_path):
    specs = [pcr.ReductionSpec(value_channel="v", type=RT.Sum)]
    # one pipeline, two clouds
    a = run(specs, tmp_path, budget=0, seed_list=(0, 1))
    # two pipelines sharing a state dir (resume), tiled
    import copy
    gc = make_grid_config(w=200.0, h=200.0, tile=64)
    for i, s in enumerate((0, 1)):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = copy.deepcopy(specs)
        cfg.exec_mode = pcr.ExecutionMode.CPU
        cfg.host_cache_budget = 64 * 64 * 4 * 2
        cfg.state_dir = str(tmp_path / "resume_state")
        p = pcr.Pipeline.create(cfg)
        p.ingest(cloud(seed=s))
        p.finalize()
    b = p.result().band_array(0)
    assert np.allclose(np.where(np.isnan(a[0]), 0, a[0]),
                       np.where(np.isnan(b), 0, b), atol=1e-5)


class TestGridMerge:
    """engine.grid_merge — init/merge/finalize state buffers
    (reference: grid_merge.cu:16-183)."""

    def test_merge_matches_joint_accumulation(self):
        from pcr_tpu.engine import grid_merge, cpu_backend as cpu
        from pcr_tpu.ops.reduction import get_reduction_info
        rng = np.random.default_rng(0)
        for rtype in (RT.Sum, RT.Average, RT.Max, RT.Min,
                      RT.WeightedAverage, RT.MostRecent):
            info = get_reduction_info(rtype)
            cells = rng.integers(0, 64, 500)
            vals = rng.normal(0, 1, 500).astype(np.float32)
            w = rng.uniform(0.1, 1, 500).astype(np.float32)
            ts = rng.uniform(0, 9, 500).astype(np.float32)
            joint = grid_merge.init_state(rtype, (8, 8))
            cpu.accumulate_point_cpu(info, joint, cells, vals, w, ts)
            a = grid_merge.init_state(rtype, (8, 8))
            b = grid_merge.init_state(rtype, (8, 8))
            cpu.accumulate_point_cpu(info, a, cells[:250], vals[:250],
                                     w[:250], ts[:250])
            cpu.accumulate_point_cpu(info, b, cells[250:], vals[250:],
                                     w[250:], ts[250:])
            merged = grid_merge.merge_state(rtype, a, b)
            out_m = grid_merge.finalize_state(rtype, merged)
            out_j = grid_merge.finalize_state(rtype, joint)
            np.testing.assert_allclose(
                np.where(np.isnan(out_m), 0, out_m),
                np.where(np.isnan(out_j), 0, out_j), atol=1e-5,
                err_msg=str(rtype))

    def test_shape_mismatch_raises(self):
        from pcr_tpu.engine import grid_merge
        a = grid_merge.init_state(RT.Sum, (4, 4))
        b = grid_merge.init_state(RT.Sum, (4, 5))
        with pytest.raises(ValueError):
            grid_merge.merge_state(RT.Sum, a, b)
