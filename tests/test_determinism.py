"""Determinism tests — replaces the reference's OpenMP threading suite
(tests/cpp/test_threading.cpp:53-553).

The reference validates that N-thread results match single-thread results;
this framework's claim is stronger: accumulation is deterministic by
construction (sorted scatter, no float atomics), so repeated runs are
bit-identical in BOTH execution modes.
"""

import numpy as np
import pytest

import pcr_tpu as pcr
from conftest import make_grid_config

RT = pcr.ReductionType


def big_cloud(n=30000, seed=11):
    rng = np.random.default_rng(seed)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, 100, n))
    c.set_y_array(rng.uniform(0, 100, n))
    c.add_channel("v", pcr.DataType.Float32)
    # adversarial values: wide dynamic range makes float add order visible
    vals = (rng.normal(0, 1, n) * 10.0 ** rng.integers(-3, 4, n))
    c.set_channel_array_f32("v", vals.astype(np.float32))
    c.add_channel("ts", pcr.DataType.Float32)
    c.set_channel_array_f32("ts", rng.uniform(0, 1, n).astype(np.float32))
    return c


def run(mode, specs):
    gc = make_grid_config(w=100.0, h=100.0)
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    import copy
    cfg.reductions = copy.deepcopy(specs)
    cfg.exec_mode = mode
    p = pcr.Pipeline.create(cfg)
    p.ingest(big_cloud())
    p.finalize()
    return [p.result().band_array(i).copy()
            for i in range(len(cfg.reductions))]


SPECS = [
    pcr.ReductionSpec(value_channel="v", type=RT.Sum),
    pcr.ReductionSpec(value_channel="v", type=RT.Average),
    pcr.ReductionSpec(value_channel="v", type=RT.Max),
    pcr.ReductionSpec(value_channel="v", type=RT.Min),
    pcr.ReductionSpec(value_channel="v", type=RT.MostRecent,
                      timestamp_channel="ts"),
]


@pytest.mark.parametrize("mode", [pcr.ExecutionMode.CPU,
                                  pcr.ExecutionMode.GPU])
def test_bit_identical_across_runs(mode):
    a = run(mode, SPECS)
    b = run(mode, SPECS)
    for x, y in zip(a, b):
        assert np.array_equal(x, y, equal_nan=True)   # bitwise identical


def test_gaussian_bit_identical():
    spec = pcr.gaussian_splat_spec("v", default_sigma=1.5,
                                   max_radius_cells=6.0)
    for mode in (pcr.ExecutionMode.CPU, pcr.ExecutionMode.GPU):
        a = run(mode, [spec])
        b = run(mode, [spec])
        assert np.array_equal(a[0], b[0], equal_nan=True)


def test_ingest_order_invariance_for_commutative_ops():
    """Sum/Max/Min/Count merge is commutative over collections up to float
    rounding; Sum uses the same per-cell order when clouds are swapped, so
    exactness is only guaranteed for order-insensitive ops here."""
    gc = make_grid_config(w=100.0, h=100.0)
    c1, c2 = big_cloud(seed=1), big_cloud(seed=2)
    for rt in (RT.Max, RT.Min, RT.Count):
        out = []
        for order in ([c1, c2], [c2, c1]):
            cfg = pcr.PipelineConfig()
            cfg.grid = gc
            cfg.reductions = [pcr.ReductionSpec(value_channel="v", type=rt)]
            cfg.exec_mode = pcr.ExecutionMode.CPU
            p = pcr.Pipeline.create(cfg)
            for c in order:
                p.ingest(c)
            p.finalize()
            out.append(p.result().band_array(0).copy())
        assert np.array_equal(out[0], out[1], equal_nan=True)


@pytest.mark.parametrize("mode", [pcr.ExecutionMode.CPU,
                                  pcr.ExecutionMode.GPU])
def test_cpu_threads_invariance(mode):
    """cpu_threads bounds the native OpenMP kernels' thread count
    (reference honors it via omp_set_num_threads, pipeline.cpp:94-98);
    1-thread and N-thread runs must be bit-identical (the reference's
    test_threading.cpp:53-553 contract). 100k points so the native
    assign path (engaged >= 65536) actually runs threaded."""
    from pcr_tpu import native
    gc = make_grid_config(w=100.0, h=100.0)
    out = []
    try:
        for nthreads in (1, 8):
            cfg = pcr.PipelineConfig()
            cfg.grid = gc
            import copy
            cfg.reductions = copy.deepcopy(SPECS)
            cfg.exec_mode = mode
            cfg.cpu_threads = nthreads
            p = pcr.Pipeline.create(cfg)
            p.ingest(big_cloud(n=100_000))
            p.finalize()
            out.append([p.result().band_array(i).copy()
                        for i in range(len(SPECS))])
    finally:
        native.set_num_threads(0)   # restore the runtime default
    for a, b in zip(*out):
        assert np.array_equal(a, b, equal_nan=True)
