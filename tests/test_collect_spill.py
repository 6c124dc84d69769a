"""Spill-backed Median/Percentile collect streams (engine/collect_spill.py).

Round-2 weak #6: the collect stream held ~12 B/point in host RAM forever,
breaking the streaming contract for order statistics. CollectStream spills
sorted runs to disk at PCR_COLLECT_BUDGET and merges them by cell range at
finalize; results must be identical to the all-in-RAM path.
"""

import numpy as np

import pcr_tpu as pcr
from pcr_tpu.engine.collect_spill import CollectStream
from conftest import make_grid_config, make_cloud

RT = pcr.ReductionType


def test_spilled_band_matches_in_ram():
    rng = np.random.default_rng(0)
    H = W = 64
    cells = rng.integers(0, H * W, 200_000).astype(np.int64)
    vals = rng.uniform(0, 100, 200_000).astype(np.float32)
    ram = CollectStream(budget_bytes=1 << 30)
    ram.append(cells, vals)
    spill = CollectStream(budget_bytes=1 << 16)   # ~5 KB: many runs
    for a in range(0, len(cells), 10_000):
        spill.append(cells[a:a + 10_000], vals[a:a + 10_000])
    assert spill.spilled_runs > 3
    for q in (0.5, 0.1, 0.9):
        np.testing.assert_array_equal(ram.band((H, W), q),
                                      spill.band((H, W), q))
    spill.close()
    ram.close()


def test_pipeline_median_with_spill(monkeypatch, tmp_path):
    monkeypatch.setenv("PCR_COLLECT_BUDGET", str(1 << 16))
    gc = make_grid_config(w=100.0, h=80.0)
    spec = pcr.ReductionSpec(value_channel="v", type=RT.Median)
    clouds = [make_cloud(30_000, seed=s, w=100.0, h=80.0,
                         channels=("v",)) for s in range(3)]

    def run(mode):
        cfg = pcr.PipelineConfig(grid=gc, reductions=[spec],
                                 exec_mode=mode)
        p = pcr.Pipeline.create(cfg)
        for c in clouds:
            p.ingest(c)
        assert p._collect[0].spilled_runs > 0   # budget actually engaged
        p.finalize()
        return p.result().band_array(0)

    a = run(pcr.ExecutionMode.CPU)
    monkeypatch.delenv("PCR_COLLECT_BUDGET")
    cfg = pcr.PipelineConfig(grid=gc, reductions=[spec],
                             exec_mode=pcr.ExecutionMode.CPU)
    p = pcr.Pipeline.create(cfg)
    for c in clouds:
        p.ingest(c)
    assert p._collect[0].spilled_runs == 0
    p.finalize()
    np.testing.assert_array_equal(a, p.result().band_array(0))


def test_percentile_empty_and_single_cell():
    s = CollectStream(budget_bytes=1 << 14)
    assert np.isnan(s.band((4, 4), 0.5)).all()
    s.append(np.full(5000, 7, np.int64), np.arange(5000, dtype=np.float32))
    s.append(np.full(5000, 7, np.int64),
             np.arange(5000, 10000, dtype=np.float32))
    band = s.band((4, 4), 0.5)
    # exact lower-interpolation median of 0..9999 at cell 7
    assert band.ravel()[7] == np.float32(4999.0)
    assert np.isnan(np.delete(band.ravel(), 7)).all()
    s.close()
