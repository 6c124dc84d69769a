"""TileManager tests (reference: tests/cpp/test_tile_manager.cpp:41-392)."""


import numpy as np

import pcr_tpu as pcr
from pcr_tpu.engine.tile_manager import TileManager, TileManagerConfig
from pcr_tpu.ops.reduction import FLT_MAX
from conftest import make_grid_config

RT = pcr.ReductionType


def make_mgr(tmp_path, rtype=RT.Sum, cache_mb=64, tile=64):
    gc = make_grid_config(w=256.0, h=256.0, tile=tile)
    from pcr_tpu.ops.reduction import get_reduction_info
    info = get_reduction_info(rtype)
    cfg = TileManagerConfig(
        state_dir=str(tmp_path / "tiles"),
        cache_size_bytes=cache_mb * 1024 * 1024,
        state_floats=info.state_floats,
        reduction_type=rtype,
        grid_config=gc,
    )
    return TileManager.create(cfg), gc


class TestAcquireRelease:
    def test_acquire_initialises_identity(self, tmp_path):
        mgr, _ = make_mgr(tmp_path, RT.Max)
        st = mgr.acquire(pcr.TileIndex(row=0, col=0))
        assert st.shape == (1, 64, 64)
        assert (st == np.float32(-FLT_MAX)).all()
        assert mgr.cache_misses() == 1

    def test_cache_hit(self, tmp_path):
        mgr, _ = make_mgr(tmp_path)
        t = pcr.TileIndex(row=1, col=1)
        a = mgr.acquire(t)
        a[0, 0, 0] = 5.0
        b = mgr.acquire(t)
        assert b[0, 0, 0] == 5.0
        assert mgr.cache_hits() == 1
        assert mgr.tiles_in_cache() == 1

    def test_per_type_state_sizes(self, tmp_path):
        mgr, _ = make_mgr(tmp_path, RT.Average)
        st = mgr.acquire(pcr.TileIndex())
        assert st.shape[0] == 2

    def test_edge_tiles_clamped(self, tmp_path):
        mgr, gc = make_mgr(tmp_path, tile=96)   # 256/96 → edge tiles 64
        st = mgr.acquire(pcr.TileIndex(row=2, col=2))
        assert st.shape == (1, 64, 64)


class TestFlushPersistence:
    def test_flush_and_reload(self, tmp_path):
        mgr, _ = make_mgr(tmp_path)
        t = pcr.TileIndex(row=0, col=1)
        st = mgr.acquire(t)
        st[0, 3, 4] = 42.0
        mgr.release(t)
        assert mgr.flush_all().ok()
        assert mgr.tiles_on_disk() == 1
        # fresh manager resumes from disk
        mgr2, _ = make_mgr(tmp_path)
        st2 = mgr2.acquire(t)
        assert st2[0, 3, 4] == 42.0

    def test_unreleased_tiles_not_flushed(self, tmp_path):
        mgr, _ = make_mgr(tmp_path)
        mgr.acquire(pcr.TileIndex())
        mgr.flush_all()
        assert mgr.tiles_on_disk() == 0

    def test_corrupt_file_reinitialised(self, tmp_path):
        mgr, _ = make_mgr(tmp_path)
        t = pcr.TileIndex()
        st = mgr.acquire(t)
        st[0, 0, 0] = 7.0
        mgr.release(t)
        mgr.flush_all()
        path = mgr._tile_path(t)
        with open(path, "wb") as f:
            f.write(b"corrupt")
        mgr2, _ = make_mgr(tmp_path)
        st2 = mgr2.acquire(t)
        assert st2[0, 0, 0] == 0.0    # identity, not 7

    def test_mismatched_reduction_reinitialised(self, tmp_path):
        mgr, _ = make_mgr(tmp_path, RT.Sum)
        t = pcr.TileIndex()
        st = mgr.acquire(t)
        st[0, 0, 0] = 7.0
        mgr.release(t)
        mgr.flush_all()
        mgr2, _ = make_mgr(tmp_path, RT.Max)
        st2 = mgr2.acquire(t)
        assert st2[0, 0, 0] == np.float32(-FLT_MAX)


class TestLru:
    def test_eviction_flushes_dirty(self, tmp_path):
        # tiles are 64x64x4B = 16KB; budget fits exactly 2 tiles
        mgr, _ = make_mgr(tmp_path, cache_mb=0)
        mgr.config.cache_size_bytes = 2 * 64 * 64 * 4
        t0, t1, t2 = (pcr.TileIndex(row=0, col=i) for i in range(3))
        a = mgr.acquire(t0)
        a[0, 0, 0] = 1.0
        mgr.release(t0)
        mgr.acquire(t1)
        mgr.acquire(t2)        # evicts t0 (LRU) → flushed to disk
        assert mgr.tiles_in_cache() == 2
        assert mgr.tiles_on_disk() == 1
        # reloading t0 restores the flushed value
        st = mgr.acquire(t0)
        assert st[0, 0, 0] == 1.0

    def test_pinned_not_evicted(self, tmp_path):
        mgr, _ = make_mgr(tmp_path, cache_mb=0)
        mgr.config.cache_size_bytes = 2 * 64 * 64 * 4
        t0, t1, t2 = (pcr.TileIndex(row=0, col=i) for i in range(3))
        mgr.acquire(t0)
        mgr.pin(t0)
        mgr.acquire(t1)
        mgr.acquire(t2)
        assert (0, 0) in mgr._cache     # pinned survived
        assert (0, 1) not in mgr._cache  # t1 evicted instead

    def test_lru_order_updates_on_hit(self, tmp_path):
        mgr, _ = make_mgr(tmp_path, cache_mb=0)
        mgr.config.cache_size_bytes = 2 * 64 * 64 * 4
        t0, t1, t2 = (pcr.TileIndex(row=0, col=i) for i in range(3))
        mgr.acquire(t0)
        mgr.acquire(t1)
        mgr.acquire(t0)        # touch t0 → t1 becomes LRU
        mgr.acquire(t2)
        assert (0, 0) in mgr._cache
        assert (0, 1) not in mgr._cache


class TestStatsAndReset:
    def test_stats(self, tmp_path):
        mgr, _ = make_mgr(tmp_path)
        t = pcr.TileIndex()
        mgr.acquire(t)
        mgr.acquire(t)
        assert mgr.cache_hits() == 1 and mgr.cache_misses() == 1
        assert mgr.tiles_in_cache() == 1
        assert mgr.cache_size_bytes_used() == 64 * 64 * 4

    def test_tile_has_state(self, tmp_path):
        mgr, _ = make_mgr(tmp_path)
        t = pcr.TileIndex(row=1, col=0)
        assert not mgr.tile_has_state(t)
        mgr.acquire(t)
        assert mgr.tile_has_state(t)
        mgr.release(t)
        mgr.flush_all()
        mgr.clear_cache()
        assert mgr.tile_has_state(t)    # on disk

    def test_reset_removes_files(self, tmp_path):
        mgr, _ = make_mgr(tmp_path)
        t = pcr.TileIndex()
        mgr.acquire(t)
        mgr.release(t)
        mgr.flush_all()
        assert mgr.tiles_on_disk() == 1
        assert mgr.reset().ok()
        assert mgr.tiles_on_disk() == 0
        assert mgr.tiles_in_cache() == 0
