"""Unit tests for the hybrid device-expansion building blocks
(engine/device_prep.py): the payload-carrying sort layout and its
pad-block machinery, independent of the Pallas kernel."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pcr_tpu.engine.device_prep import (  # noqa: E402
    aligned_sorted_planes, pack_u16_pair, _unpack16)


def layout(eb_np, nblocks, block):
    raw = len(eb_np)
    npad = nblocks * block
    E0 = raw + npad
    assert E0 % block == 0
    nsub_pad = E0 // block
    eb = jnp.concatenate([jnp.asarray(eb_np, jnp.int32),
                          jnp.full(npad, np.int32(nblocks))])
    payload = jnp.concatenate([jnp.arange(raw, dtype=jnp.int32) + 1,
                               jnp.zeros(npad, jnp.int32)])
    planes, bids = aligned_sorted_planes(eb, [payload], nblocks,
                                         block, nsub_pad)
    return (np.asarray(planes[0]), np.asarray(bids), nsub_pad)


def test_every_block_gets_a_subchunk_even_when_empty():
    nblocks, block = 4, 8
    eb = np.full(16, 2, np.int32)          # all entries in block 2
    plane, bids, nsub = layout(eb, nblocks, block)
    # visit-all contract: every block id appears at least once
    assert set(range(nblocks)) <= set(bids.tolist())
    # bids ascending (grouped layout)
    assert (np.diff(bids) >= 0).all()


def test_entries_grouped_and_order_preserved():
    rng = np.random.default_rng(0)
    nblocks, block = 8, 16
    eb = rng.integers(0, nblocks, 256).astype(np.int32)
    plane, bids, nsub = layout(eb, nblocks, block)
    got = {}
    for s in range(nsub):
        b = bids[s]
        for v in plane[s]:
            if v > 0:
                got.setdefault(b, []).append(v)
    for b in range(nblocks):
        want = [i + 1 for i in np.flatnonzero(eb == b)]
        assert got.get(b, []) == want, f"block {b} entries wrong/reordered"


def test_dead_entries_sort_behind_live_blocks():
    """Dead entries (eb == nblocks) sort after every live block; their
    payloads pass through verbatim (the CALLERS pre-fill dead payload
    slots with each segment's dead encoding, e.g. r == -1)."""
    nblocks, block = 2, 8
    eb = np.array([0, 1, 2, 2, 0, 2, 2, 2], np.int32)   # 2 == dead
    plane, bids, nsub = layout(eb, nblocks, block)
    live = {1, 2, 5}                      # entry ids with eb < nblocks
    seen_dead_row = False
    for s in range(nsub):
        vals = {int(v) for v in plane[s] if v > 0}
        if vals & live:
            # live rows must not appear after a dead-region row
            assert not seen_dead_row
        if vals - live:
            seen_dead_row = True
    # dead rows carry the sentinel nblocks (kernel predicates them off);
    # live rows carry real block ids
    assert bids.min() >= 0 and bids.max() <= nblocks


def test_all_dead_chunk_still_defines_every_block():
    nblocks, block = 3, 4
    eb = np.full(8, nblocks, np.int32)
    plane, bids, nsub = layout(eb, nblocks, block)
    assert set(bids.tolist()) == {0, 1, 2, nblocks}
    # the first nblocks sub-chunks are the per-block pad rows (payload
    # fill); the raw dead entries ride behind them, payloads verbatim
    assert (plane[:nblocks] == 0).all()
    assert sorted(v for row in plane[nblocks:] for v in row
                  if v > 0) == list(range(1, 9))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 32000, 100)
    b = rng.integers(0, 32000, 100)
    packed = pack_u16_pair(a & 0xFFFF, b & 0xFFFF)
    hi, lo = _unpack16(jnp.asarray(packed))
    np.testing.assert_array_equal(np.asarray(hi), a)
    np.testing.assert_array_equal(np.asarray(lo), b)
    # sign-extension: -32768 marker survives
    m = pack_u16_pair(np.array([-32768]) & 0xFFFF, np.array([0]) & 0xFFFF)
    hi, lo = _unpack16(jnp.asarray(m))
    assert int(np.asarray(hi)[0]) == -32768
