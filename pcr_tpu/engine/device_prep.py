"""Device-side glyph expansion for host-sourced (Hybrid) ingest.

The staged glyph path lays entries out row-block/col-block-contiguously on
the HOST (tpu_backend._bucket_blocks_2d) — fine when staging is untimed,
ruinous when the cloud arrives over a thin host link inside the timed
window: the 8-10 segment layout costs 32-64 B/point on the wire plus
seconds of 1-core host bucketing per chunk (the round-2 Hybrid glyph
collapse, 0.10-0.66 Mpts/s).

This module moves the whole expansion onto the device. The host ships a
minimal wire record per point —

    [cell i32 | sub_q i32 | value f32]  (+ per-point sigma/shape channels
                                           only when actually set)

12 B/point — and the jitted update program decodes it, computes the glyph
footprint, duplicates entries across the (row-block x col-block) tiles
they touch (static kmax expansion), groups them, and runs the SAME fused
Pallas kernel as the staged path (pallas_kernels.build_sorted_splat_pallas).

Grouping is ONE two-key sort that carries every segment as payload and
whose sorted order IS the kernel layout:

  * key1 = entry block id, key2 = entry index (stability keeps a
    deterministic, near-host-bucketing entry order; line values land
    within the last ulp of the staged path).
  * a static pad region of nblocks*block always-dead entries is assigned,
    on device, to blocks so every block's entry count rounds up to a
    whole number of `block`-entry sub-chunks (and every block keeps >= 1
    sub-chunk — the kernel's visit-all state-definition contract). After
    the sort each sub-chunk therefore holds exactly one block's entries:
    no gather pass, no scatter pass, just reshape.

The first cut of this path grouped with sort_key_val + gather-based
placement and enumerated line runs with jnp.searchsorted; measured on
v5e (benchmarks/profile_hybrid_device.py, 2M-point chunk) those lower to
sequential scalar-unit passes — searchsorted 656 ms, 10 per-line gathers
919 ms, gather layout 680 ms — while a 9-payload sort is 102 ms and a
scatter+cumsum 48 ms. Everything data-dependent here is therefore built
from scatter-add + cumsum (run enumeration, per-line value propagation,
pad-block assignment); the only remaining gathers are O(nblocks) tables.

Sub-cell offsets ride the wire as u16 fixed point (quantization 7.6e-6 of
a cell). The resulting raster differs from the exact staged/CPU path by
O(1e-5) relative — inside the reference's own CPU<->GPU comparison bar of
1e-4 (scripts/patterns/compare_cpu_gpu_patterns.py:28-41). Line glyphs
ship exact integer endpoints: the hybrid footprint is exact and
values match the staged path to the last ulp (run accumulation order
differs slightly).

A bonus of device-side layout: the sub-chunk count nsub is a static
function of (bucket, kmax) instead of data-dependent, so hybrid chunks
stop minting new jit keys (the round-2 per-chunk recompile suspect).

Reference semantics mirrored: glyph_kernels.cu:101-176 (Gaussian window
accumulate), pipeline.cpp:785-1152 (Hybrid producer/consumer).
"""

from __future__ import annotations

import numpy as np

from ..core.types import ReductionType
from ..ops.reduction import ReductionInfo

__all__ = ["aligned_sorted_layout", "gaussian_wire_builder",
           "line_wire_builder", "pack_u16_pair", "SUB_Q"]

SUB_Q = 65535.0   # u16 fixed-point scale for sub-cell offsets


def pack_u16_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Host-side: pack two [0, 65535] integer arrays into one int32."""
    return ((a.astype(np.int64) << 16) | b.astype(np.int64)).astype(np.int32)


def _step_count(pos, length, clip_last=False):
    """cumsum-of-scattered-markers: out[t] = #{i : pos[i] <= t} for sorted
    pos. The scatter+cumsum form of searchsorted(pos, t, side='right') —
    one pass instead of log2(len(pos)) sequential gather rounds."""
    import jax.numpy as jnp

    marker = jnp.zeros(length, jnp.int32).at[pos].add(1, mode="drop")
    return jnp.cumsum(marker)


def _propagate(pos, channels, length):
    """Forward-fill per-item values to slot resolution: slot t in
    [pos[i], pos[i+1]) receives channels[k][i], exactly, for arbitrary
    int32 bit patterns.

    Trick: scatter the telescoping differences d[i] = c[i] - c[i-1] at
    their run starts and prefix-sum. i32 add/sub wraps mod 2^32, so the
    telescoped cumsum reproduces the exact source bits even mid-overflow
    (safe for bitcast f32 payloads); coincident starts (zero-length runs)
    accumulate their diffs at one slot and telescope through.

    All channels ride ONE batched scatter and ONE batched cumsum (the
    scatter is the serialized op on TPU; batching amortizes its pass
    over every channel instead of paying it per channel).
    """
    import jax.numpy as jnp

    c = jnp.stack(channels)                       # (K, B)
    d = jnp.concatenate([c[:, :1], c[:, 1:] - c[:, :-1]], axis=1)
    m = jnp.zeros((c.shape[0], length), jnp.int32).at[:, pos].add(
        d, mode="drop")
    out = jnp.cumsum(m, axis=1)
    return [out[k] for k in range(c.shape[0])]


def aligned_sorted_planes(eb, payloads, nblocks, block, nsub_pad):
    """Group entries by block id into whole-sub-chunk-aligned order with
    ONE payload-carrying sort.

    eb:       (E0,) int32 entry block ids; dead entries carry nblocks.
              E0 == nsub_pad * block == raw entries + nblocks*block pad.
              The trailing nblocks*block slots are the pad region: their
              incoming eb is ignored and reassigned here.
    payloads: list of (E0,) int32 planes, dead/pad slots already filled.
              Entry order within a block is preserved (the sort is
              stable), matching the host-bucketing layout bit-for-bit —
              an explicit arange tiebreaker key would be redundant (and
              costs a full extra sort operand).
    Returns (planes list of (nsub_pad, block) int32, bids (nsub_pad,)).

    Payloads should be PACKED as tightly as possible (i16/u16 pairs in
    one i32, packed wire words passed through verbatim): the sort is the
    dominant device cost of the hybrid path and scales with the operand
    count, while post-sort unpacking is one elementwise pass (measured on
    v5e: 10-operand sort 397 ms vs 5-operand 204 ms at E0 = 8.4M).
    """
    import jax.numpy as jnp
    from jax import lax

    E0 = eb.shape[0]
    npad = nblocks * block
    raw = E0 - npad
    # per-block counts via a chunked one-hot MXU contraction: the
    # scatter-add formulation lowers to a serialized pass on TPU
    # (measured ~75 ms for 8.4M entries on v5e) while the matmul runs in
    # ~6 ms; dead entries (eb == nblocks) match no bin, counts stay exact
    # in f32 up to 2^24 entries per block (0/1 values are exact in bf16)
    S = raw // block
    ebc = eb[:raw].reshape(S, block)
    onehot = (ebc[:, :, None]
              == jnp.arange(nblocks, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.bfloat16)
    ones = jnp.ones((S, 1, block), jnp.bfloat16)
    per = lax.dot_general(ones, onehot, (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    counts = per.sum(axis=(0, 1)).astype(jnp.int32)
    # pad need: round each block up to whole sub-chunks, and give empty
    # blocks one whole sub-chunk (visit-all: the kernel defines a block's
    # state only when some sub-chunk visits it)
    rem = counts % block
    need = jnp.where(counts == 0, block, (block - rem) % block)
    cumneed = jnp.cumsum(need)
    # pad slot d -> block: #{b : cumneed[b] <= d}, scatter+cumsum form
    pad_b = _step_count(cumneed[:-1], npad)
    pad_live = jnp.arange(npad, dtype=jnp.int32) < cumneed[-1]
    eb_full = jnp.concatenate(
        [eb[:raw],
         jnp.where(pad_live, pad_b, nblocks).astype(jnp.int32)])
    ops = lax.sort((eb_full,) + tuple(payloads), num_keys=1,
                   is_stable=True)
    planes = [p.reshape(nsub_pad, block) for p in ops[1:]]
    # all-dead sub-chunks keep the sentinel nblocks: the kernel aliases
    # them onto the last block (no flush boundary — dead rows are a
    # sorted suffix) and predicates their whole body off, skipping the
    # splat work for the ~(kmax-1)/kmax halo-expansion dead fraction
    bids = ops[0].reshape(nsub_pad, block)[:, 0].astype(jnp.int32)
    return planes, bids


def aligned_sorted_layout(eb, payloads, nblocks, block, nsub_pad):
    """aligned_sorted_planes, stacked into the kernel's
    (nsub_pad, nseg*block) params layout (one payload per segment)."""
    import jax.numpy as jnp

    planes, bids = aligned_sorted_planes(eb, payloads, nblocks,
                                         block, nsub_pad)
    params_2d = jnp.stack(planes, axis=1).reshape(nsub_pad, -1)
    return params_2d, bids


def _halo_expand(icx, icy, r, live_p, TH, WT, nrb, ncb, kmax):
    """Static kmax-entry halo expansion: entry j of point p targets block
    (rb0+j//kc, cb0+j%kc); entries beyond kr*kc (or dead points) get the
    sentinel block id nblocks. Pure arithmetic — no gathers."""
    import jax.numpy as jnp

    B = icx.shape[0]
    nblocks = nrb * ncb
    rb0 = jnp.clip((icy - r) // TH, 0, nrb - 1)
    rb1 = jnp.clip((icy + r) // TH, 0, nrb - 1)
    cb0 = jnp.clip((icx - r) // WT, 0, ncb - 1)
    cb1 = jnp.clip((icx + r) // WT, 0, ncb - 1)
    kr = rb1 - rb0 + 1
    kc = cb1 - cb0 + 1
    jj = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    jr = jj // kc[:, None]
    jc = jj % kc[:, None]
    live_e = live_p[:, None] & (jj < (kr * kc)[:, None])
    eb = jnp.where(live_e,
                   (rb0[:, None] + jr) * ncb + (cb0[:, None] + jc),
                   nblocks).reshape(-1).astype(jnp.int32)
    return eb, live_e


def _unpack16(v):
    """Split an int32 into its (high, low) int16 halves, sign-extended."""
    return (v >> 16), ((v << 16) >> 16)


def _decode_wire(buf, B, nextra):
    """Split the packed wire buffer [icxy | subq | value | extras...] into
    icx / icy / live / sub_cx / sub_cy / value (+ extra f32 planes).
    icxy packs (icx, icy) as sign-extended i16s; icx == -32768 marks a
    dead (invalid or ladder-padding) point."""
    import jax.numpy as jnp
    from jax import lax

    icx, icy = _unpack16(buf[:B])
    live = icx != -32768
    subq = buf[B:2 * B]
    val = lax.bitcast_convert_type(buf[2 * B:3 * B], jnp.float32)
    extras = [lax.bitcast_convert_type(buf[(3 + k) * B:(4 + k) * B],
                                       jnp.float32)
              for k in range(nextra)]
    sub_cx = ((subq >> 16) & 0xFFFF).astype(jnp.float32) * (1.0 / SUB_Q)
    sub_cy = (subq & 0xFFFF).astype(jnp.float32) * (1.0 / SUB_Q)
    return icx, icy, live, sub_cx, sub_cy, val, extras


def gaussian_wire_builder(info: ReductionInfo, cfg, B: int, kmax: int,
                          TH: int, WT: int, nsub_pad: int, block: int,
                          h_pad: int, scal: dict, nsig: int,
                          rot: bool, interpret: bool, corr: tuple = ()):
    """Zero-arg builder for the hybrid Gaussian update: decode the wire
    buffer, expand/bucket on device, run the fused Pallas splat.

    scal: compile-time scalars — max_radius, plus (when nsig == 0, the
    uniform-shape case) the cell-unit sigma_x/sigma_y and rotation every
    point shares, baked into the program.  nsig == 2 ships per-point
    cell-unit sx/sy as two extra wire planes.
    """
    W, H = cfg.width, cfg.height
    from .pallas_kernels import padded_width
    ncb = padded_width(W) // WT
    nrb = h_pad // TH
    nblocks = nrb * ncb
    rtype = ReductionType(info.type)

    def build():
        import jax.numpy as jnp
        from jax import lax

        from .pallas_kernels import build_sorted_splat_pallas
        upd = build_sorted_splat_pallas(
            info, cfg, nsub_pad, block, TH, "rot" if rot else False,
            False, interpret, two_d=True, wt=WT, h_pad=h_pad,
            corr_offsets=corr)
        i32 = lambda a: lax.bitcast_convert_type(a, jnp.int32)
        f32b = lambda v: np.float32(v).view(np.int32).item()
        E0 = nsub_pad * block          # B*kmax raw + nblocks*block pad
        npad = nblocks * block

        DEAD = np.int32(-32768 << 16)   # dead icxy: icx == -32768

        def entries(buf):
            icx, icy, live_p, _scx, _scy, _val, extras = _decode_wire(
                buf, B, nsig)
            if nsig:
                sx_p, sy_p = extras[0], extras[1]
            else:
                sx_p = jnp.full(B, np.float32(scal["sx"]))
                sy_p = jnp.full(B, np.float32(scal["sy"]))
            R = jnp.minimum(np.float32(3.0) * jnp.maximum(sx_p, sy_p),
                            np.float32(scal["max_radius"]))
            r_p = jnp.ceil(R).astype(jnp.int32)
            eb, live_e = _halo_expand(icx, icy, r_p, live_p, TH, WT,
                                      nrb, ncb, kmax)
            # sort payloads are the PACKED wire words themselves (see
            # aligned_sorted_planes): [icxy | subq | value (+ sx, sy)];
            # dead/pad slots carry the dead icxy so every per-segment
            # dead encoding can be reconstructed post-sort
            raw = [buf[:B], buf[B:2 * B], buf[2 * B:3 * B]]
            fills = [DEAD, np.int32(0), np.int32(0)]
            if nsig:
                raw += [buf[3 * B:4 * B], buf[4 * B:5 * B]]
                fills += [f32b(1.0), f32b(1.0)]
            payloads = []
            for s, f in zip(raw, fills):
                plane = jnp.where(live_e, s[:, None], jnp.int32(f))
                payloads.append(jnp.concatenate(
                    [plane.reshape(-1), jnp.full(npad, np.int32(f))]))
            eb_full = jnp.concatenate(
                [eb, jnp.full(npad, np.int32(nblocks))])
            return eb_full, payloads

        def group(eb_full, payloads):
            return aligned_sorted_planes(
                eb_full, payloads, nblocks, block, nsub_pad)

        def finish(planes, bids):
            # post-sort unpack to the kernel's segment layout: one
            # elementwise pass at entry resolution, bit-identical to the
            # per-segment pre-sort broadcast it replaces (live entries
            # see the same f32 ops on the same bits; dead/pad entries
            # are masked by the kernel through r == -1)
            icxy_s, subq_s, val_s = planes[0], planes[1], planes[2]
            icx_s, icy_s = _unpack16(icxy_s)
            live_s = icx_s != -32768
            sub_cx = ((subq_s >> 16) & 0xFFFF).astype(jnp.float32) \
                * np.float32(1.0 / SUB_Q)
            sub_cy = (subq_s & 0xFFFF).astype(jnp.float32) \
                * np.float32(1.0 / SUB_Q)
            if nsig:
                one = np.float32(1.0)
                sx = jnp.where(live_s, lax.bitcast_convert_type(
                    planes[3], jnp.float32), one)
                sy = jnp.where(live_s, lax.bitcast_convert_type(
                    planes[4], jnp.float32), one)
            else:
                sx = jnp.full_like(sub_cx, np.float32(scal["sx"]))
                sy = jnp.full_like(sub_cx, np.float32(scal["sy"]))
            R_s = jnp.minimum(np.float32(3.0) * jnp.maximum(sx, sy),
                              np.float32(scal["max_radius"]))
            r_s = jnp.where(live_s, jnp.ceil(R_s).astype(jnp.int32), -1)
            f0 = (jnp.where(live_s, np.float32(1.0), np.float32(0.0))
                  if rtype == ReductionType.Count
                  else lax.bitcast_convert_type(val_s, jnp.float32))
            if rot:
                # completed-square fold, mirroring the staged host path
                # (tpu_backend.prepare_gaussian rot branch; algebra of
                # glyph_kernels.cu:145-176)
                cos_r = jnp.full_like(sub_cx, np.float32(scal["cos_rot"]))
                sin_r = jnp.full_like(sub_cx, np.float32(scal["sin_rot"]))
                inv_sx = np.float32(0.7071067811865476) / sx
                inv_sy = np.float32(0.7071067811865476) / sy
                c1 = cos_r * inv_sx
                c2 = -sin_r * inv_sx
                c3 = sin_r * inv_sy
                c4 = cos_r * inv_sy
                A = c1 * c1 + c3 * c3
                Bq = c1 * c2 + c3 * c4
                C = c2 * c2 + c4 * c4
                icx_f = icx_s.astype(jnp.float32)
                icy_f = icy_s.astype(jnp.float32)
                s_l2e = np.float32(1.2011224087864498)
                segs = [i32(-(icx_f + sub_cx)), i32(-(icy_f + sub_cy)),
                        i32(Bq / C), i32(jnp.sqrt(C) * s_l2e),
                        i32(jnp.sqrt(jnp.maximum(A - Bq * Bq / C, 0.0))
                            * s_l2e),
                        i32(f0), i32(icx_f), i32(icy_f),
                        i32(jnp.where(live_s, r_s.astype(jnp.float32),
                                      np.float32(-1.0)))]
            else:
                segs = [icx_s, icy_s, i32(sub_cx), i32(sub_cy),
                        i32(sx), i32(sy), r_s, i32(f0)]
            params_2d = jnp.stack(segs, axis=1).reshape(nsub_pad, -1)
            return params_2d, bids

        def fn(states, buf):
            params_2d, bids = finish(*group(*entries(buf)))
            return upd(states, params_2d, bids)

        # stage handles for benchmarks/profile_hybrid_stages.py
        fn.entries, fn.group, fn.finish, fn.upd = entries, group, finish, upd
        return fn

    return build


def line_wire_builder(info: ReductionInfo, cfg, B: int, jmax: int,
                      rmax_entries: int, TH: int, WT: int, nsub_pad: int,
                      block: int, h_pad: int, interpret: bool,
                      multi_tile: bool, packed_deltas=None,
                      uniform_jr: int | None = None):
    """Zero-arg builder for the hybrid Line update.

    Wire record: [cell i32 | end0 i32 (ix0,iy0 as i16 pair) | end1 i32 |
    value f32] — exact integer endpoints: exact footprint, values equal
    to the staged path within the last ulp (accumulation order).  On device: decode endpoints, rebuild the closed-
    form Bresenham staircase runs (routing.line_rects math), expand each
    run over the (<=2) blocks it touches, lay out, and run the rect-mode
    Pallas splat.

    Run enumeration and per-line value propagation are scatter+cumsum
    passes (see module docs): run slot t gets its line id from a marker
    prefix-sum over the device-computed run-count cumsum, and the four
    raw per-line wire words are forward-filled to run resolution with the
    telescoping-difference trick; per-run geometry is then recomputed
    elementwise. No entry-resolution gathers remain.

    uniform_jr (uniform-shape fast path, requires the delta wire's <=4
    value endpoint-delta guarantee): every live line has nruns within
    [uniform_jr-3, uniform_jr], so run slots are the STATIC (B,
    uniform_jr) broadcast instead of a packed stream — no run-count
    cumsum, no scatter+cumsum propagation (measured 159 ms of the 194 ms
    hybrid line update at 2M points), at the cost of <=3 extra dead run
    slots per line. rmax_entries must equal B * uniform_jr.
    """
    W, H = cfg.width, cfg.height
    from .pallas_kernels import padded_width
    ncb = padded_width(W) // WT
    nrb = h_pad // TH
    nblocks = nrb * ncb
    rtype = ReductionType(info.type)
    tw, th_tile = cfg.tile_width, cfg.tile_height

    def build():
        import jax.numpy as jnp
        from jax import lax

        from .pallas_kernels import build_sorted_splat_pallas
        upd = build_sorted_splat_pallas(
            info, cfg, nsub_pad, block, TH, "rect", False, interpret,
            two_d=True, wt=WT, h_pad=h_pad)
        i32 = lambda a: lax.bitcast_convert_type(a, jnp.int32)
        E0 = nsub_pad * block          # rmax_entries*jmax + nblocks*block
        npad = nblocks * block

        def _decode(buf):
            # wire layout: [ctr? | e0 | e1 | value], or with
            # packed_deltas=(dminx, dminy): [ctr? | e0 | value | codes]
            # where codes pack 8 lines' 4-bit endpoint deltas per word
            # (ix1 = ix0 + dminx + 2 bits, iy1 likewise) — exact integer
            # reconstruction, ~29% less wire for uniform-shape lines.
            # ctr (home-tile center, i16 pair) only rides on multi-tile
            # grids. iy0 == -32768 marks a dead (invalid / padding) line.
            off = B if multi_tile else 0
            e0 = buf[off:off + B]
            if packed_deltas is not None:
                dminx, dminy = packed_deltas
                vw = buf[off + B:off + 2 * B]
                dwords = buf[off + 2 * B:off + 2 * B + B // 8]
                shifts = (jnp.arange(B, dtype=jnp.int32) % 8) * 4
                nib = (jnp.right_shift(
                    jnp.repeat(dwords, 8, total_repeat_length=B),
                    shifts) & 0xF)
                ix0w, iy0w = _unpack16(e0)
                ix1w = ix0w + dminx + (nib & 3)
                iy1w = iy0w + dminy + ((nib >> 2) & 3)
                e1 = ((ix1w & 0xFFFF) << 16) | (iy1w & 0xFFFF)
            else:
                e1 = buf[off + B:off + 2 * B]
                vw = buf[off + 2 * B:off + 3 * B]
            return e0, e1, vw

        def runs_to_entries(ax, bx, ay, by, f0r, live_r, cs, ce, rs, re):
            """Shared tail from flat run-resolution rects: clip to grid
            and home tile, expand over the <=jmax blocks each run
            touches, pack the sort payloads."""
            ax = jnp.maximum(ax, cs)
            bx = jnp.minimum(bx, ce - 1)
            ay = jnp.maximum(ay, rs)
            by = jnp.minimum(by, re - 1)
            live_r = live_r & (ax <= bx) & (ay <= by)
            # rect -> block halo (runs are 1 cell thick: <= 2 blocks on
            # the major axis for any run shorter than a tile)
            rb0 = jnp.clip(ay // TH, 0, nrb - 1)
            rb1 = jnp.clip(by // TH, 0, nrb - 1)
            cb0 = jnp.clip(ax // WT, 0, ncb - 1)
            cb1 = jnp.clip(bx // WT, 0, ncb - 1)
            kr = rb1 - rb0 + 1
            kc = cb1 - cb0 + 1
            kk = jnp.arange(jmax, dtype=jnp.int32)[None, :]
            jr = kk // kc[:, None]
            jc = kk % kc[:, None]
            live_e = live_r[:, None] & (kk < (kr * kc)[:, None])
            eb = jnp.where(live_e,
                           (rb0[:, None] + jr) * ncb + (cb0[:, None] + jc),
                           nblocks).reshape(-1).astype(jnp.int32)
            # sort payloads packed (see aligned_sorted_planes): rect
            # coords are grid-clipped to [0, 32000) so (ax, ay) and
            # (bx, by) ride as i16 pairs; dead fill (1,1)/(0,0) unpacks
            # to the empty interval ax > bx
            segs = [(ax << 16) | (ay & 0xFFFF),
                    (bx << 16) | (by & 0xFFFF), f0r]
            fills = [(1 << 16) | 1, 0, 0]
            payloads = []
            for s, f in zip(segs, fills):
                plane = jnp.where(live_e, s[:, None], jnp.int32(f))
                payloads.append(jnp.concatenate(
                    [plane.reshape(-1), jnp.full(npad, np.int32(f))]))
            eb_full = jnp.concatenate(
                [eb, jnp.full(npad, np.int32(nblocks))])
            return eb_full, payloads

        def entries_static(buf):
            # uniform-shape fast path: run slots are the static
            # (B, uniform_jr) broadcast; all per-line words are read
            # directly (no propagation pass, no run-count cumsum)
            e0, e1, vw = _decode(buf)
            ix0, iy0 = _unpack16(e0)
            ix1, iy1 = _unpack16(e1)
            live_l = iy0 != -32768
            ddx = jnp.abs(ix1 - ix0)
            ddy = jnp.abs(iy1 - iy0)
            nruns = jnp.minimum(ddx, ddy) + 1
            j = jnp.arange(uniform_jr, dtype=jnp.int32)[None, :]
            live_r = live_l[:, None] & (j < nruns[:, None])
            c = lambda a: a[:, None]
            sx = jnp.where(ix0 < ix1, 1, -1)
            sy = jnp.where(iy0 < iy1, 1, -1)
            xmaj = ddx >= ddy
            o_dmaj = jnp.where(xmaj, ddx, ddy)
            safe_dmin = jnp.maximum(jnp.where(xmaj, ddy, ddx), 1)
            k0 = jnp.where(j > 0,
                           (c(o_dmaj) * (2 * j - 1))
                           // (2 * c(safe_dmin)) + 1, 0)
            k1 = jnp.where(j < c(jnp.where(xmaj, ddy, ddx)),
                           (c(o_dmaj) * (2 * j + 1)) // (2 * c(safe_dmin)),
                           c(o_dmaj))
            maj0 = jnp.where(xmaj, ix0, iy0)
            smaj = jnp.where(xmaj, sx, sy)
            p0 = c(maj0) + c(smaj) * k0
            p1 = c(maj0) + c(smaj) * k1
            lo = jnp.minimum(p0, p1)
            hi = jnp.maximum(p0, p1)
            minor = c(jnp.where(xmaj, iy0, ix0)) \
                + c(jnp.where(xmaj, sy, sx)) * j
            xm = c(xmaj)
            ax = jnp.where(xm, lo, minor)
            bx = jnp.where(xm, hi, minor)
            ay = jnp.where(xm, minor, lo)
            by = jnp.where(xm, minor, hi)
            if multi_tile:
                ocol, orow = _unpack16(buf[:B])
                cs = c((ocol // tw) * tw)
                ce = c(jnp.minimum((ocol // tw) * tw + tw, W))
                rs = c((orow // th_tile) * th_tile)
                re = c(jnp.minimum((orow // th_tile) * th_tile + th_tile,
                                   H))
            else:
                cs = jnp.zeros_like(ax)
                ce = jnp.full_like(ax, W)
                rs = jnp.zeros_like(ay)
                re = jnp.full_like(ay, H)
            f0r = (i32(jnp.ones((B, uniform_jr), jnp.float32))
                   if rtype == ReductionType.Count
                   else jnp.broadcast_to(c(vw), (B, uniform_jr)))
            flat = lambda a: jnp.broadcast_to(
                a, (B, uniform_jr)).reshape(-1)
            return runs_to_entries(
                flat(ax), flat(bx), flat(ay), flat(by), flat(f0r),
                flat(live_r), flat(cs), flat(ce), flat(rs), flat(re))

        def entries(buf):
            if uniform_jr is not None:
                return entries_static(buf)
            e0, e1, vw = _decode(buf)
            ix0_l, iy0_l = _unpack16(e0)
            ix1_l, iy1_l = _unpack16(e1)
            live_l = iy0_l != -32768
            nruns = jnp.where(live_l,
                              jnp.minimum(jnp.abs(ix1_l - ix0_l),
                                          jnp.abs(iy1_l - iy0_l)) + 1, 0)
            starts = jnp.concatenate(
                [jnp.zeros(1, nruns.dtype), jnp.cumsum(nruns)])
            total = starts[-1]
            t = jnp.arange(rmax_entries, dtype=jnp.int32)
            live_r = t < total
            # line id per run slot + the raw wire words at run resolution
            # (scatter+cumsum; no searchsorted, no gathers)
            pos = starts[:-1]
            chans = [e0, e1, vw, starts[:-1].astype(jnp.int32)]
            if multi_tile:
                chans.append(buf[:B])
            props = _propagate(pos, chans, rmax_entries)
            e0_r, e1_r, vw_r, start_r = props[:4]
            j = t - start_r
            ix0, iy0 = _unpack16(e0_r)
            ix1, iy1 = _unpack16(e1_r)
            ddx = jnp.abs(ix1 - ix0)
            ddy = jnp.abs(iy1 - iy0)
            sx = jnp.where(ix0 < ix1, 1, -1)
            sy = jnp.where(iy0 < iy1, 1, -1)
            xmaj = ddx >= ddy
            o_dmaj = jnp.where(xmaj, ddx, ddy)
            o_dmin = jnp.where(xmaj, ddy, ddx)
            safe_dmin = jnp.maximum(o_dmin, 1)
            # staircase run j covers major steps [k0(j), k0(j+1)-1]
            # (routing._staircase_starts closed form)
            k0 = jnp.where(j > 0,
                           (o_dmaj * (2 * j - 1)) // (2 * safe_dmin) + 1, 0)
            k1 = jnp.where(j < o_dmin,
                           (o_dmaj * (2 * j + 1)) // (2 * safe_dmin),
                           o_dmaj)
            maj0 = jnp.where(xmaj, ix0, iy0)
            smaj = jnp.where(xmaj, sx, sy)
            p0 = maj0 + smaj * k0
            p1 = maj0 + smaj * k1
            lo = jnp.minimum(p0, p1)
            hi = jnp.maximum(p0, p1)
            min0 = jnp.where(xmaj, iy0, ix0)
            smin = jnp.where(xmaj, sy, sx)
            minor = min0 + smin * j
            ax = jnp.where(xmaj, lo, minor)
            bx = jnp.where(xmaj, hi, minor)
            ay = jnp.where(xmaj, minor, lo)
            by = jnp.where(xmaj, minor, hi)
            # clip to grid and the owner's home tile
            # (routing.line_rects / home_tile_ranges semantics)
            if multi_tile:
                ocol, orow = _unpack16(props[4])
                cs = (ocol // tw) * tw
                ce = jnp.minimum(cs + tw, W)
                rs = (orow // th_tile) * th_tile
                re = jnp.minimum(rs + th_tile, H)
            else:
                cs = jnp.zeros_like(ax)
                ce = jnp.full_like(ax, W)
                rs = jnp.zeros_like(ay)
                re = jnp.full_like(ay, H)
            f0r = i32(jnp.ones(rmax_entries, jnp.float32)
                      if rtype == ReductionType.Count
                      else lax.bitcast_convert_type(vw_r, jnp.float32))
            return runs_to_entries(ax, bx, ay, by, f0r, live_r,
                                   cs, ce, rs, re)

        def group(eb_full, payloads):
            return aligned_sorted_planes(
                eb_full, payloads, nblocks, block, nsub_pad)

        def finish(planes, bids):
            ax_s, ay_s = _unpack16(planes[0])
            bx_s, by_s = _unpack16(planes[1])
            params_2d = jnp.stack(
                [ax_s, bx_s, ay_s, by_s, planes[2]],
                axis=1).reshape(nsub_pad, -1)
            return params_2d, bids

        def fn(states, buf):
            params_2d, bids = finish(*group(*entries(buf)))
            return upd(states, params_2d, bids)

        # stage handles for benchmarks/profile_hybrid_stages.py
        fn.entries, fn.group, fn.finish, fn.upd = entries, group, finish, upd
        return fn

    return build
