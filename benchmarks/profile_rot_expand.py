"""Micro-probe: cost of whole-block lane-expansion inside a Pallas kernel.

The rot-kernel lane-packing analysis (pallas_kernels.py rot comment) found
the 4-points-per-tile variant loses 3x to the unpacked kernel solely on
constructing ~10 lane-varying vectors per group (4 scalar broadcasts + 3
selects each), with a measured 156.9 Mpts/s ceiling when construction is
stubbed. This probes the missing strategy: build ALL group lane-vectors for
a block in ONE vectorized pre-pass,

    scratch[g, l] = q[4*g + l // 32]   (blocked 32-lane slots)

via (block/4, 4) -> repeat(32, axis=1) -> (block/4, 128), then loop over
groups reading plain (1, 128) rows. Usage:

    JAX_PLATFORMS=cpu python benchmarks/profile_rot_expand.py --interpret
    python benchmarks/profile_rot_expand.py            # real TPU timing
"""
from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def build(variant: str, nsub: int, nq: int, block: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = block // 4

    def kernel(params_ref, out_ref, scratch_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        if variant.startswith("wire4"):
            # params_ref: (nq, G, 4) — no in-kernel reshape needed
            if variant == "wire4_dot":
                # exact 3-limb bf16 selection matmul: scratch = p4 @ S,
                # S[j, l] = (l // 32 == j); limbs reconstruct any f32
                # exactly (disjoint 8-bit mantissa ranges, f32 accumulate)
                lane_j = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1) // 32
                row_j = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
                S = (lane_j == row_j).astype(jnp.bfloat16)
                dims = (((1,), (0,)), ((), ()))
                for q in range(nq):
                    a = params_ref[q]
                    a0 = a.astype(jnp.bfloat16)
                    r1 = a - a0.astype(jnp.float32)
                    a1 = r1.astype(jnp.bfloat16)
                    a2 = (r1 - a1.astype(jnp.float32)).astype(jnp.bfloat16)
                    d = lambda u: jax.lax.dot_general(
                        u, S, dims, preferred_element_type=jnp.float32)
                    scratch_ref[q] = d(a0) + d(a1) + d(a2)
            elif variant == "wire4_bcast":
                for q in range(nq):
                    for j in range(4):
                        scratch_ref[q, :, 32 * j:32 * (j + 1)] = (
                            jnp.broadcast_to(params_ref[q, :, j:j + 1],
                                             (G, 32)))
            else:                      # wire4_repeat
                for q in range(nq):
                    scratch_ref[q] = jnp.repeat(params_ref[q], 32, axis=1)
            acc = jnp.zeros((1, 128), jnp.float32)

            def body(g, acc):
                s = acc
                for q in range(nq):
                    s = s + scratch_ref[q, pl.ds(g, 1), :]
                return s
            acc = jax.lax.fori_loop(0, G, body, acc)
            out_ref[:] += acc
        elif variant in ("repeat", "jrepeat", "bcast4"):
            for q in range(nq):
                p4 = params_ref[q].reshape(G, 4)
                if variant == "repeat":
                    scratch_ref[q] = pltpu.repeat(p4, 32, axis=1)
                elif variant == "jrepeat":
                    scratch_ref[q] = jnp.repeat(p4, 32, axis=1)
                else:
                    for j in range(4):
                        scratch_ref[q, :, 32 * j:32 * (j + 1)] = (
                            jnp.broadcast_to(p4[:, j:j + 1], (G, 32)))
            acc = jnp.zeros((1, 128), jnp.float32)

            def body(g, acc):
                s = acc
                for q in range(nq):
                    s = s + scratch_ref[q, pl.ds(g, 1), :]
                return s
            acc = jax.lax.fori_loop(0, G, body, acc)
            out_ref[:] += acc
        else:                       # 'loop' — the known-slow baseline shape
            acc = jnp.zeros((1, 128), jnp.float32)
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // 32

            def body(g, acc):
                s = acc
                for q in range(nq):
                    v = jnp.full((1, 128), params_ref[q, 4 * g], jnp.float32)
                    for j in range(1, 4):
                        v = jnp.where(iota == j, params_ref[q, 4 * g + j], v)
                    s = s + v
                return s
            acc = jax.lax.fori_loop(0, G, body, acc)
            out_ref[:] += acc

    return pl.pallas_call(
        kernel,
        grid=(nsub,),
        in_specs=[pl.BlockSpec((nq, G, 4), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
                  if variant.startswith("wire4") else
                  pl.BlockSpec((nq, block), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
                  if variant != "loop" else
                  pl.BlockSpec((nq, block), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), np.float32),
        scratch_shapes=[pltpu.VMEM((nq, G, 128), jnp.float32)],
        interpret=interpret,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--nsub", type=int, default=64)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--nq", type=int, default=9)
    ap.add_argument("--variants", nargs="+",
                    default=["repeat", "jrepeat", "bcast4", "loop"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    params = rng.standard_normal((args.nq, args.block), dtype=np.float32)
    pd = jax.device_put(params)
    # honest-timing flip: one tiny fetch before timing (memory: axon rules)
    np.asarray(jax.device_put(np.zeros(1, np.float32)))

    # reference value
    G = args.block // 4
    exp = np.repeat(params.reshape(args.nq, G, 4), 32, axis=2).reshape(
        args.nq, G, 128)
    want = exp.sum(axis=(0, 1)) * args.nsub

    for v in args.variants:
        try:
            fn = jax.jit(build(v, args.nsub, args.nq, args.block,
                               args.interpret))
            pdv = (jax.device_put(params.reshape(args.nq, G, 4))
                   if v.startswith("wire4") else pd)
            t0 = time.perf_counter()
            out = np.asarray(fn(pdv))
            compile_s = time.perf_counter() - t0
            ok = bool(np.allclose(out[0], want, rtol=1e-4))
            reps = 1 if args.interpret else 20
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(pdv)
            out = np.asarray(out)
            dt = (time.perf_counter() - t0) / reps
            entries = args.nsub * args.block
            print(f"{v:8s} ok={ok} compile={compile_s:.1f}s "
                  f"t={dt * 1e3:.3f}ms  {entries / dt / 1e6:.1f} Mentries/s")
        except Exception as e:                        # noqa: BLE001
            print(f"{v:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
