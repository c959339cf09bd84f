"""Probe the axon/Mosaic costs that gate the narrow-window fused
tracking design:

  A. per-channel HBM->VMEM async-copy issue cost (64 DMAs per
     K-epoch super-step, double-buffered)
  B. static UNALIGNED [C, wp] slice reads from a VMEM scratch
     (per-epoch windows at stride n0 with n0 % 128 != 0)
  C. the same with a realistic per-epoch op count (~38 ops/lane)

Usage: python tools/dma_probe.py [--blocks 8]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--block-ms", type=int, default=500)
    ap.add_argument("--channels", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = args.channels
    n0 = 2046
    wp = 2432              # n0 + 256 misalign + margins, mult of 128
    K = 8                  # epochs per super-step
    T = args.block_ms
    NS = T // K            # super-steps
    span = ((K * n0 + wp + 127) // 128) * 128   # per-channel copy span
    L = (T + 4) * n0 + wp
    L = ((L + 127) // 128) * 128
    NF = 128

    rng = np.random.default_rng(0)
    stream_re = jnp.asarray(rng.standard_normal((1, L)), jnp.float32)
    stream_im = jnp.asarray(rng.standard_normal((1, L)), jnp.float32)
    st0 = jnp.asarray(rng.standard_normal((C, NF)), jnp.float32)
    # per-channel aligned base offsets (multiples of 128 by construction)
    base = jnp.asarray((rng.integers(0, 15, C) * 128).astype(np.int32))
    reps = jnp.asarray(rng.standard_normal((C, 3, wp)), jnp.float32)

    def body_compute(win, state, reps_ref, heavy, e):
        # static (possibly unaligned) slice at epoch stride n0
        w = win[:, e * n0: e * n0 + wp]                    # [C, wp]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, wp), 1).astype(jnp.float32)
        start = state[:, 8:9]
        mask = jnp.logical_and(
            lane >= start, lane < start + 2046.0).astype(jnp.float32)
        if not heavy:
            return jnp.sum(w * mask, axis=1, keepdims=True)
        cth = state[:, 0:1] * lane
        sth = state[:, 1:2] * lane
        re_w = (w * cth + w * sth) * mask
        im_w = (w * cth - w * sth) * mask
        prompt = jnp.zeros((C, wp), jnp.float32)
        for d in range(3):
            sel = (state[:, 4:5] == jnp.float32(d - 1)).astype(
                jnp.float32)
            prompt = prompt + sel * reps_ref[:, d, :]
        early = pltpu.roll(prompt, wp - 1, 1)
        late = pltpu.roll(prompt, 1, 1)
        acc = jnp.sum(re_w * early, axis=1, keepdims=True)
        acc += jnp.sum(im_w * early, axis=1, keepdims=True)
        acc += jnp.sum(re_w * prompt, axis=1, keepdims=True)
        acc += jnp.sum(im_w * prompt, axis=1, keepdims=True)
        acc += jnp.sum(re_w * late, axis=1, keepdims=True)
        acc += jnp.sum(im_w * late, axis=1, keepdims=True)
        return acc

    def make_kernel(kind):
        def kernel(off_ref, sre_ref, sim_ref, si_ref, reps_ref,
                   tel_ref, so_ref, state, wbr, wbi, sems):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                state[:] = si_ref[:]
                # prime slot 0
                for c in range(C):
                    a = pl.multiple_of(off_ref[c], 128)
                    pltpu.make_async_copy(
                        sre_ref.at[0, pl.ds(a, span)],
                        wbr.at[0, c, pl.ds(0, span)],
                        sems.at[0, c, 0]).start()
                    pltpu.make_async_copy(
                        sim_ref.at[0, pl.ds(a, span)],
                        wbi.at[0, c, pl.ds(0, span)],
                        sems.at[0, c, 1]).start()

            slot = jax.lax.bitwise_and(s, 1)
            nxt = jax.lax.bitwise_and(s + 1, 1)
            # issue next super-step's copies
            @pl.when(s + 1 < pl.num_programs(0))
            def _():
                for c in range(C):
                    a0 = pl.multiple_of(off_ref[c], 128)
                    step = pl.multiple_of(
                        ((s + 1) * (K * n0) // 128) * 128, 128)
                    a = a0 + step
                    pltpu.make_async_copy(
                        sre_ref.at[0, pl.ds(a, span)],
                        wbr.at[nxt, c, pl.ds(0, span)],
                        sems.at[nxt, c, 0]).start()
                    pltpu.make_async_copy(
                        sim_ref.at[0, pl.ds(a, span)],
                        wbi.at[nxt, c, pl.ds(0, span)],
                        sems.at[nxt, c, 1]).start()
            # wait for this slot
            for c in range(C):
                pltpu.make_async_copy(
                    sre_ref.at[0, pl.ds(0, span)],
                    wbr.at[slot, c, pl.ds(0, span)],
                    sems.at[slot, c, 0]).wait()
                pltpu.make_async_copy(
                    sim_ref.at[0, pl.ds(0, span)],
                    wbi.at[slot, c, pl.ds(0, span)],
                    sems.at[slot, c, 1]).wait()

            heavy = kind == "dma+heavy"
            acc = jnp.zeros((C, 1), jnp.float32)
            for e in range(K):
                win = wbr[slot]
                acc = acc + body_compute(win, state, reps_ref, heavy, e)
                win2 = wbi[slot]
                acc = acc + body_compute(win2, state, reps_ref, heavy,
                                         e)
            fid = jax.lax.broadcasted_iota(jnp.int32, (1, NF), 1)
            tel_ref[0] = (fid == 0).astype(jnp.float32) * acc

            @pl.when(s == pl.num_programs(0) - 1)
            def _():
                so_ref[:] = state[:]

        def kernel_nodma(off_ref, sre_ref, sim_ref, si_ref, reps_ref,
                         tel_ref, so_ref, state, wbr, wbi, sems):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                state[:] = si_ref[:]
            slot = jax.lax.bitwise_and(s, 1)
            heavy = True
            acc = jnp.zeros((C, 1), jnp.float32)
            for e in range(K):
                acc = acc + body_compute(wbr[slot], state, reps_ref,
                                         heavy, e)
                acc = acc + body_compute(wbi[slot], state, reps_ref,
                                         heavy, e)
            fid = jax.lax.broadcasted_iota(jnp.int32, (1, NF), 1)
            tel_ref[0] = (fid == 0).astype(jnp.float32) * acc

            @pl.when(s == pl.num_programs(0) - 1)
            def _():
                so_ref[:] = state[:]

        return kernel_nodma if kind == "heavy-nodma" else kernel

    def build(kind):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NS,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, C, NF), lambda s, off: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((C, NF), jnp.float32),
                pltpu.VMEM((2, C, span), jnp.float32),
                pltpu.VMEM((2, C, span), jnp.float32),
                pltpu.SemaphoreType.DMA((2, C, 2)),
            ],
        )
        return pl.pallas_call(
            make_kernel(kind),
            out_shape=(
                jax.ShapeDtypeStruct((NS, C, NF), jnp.float32),
                jax.ShapeDtypeStruct((C, NF), jnp.float32)),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    sig_s = args.block_ms / 1000.0

    def run(kind):
        call = build(kind)

        @jax.jit
        def step(st, a, b):
            return call(base, a, b, st, reps)

        try:
            tel, so = step(st0, stream_re, stream_im)
            tel.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"{kind:12s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            return
        t0 = time.perf_counter()
        st = so
        for _ in range(args.blocks):
            tel, st = step(st, stream_re, stream_im)
        tel.block_until_ready()
        dt = (time.perf_counter() - t0) / (args.blocks * sig_s)
        print(f"{kind:12s} {dt:10.5f} s/signal-s  "
              f"{dt * 1e6 * sig_s / args.block_ms:8.2f} us/epoch")

    run("heavy-nodma")
    run("dma+light")
    run("dma+heavy")


if __name__ == "__main__":
    main()
