"""Measure the fused-kernel per-grid-step FLOOR on the real chip.

Variants:
  empty      — grid T, window BlockSpecs DMA'd per step, kernel body
               only copies state in->out (measures grid + DMA floor)
  nodma      — grid T, NO window inputs at all (grid machinery alone)
  wipeoff    — adds mask + carrier-stub wipeoff + 2 reductions
  multi4     — like empty but 4 epochs per grid step (window block
               [4, C, WP]) — does amortizing grid steps help?

Usage: python tools/floor_probe.py [--block-ms 500] [--blocks 8]
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
    ap.add_argument("--fs", type=float, default=2_046_000.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = args.channels
    n0 = 2046
    wp = 2176
    T = args.block_ms
    NF = 128

    rng = np.random.default_rng(0)
    wre = jnp.asarray(rng.standard_normal((T, C, wp)), jnp.float32)
    wim = jnp.asarray(rng.standard_normal((T, C, wp)), jnp.float32)
    st0 = jnp.asarray(rng.standard_normal((C, NF)), jnp.float32)

    def k_empty(wre_ref, wim_ref, si_ref, tel_ref, so_ref, state):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state[:] = si_ref[:]
        tel_ref[0] = state[:] + wre_ref[0, :, 0:1] * 0.0 \
            + wim_ref[0, :, 0:1] * 0.0

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            so_ref[:] = state[:]

    def k_nodma(si_ref, tel_ref, so_ref, state):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state[:] = si_ref[:]
        tel_ref[0] = state[:]

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            so_ref[:] = state[:]

    def k_wipeoff(wre_ref, wim_ref, si_ref, tel_ref, so_ref, state):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state[:] = si_ref[:]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, wp), 1).astype(jnp.float32)
        start = state[:, 8:9]
        mask = jnp.logical_and(lane >= start,
                               lane < start + 2046.0).astype(jnp.float32)
        cth = state[:, 0:1] + lane * 1e-6
        sth = cth * 0.5
        re_w = (wre_ref[0] * cth + wim_ref[0] * sth) * mask
        im_w = (wim_ref[0] * cth - wre_ref[0] * sth) * mask
        i_p = jnp.sum(re_w, axis=1, keepdims=True)
        q_p = jnp.sum(im_w, axis=1, keepdims=True)
        fid = jax.lax.broadcasted_iota(jnp.int32, (1, NF), 1)
        tel_ref[0] = ((fid == 0).astype(jnp.float32) * i_p
                      + (fid == 1).astype(jnp.float32) * q_p)

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            so_ref[:] = state[:]

    def k_multi(me, wre_ref, wim_ref, si_ref, tel_ref, so_ref, state):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state[:] = si_ref[:]
        for e in range(me):
            tel_ref[e] = state[:] + wre_ref[e, :, 0:1] * 0.0 \
                + wim_ref[e, :, 0:1] * 0.0

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            so_ref[:] = state[:]

    def build(kind, me=1):
        if kind == "nodma":
            return pl.pallas_call(
                k_nodma,
                out_shape=(
                    jax.ShapeDtypeStruct((T, C, NF), jnp.float32),
                    jax.ShapeDtypeStruct((C, NF), jnp.float32)),
                grid=(T,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((1, C, NF), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)),
                scratch_shapes=[pltpu.VMEM((C, NF), jnp.float32)],
            )
        body = {"empty": k_empty, "wipeoff": k_wipeoff}.get(kind)
        if kind == "multi":
            body = functools.partial(k_multi, me)
        return pl.pallas_call(
            body,
            out_shape=(
                jax.ShapeDtypeStruct((T // me, me * C if False else C,
                                      NF), jnp.float32)
                if False else
                jax.ShapeDtypeStruct((T, C, NF), jnp.float32),
                jax.ShapeDtypeStruct((C, NF), jnp.float32)),
            grid=(T // me,),
            in_specs=[
                pl.BlockSpec((me, C, wp), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((me, C, wp), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((me, C, NF), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((C, NF), jnp.float32)],
        )

    sig_s = args.block_ms / 1000.0

    def run(kind, me=1):
        call = build(kind, me)

        if kind == "nodma":
            @jax.jit
            def step(st):
                return call(st)
        else:
            @jax.jit
            def step(st, a, b):
                return call(a, b, st)

        fargs = () if kind == "nodma" else (wre, wim)
        tel, so = step(st0, *fargs)
        tel.block_until_ready()
        t0 = time.perf_counter()
        st = so
        for _ in range(args.blocks):
            tel, st = step(st, *fargs)
        tel.block_until_ready()
        dt = (time.perf_counter() - t0) / (args.blocks * sig_s)
        label = kind if me == 1 else f"{kind}{me}"
        print(f"{label:12s} {dt:10.5f} s/signal-s  "
              f"{dt * 1e6 * sig_s / args.block_ms:8.2f} us/epoch")

    run("nodma")
    run("empty")
    run("wipeoff")
    run("multi", 4)
    run("multi", 10)


if __name__ == "__main__":
    main()
