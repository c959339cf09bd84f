"""Probe window-materialization strategies for the fused tracker.

  P1 slice_windows    — today's [T, C, wp] overlapped windows (baseline)
  P2 seg3-stack       — [C, T+1, n0] per-channel rows via
                        dynamic_slice(...).reshape(T+1, n0) stack
                        + [C, T, 256] tail extract (seam design feed)
  P3 gather-kernel    — pallas grid-(C,) DMA gather into [C, 1, Lc],
                        then XLA reshape + tail extract

Each timed as a chained device-dependent loop, one sync.
Usage: python tools/seg_probe.py [--blocks 8]
"""
from __future__ import annotations

import argparse
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
    wp = 2176
    T = args.block_ms
    M = 256
    Lc = (T + 1) * n0
    Lc_pad = ((Lc + 127) // 128) * 128
    L = (T + 4) * n0 + 4096
    L = ((L + 127) // 128) * 128

    rng = np.random.default_rng(0)
    bre = jnp.asarray(rng.standard_normal(L), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(L), jnp.float32)
    a128 = jnp.asarray((rng.integers(0, 15, C) * 128).astype(np.int32))

    from gnss_sdr_tpu.ops.pallas import track_block_fused as fused
    offsets = jnp.full((C,), n0, jnp.int32)

    def p1(b1, b2):
        wre, wim = fused.slice_windows(b1, b2, offsets, T, n0, wp, 3)
        return wre[0, 0, 0] + wim[0, 0, 0]

    def seg_stack(b, starts):
        rows = []
        for c in range(C):
            seg = jax.lax.dynamic_slice(b, (starts[c],), (Lc,))
            rows.append(seg.reshape(T + 1, n0))
        return jnp.stack(rows)                      # [C, T+1, n0]

    def p2(b1, b2):
        s3r = seg_stack(b1, a128)
        s3i = seg_stack(b2, a128)
        tr = s3r[:, 1:, :M] + 0.0
        ti = s3i[:, 1:, :M] + 0.0
        return s3r[0, 0, 0] + s3i[0, 0, 0] + tr[0, 0, 0] + ti[0, 0, 0]

    # P3: pallas gather kernel
    def gather_kernel(off_ref, s_ref, o_ref, sem):
        c = pl.program_id(0)
        a = pl.multiple_of(off_ref[c], 128)
        cp = pltpu.make_async_copy(
            s_ref.at[pl.ds(a, Lc_pad)], o_ref.at[0, 0], sem)
        cp.start()
        cp.wait()

    gather = pl.pallas_call(
        gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1, Lc_pad), lambda c, off: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((C, 1, Lc_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def p3(b1, b2):
        g1 = gather(a128, b1)
        g2 = gather(a128, b2)
        s3r = g1[:, 0, :Lc].reshape(C, T + 1, n0)
        s3i = g2[:, 0, :Lc].reshape(C, T + 1, n0)
        tr = s3r[:, 1:, :M] + 0.0
        ti = s3i[:, 1:, :M] + 0.0
        return s3r[0, 0, 0] + s3i[0, 0, 0] + tr[0, 0, 0] + ti[0, 0, 0]

    sig_s = args.block_ms / 1000.0

    def chain(fn):
        @jax.jit
        def run(b1, b2):
            def body(carry, _):
                s = fn(carry[0], carry[1])
                return (carry[0] + s * 1e-20, carry[1]), s
            (_, _), ss = jax.lax.scan(body, (b1, b2), None,
                                      length=args.blocks)
            return ss
        return run

    for name, fn in [("p1-slice_windows", p1), ("p2-seg3-stack", p2),
                     ("p3-gather-kernel", p3)]:
        try:
            run = chain(fn)
            jax.block_until_ready(run(bre, bim))
            t0 = time.perf_counter()
            jax.block_until_ready(run(bim, bre))
            dt = (time.perf_counter() - t0) / (args.blocks * sig_s)
            print(f"{name:18s} {dt:10.5f} s/signal-s  "
                  f"{dt * 1e6 * sig_s / args.block_ms:8.2f} us/epoch")
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
