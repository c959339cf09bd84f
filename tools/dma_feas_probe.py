"""Feasibility: unaligned HBM->VMEM DMA starts + per-DMA issue cost.

  unaligned — copy block[pl.ds(start, L)] where start % 128 != 0
              (scalar-prefetched), check values exact
  issue     — C copies per grid step, start-all-then-wait-all vs
              start/wait pairs: per-DMA overhead

    python tools/dma_feas_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = 1 << 20
    rng = np.random.default_rng(0)
    blk = jnp.asarray(rng.standard_normal(L), jnp.float32)
    C = 32
    seg = 2176

    # --- unaligned start test -----------------------------------------
    starts_np = (rng.integers(1, L - seg - 1, C)).astype(np.int32)
    starts = jnp.asarray(starts_np)

    def kern(st_ref, src_ref, out_ref, sem):
        c = pl.program_id(0)
        a = st_ref[c]
        cp = pltpu.make_async_copy(
            src_ref.at[0, pl.ds(a, seg)], out_ref.at[0, 0], sem)
        cp.start()
        cp.wait()

    try:
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(C,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, 1, seg), lambda i, s: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((C, 1, seg), jnp.float32),
        )(starts, blk.reshape(1, -1))
        out_np = np.asarray(out).reshape(C, seg)
        blk_np = np.asarray(blk)
        ok = all(
            np.array_equal(out_np[c], blk_np[starts_np[c]:starts_np[c] + seg])
            for c in range(C))
        print(f"unaligned-dma: {'EXACT' if ok else 'WRONG VALUES'}")
    except Exception as e:
        print(f"unaligned-dma: FAILED {type(e).__name__}: {e}"[:300])

    # --- issue cost: start-all-then-wait-all over C copies --------------
    NSEM = C

    def kern2(st_ref, src_ref, out_ref, sems):
        cps = []
        for c in range(C):
            a = st_ref[c]
            cp = pltpu.make_async_copy(
                src_ref.at[0, pl.ds(a, seg)], out_ref.at[c, 0],
                sems.at[c])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    starts_al = jnp.asarray(((starts_np // 128) * 128).astype(np.int32))

    @jax.jit
    def overlapped(s):
        return pl.pallas_call(
            kern2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            ),
            out_shape=jax.ShapeDtypeStruct((C, 1, seg), jnp.float32),
        )(s, blk.reshape(1, -1))

    @jax.jit
    def chain_overlapped(s):
        def body(c, _):
            o = overlapped(c)
            return c + (o[0, 0, 0] * 1e-20).astype(jnp.int32), None
        out, _ = jax.lax.scan(body, s, None, length=64)
        return out

    for name, s in (("unaligned", starts), ("aligned", starts_al)):
        try:
            o = chain_overlapped(s)
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            o = chain_overlapped(s)
            jax.block_until_ready(o)
            dt = time.perf_counter() - t0
            per_step = dt / 64
            print(f"issue-{name}: {per_step * 1e6:.2f} us per {C}-copy "
                  f"step ({per_step / C * 1e6:.3f} us/DMA)")
        except Exception as e:
            print(f"issue-{name}: FAILED {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
