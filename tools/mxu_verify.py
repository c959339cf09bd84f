"""Verify the MXU probe is real: correctness vs numpy + N_U scaling.

If doubling the grid doesn't ~double the time, the timing is bogus
(tunnel ack before completion / memoization)."""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, KK, N = 256, 2176, 512


def make_call(n_u):
    def kernel(a_ref, b_ref, o_ref, acc):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        acc[:] = acc[:] + jnp.dot(a_ref[:], b_ref[:],
                                  preferred_element_type=jnp.float32)

        @pl.when(u == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=(n_u,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((M, KK)).astype(np.float32)
    b_np = rng.standard_normal((KK, N)).astype(np.float32)
    a = jnp.asarray(a_np, jnp.bfloat16)
    b = jnp.asarray(b_np, jnp.bfloat16)

    # correctness: one grid step
    out = jax.device_get(jax.jit(make_call(1))(a, b))
    ref = a_np.astype(np.float32) @ b_np.astype(np.float32)
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    print(f"correctness: median rel err {np.median(rel):.4f} "
          f"max {rel.max():.4f} (bf16 rounding expected ~1e-2)")

    # scaling: time vs N_U (fresh inputs each timed call)
    for n_u in (100, 200, 400, 800):
        f = jax.jit(make_call(n_u))
        jax.block_until_ready(f(a, b))
        ts = []
        for i in (3, 5):
            a2 = (a * jnp.bfloat16(1.0 + 0.25 * i))
            jax.block_until_ready(a2)
            t0 = time.perf_counter()
            jax.block_until_ready(f(a2, b))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        macs = n_u * M * KK * N
        print(f"n_u={n_u:4d}: {dt*1e3:8.2f} ms  "
              f"{macs/dt/1e12:7.1f} TMAC/s")


if __name__ == "__main__":
    main()
