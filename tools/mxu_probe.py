"""MXU feasibility probe for the fused-tracking correlator (round 4).

Question: can the E/P/L correlation be restructured as bf16 MXU
contractions inside a pallas kernel ON THE AXON BACKEND, and how fast?

Candidate formulations, each timed as a K-iteration chained graph
(one host sync; the tunnel quantizes per-dispatch timing):

  A. block-diagonal: ONE [C*R, WP] x [WP, C*2K] bf16 matmul per
     superstep (computes C^2 channel pairs, only the diagonal blocks
     are used — C-fold MAC waste, but one big MXU-shaped op).
  B. grouped block-diagonal: G-channel groups, C/G matmuls of
     [G*R, WP] x [WP, G*2K] (waste factor G).
  C. batched dot_general: [C, 2K, WP] x [C, WP, R] with batch dim C
     (zero waste; Mosaic support unknown).

R = n_rows = n_drift + 2*el_shift (all integer replica shifts needed
for E/P/L across drift variants), 2K = re/im rows for K epochs.

Run ON TPU:  python tools/mxu_probe.py
"""
from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 32          # channels
R = 8           # replica rows (7 used, padded to 8)
K = 8           # epochs per superstep
WP = 2176       # window lanes (2046 + margins, 128-aligned here)
N_U = 25        # supersteps per launch (~200 epochs)


def _mk(shape, dtype, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype)


def probe_blockdiag(g: int):
    """Formulation A/B: C/g matmuls of [g*R, WP] x [WP, g*2K]."""
    n_grp = C // g
    a = _mk((n_grp, g * R, WP), jnp.bfloat16, 1)
    b = _mk((n_grp, WP, g * 2 * K), jnp.bfloat16, 2)

    def kernel(a_ref, b_ref, o_ref, acc):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        for grp in range(n_grp):
            out = jnp.dot(a_ref[grp], b_ref[grp],
                          preferred_element_type=jnp.float32)
            acc[grp] = acc[grp] + out

        @pl.when(u == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_grp, g * R, g * 2 * K),
                                       jnp.float32),
        grid=(N_U,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_grp, g * R, g * 2 * K),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call, (a, b)


def probe_batched():
    """Formulation C: batched dot_general, batch dim C."""
    a = _mk((C, 2 * K, WP), jnp.bfloat16, 3)
    b = _mk((C, WP, R), jnp.bfloat16, 4)

    def kernel(a_ref, b_ref, o_ref, acc):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        out = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc[:] = acc[:] + out

        @pl.when(u == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, 2 * K, R), jnp.float32),
        grid=(N_U,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, 2 * K, R), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call, (a, b)


def probe_transposed_b():
    """A-transposed: dot_general contracting (1,1) — B given as
    [g*2K, WP] so no [WP, small] layout is ever materialized."""
    a = _mk((C * R, WP), jnp.bfloat16, 5)
    b = _mk((C * 2 * K, WP), jnp.bfloat16, 6)

    def kernel(a_ref, b_ref, o_ref, acc):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        out = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[:] = acc[:] + out

        @pl.when(u == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C * R, C * 2 * K), jnp.float32),
        grid=(N_U,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C * R, C * 2 * K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return call, (a, b)


_macs_per_step = 0


def time_chain(name, call, args, n_chain=20):
    """Chain n_chain launches with a data dependence; time slope-free
    (whole chain / launches) — good enough to rank formulations."""
    try:
        @jax.jit
        def chain(x0, *rest):
            def body(carry, _):
                out = call(carry, *rest)
                eps = (1e-20 * out.reshape(-1)[0]).astype(carry.dtype)
                return carry + eps, None
            y, _ = jax.lax.scan(body, x0, None, length=n_chain)
            return y

        y = chain(*args)
        jax.block_until_ready(y)
        # the tunnel memoizes identical (graph, inputs) calls: every
        # timed pass must use FRESH inputs (bench.py's acq chain does
        # the same dance)
        times = []
        for i in (1, 2):
            # bf16 ulp at 1.0 is 2^-7: the perturbation must be large
            # enough to actually change the stored values
            fresh = (args[0] * jnp.bfloat16(1.0 + 0.25 * i),) \
                + args[1:]
            jax.block_until_ready(fresh)
            t0 = time.perf_counter()
            y = chain(*fresh)
            jax.block_until_ready(y)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        per_epoch_us = dt / n_chain / N_U / (2 * K) * 1e6
        macs = n_chain * N_U * _macs_per_step
        tmacs = macs / dt / 1e12
        print(f"{name:24s} ok   {dt*1e3:8.2f} ms/chain "
              f"{per_epoch_us:8.3f} us/epoch(all {C} ch) "
              f"{tmacs:7.1f} TMAC/s "
              f"agree={min(times)/max(times):.2f}")
        return per_epoch_us
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {e}"
        print(f"{name:24s} FAIL {msg[:160]}")
        return None


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    print(f"C={C} R={R} K={K} WP={WP} N_U={N_U} "
          f"(epochs/launch={2 * K * N_U})")
    global _macs_per_step
    for g in (32, 16, 8):
        call, args = probe_blockdiag(g)
        _macs_per_step = (C // g) * (g * R) * WP * (g * 2 * K)
        time_chain(f"blockdiag g={g}", call, args)
    call, args = probe_batched()
    _macs_per_step = C * 2 * K * WP * R
    time_chain("batched dot_general", call, args)
    call, args = probe_transposed_b()
    _macs_per_step = (C * R) * WP * (C * 2 * K)
    time_chain("transposed-B (1,1)", call, args)


if __name__ == "__main__":
    main()
