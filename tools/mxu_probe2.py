"""MXU correlator probe v2: realistic superstep structure, honest
device_get timing (block_until_ready acks early over the tunnel —
tools/mxu_verify.py).

Per grid step (one K-epoch superstep), mimicking the planned mxu
tracking kernel:
  1. "mix" K epoch windows from a span buffer: slice + trig-factored
     carrier product + mask + bf16 cast  (VPU)
  2. im2col into a W scratch
  3. correlate against an R-row replica bank  (MXU)
  4. tiny reduce into an accumulator (stands in for the loop-filter
     math, which is [C,1]-scale)

Variants:
  batched  — W [C, 2K, wp] bf16, batched dot_general (batch C)
  blockdiag— W [2K, C, wp] bf16 -> [2K*C, wp], one (1,1) dot vs
             A [C*R, wp] -> [C*R, 2K*C], then per-channel selection
             matmuls [R, 2KC] x [2KC, 2K]
Timing: two grid sizes, slope -> per-epoch cost.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 32
R = 8
K = 5            # epochs per superstep (2K|500)
WP = 2688        # real direct-layout wp at fs=2.046e6
N0 = 2046
SPAN = ((K - 1) * N0 // 128) * 128 + WP
TWO_PI = 6.283185307179586


def _mix_epoch(span_re, span_im, state, e, lane):
    """One epoch's mixed+masked window [C, WP] x2 from the span value.
    Mirrors the planned kernel's per-epoch VPU work."""
    a_e = (e * N0 // 128) * 128
    rem_e = e * N0 - a_e
    wre = span_re[:, a_e:a_e + WP]
    wim = span_im[:, a_e:a_e + WP]
    step = state[:, 0:1] * jnp.float32(1e-6)
    phi0 = state[:, 1:2] + jnp.float32(e) * step
    w128 = WP // 128
    q128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
        jnp.float32)
    th_a = phi0 + (step * 128.0) * q128
    th_a = (th_a - jnp.floor(th_a)) * jnp.float32(TWO_PI)
    th_b = step * q128
    th_b = (th_b - jnp.floor(th_b)) * jnp.float32(TWO_PI)
    a_c, a_s = jnp.cos(th_a), jnp.sin(th_a)
    b_c, b_s = jnp.cos(th_b), jnp.sin(th_b)
    cth_parts, sth_parts = [], []
    for qi in range(w128):
        ac = a_c[:, qi:qi + 1]
        as_ = a_s[:, qi:qi + 1]
        cth_parts.append(ac * b_c - as_ * b_s)
        sth_parts.append(as_ * b_c + ac * b_s)
    cth = jnp.concatenate(cth_parts, axis=1)
    sth = jnp.concatenate(sth_parts, axis=1)
    sl = state[:, 2:3] + jnp.float32(rem_e)
    n_t = state[:, 3:4]
    in_ep = jnp.logical_and(lane >= sl, lane < sl + n_t)
    mask = in_ep.astype(jnp.float32)
    m_re = (wre * cth + wim * sth) * mask
    m_im = (wim * cth - wre * sth) * mask
    return m_re.astype(jnp.bfloat16), m_im.astype(jnp.bfloat16)


def make_batched(n_u):
    def kernel(sre_ref, sim_ref, a_ref, st_ref, o_ref, w_scr, acc):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, WP), 1).astype(jnp.float32)
        st = st_ref[:]
        for e in range(K):
            m_re, m_im = _mix_epoch(sre_ref[:], sim_ref[:], st, e, lane)
            w_scr[:, 2 * e, :] = m_re
            w_scr[:, 2 * e + 1, :] = m_im
        out = jax.lax.dot_general(
            w_scr[:], a_ref[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # [C, 2K, R]
        acc[:] = acc[:] + jnp.sum(out, axis=1)

        @pl.when(u == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, R), jnp.float32),
        grid=(n_u,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, 2 * K, WP), jnp.bfloat16),
            pltpu.VMEM((C, R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def make_blockdiag(n_u):
    def kernel(sre_ref, sim_ref, a_ref, st_ref, sel_ref, o_ref,
               w_scr, acc):
        u = pl.program_id(0)

        @pl.when(u == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, WP), 1).astype(jnp.float32)
        st = st_ref[:]
        for e in range(K):
            m_re, m_im = _mix_epoch(sre_ref[:], sim_ref[:], st, e, lane)
            w_scr[2 * e] = m_re
            w_scr[2 * e + 1] = m_im
        w_flat = w_scr[:].reshape(2 * K * C, WP)
        big = jax.lax.dot_general(
            a_ref[:].reshape(C * R, WP), w_flat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [CR, 2K*C]
        for c in range(C):
            blk = big[c * R:(c + 1) * R, :]        # [R, 2KC]
            y = jnp.dot(blk.astype(jnp.bfloat16), sel_ref[c],
                        preferred_element_type=jnp.float32)  # [R, 2K]
            acc[c] = acc[c] + jnp.sum(y, axis=1)

        @pl.when(u == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, R), jnp.float32),
        grid=(n_u,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * K, C, WP), jnp.bfloat16),
            pltpu.VMEM((C, R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def mk_inputs(seed=0):
    rng = np.random.default_rng(seed)
    sre = jnp.asarray(rng.standard_normal((C, SPAN)), jnp.float32)
    sim = jnp.asarray(rng.standard_normal((C, SPAN)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((C, R, WP)), jnp.bfloat16)
    st = jnp.asarray(
        np.stack([np.full(C, 1000.0), rng.random(C),
                  np.full(C, 7.0), np.full(C, N0 - 1.0)], 1),
        jnp.float32)
    sel = np.zeros((C, 2 * K * C, 2 * K), np.float32)
    for c in range(C):
        for q in range(2 * K):
            sel[c, q * C + c, q] = 1.0
    sel = jnp.asarray(sel, jnp.bfloat16)
    return sre, sim, a, st, sel


def timeit(name, make, arg_sel):
    sre, sim, a, st, sel = mk_inputs()
    try:
        results = {}
        for n_u in (200, 800):
            f = jax.jit(make(n_u))
            args = arg_sel(sre, sim, a, st, sel)
            jax.device_get(f(*args))
            ts = []
            for i in (3, 5):
                s2 = sre * jnp.float32(1.0 + 0.1 * i)
                jax.block_until_ready(s2)
                t0 = time.perf_counter()
                jax.device_get(f(*((s2,) + args[1:])))
                ts.append(time.perf_counter() - t0)
            results[n_u] = min(ts)
        slope = (results[800] - results[200]) / 600
        per_epoch = slope / K * 1e6
        print(f"{name:12s} n200={results[200]*1e3:7.1f}ms "
              f"n800={results[800]*1e3:7.1f}ms "
              f"per-superstep={slope*1e6:7.2f}us "
              f"per-epoch={per_epoch:6.3f}us "
              f"-> {per_epoch:.3f} ms/signal-s(32ch)")
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAIL {type(e).__name__}: {e}"[:200])


def main():
    print(f"C={C} R={R} K={K} WP={WP} SPAN={SPAN}")
    timeit("batched", make_batched,
           lambda sre, sim, a, st, sel: (sre, sim, a, st))
    timeit("blockdiag", make_blockdiag,
           lambda sre, sim, a, st, sel: (sre, sim, a, st, sel))


if __name__ == "__main__":
    main()
