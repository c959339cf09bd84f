"""On-chip ablation profile of the fused tracking path.

Times, per epoch, each stage of the fused block step in isolation:

  a. full step   : slice_windows + build_replicas + kernel (bench path)
  b. kernel-only : windows/replicas precomputed, kernel alone
  c. grid-only   : same grid/in-out shapes, near-empty body (overhead)
  d. pre-steps   : slice_windows + build_replicas alone
  e. resident    : shared-stream variant kernel alone

All timings chain the step K times with a device-side data dependence
(the axon tunnel acks single dispatches early; only chained-graph /
one-sync measurements are trustworthy — see bench.py acq_chain).

Usage: python tools/profile_fused.py [--channels 32] [--epochs 500]
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


def timed(fn, st, blocks, label, epochs, *extra):
    """Times ``fn(st, *extra)`` chained ``blocks`` times (state carries
    the data dependence). ``extra`` device arrays pass as ARGUMENTS —
    closing over large arrays bakes them into the HLO as constants,
    which the remote-compile transport rejects (HTTP 413)."""
    import jax
    out = fn(st, *extra)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    s = st
    for _ in range(blocks):
        s = fn(s, *extra)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    per_epoch = dt / (blocks * epochs) * 1e6
    print(f"{label:28s} {dt*1e3:9.2f} ms total  {per_epoch:8.3f} us/epoch",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--blocks", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/gnss_jax_cache_" + jax.default_backend())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gnss_sdr_tpu.config import TrackConfig
    from gnss_sdr_tpu.models import GPS_L1CA
    from gnss_sdr_tpu.ops.pallas import track_block_fused as fused
    from gnss_sdr_tpu.receiver import tracking as trk

    interp = jax.default_backend() == "cpu"
    spec = GPS_L1CA
    fs = 2_046_000.0
    channels, t_epochs = args.channels, args.epochs
    n0 = spec.samples_per_code(fs)
    cfg = TrackConfig(n_channels=channels, correlator="slice")
    params = trk.TrackParams.create(cfg, spec, fs)
    codes_s = np.asarray(trk.make_sampled_code_table(
        spec, fs, 32, window=params.window))
    wp = ((params.window + 63 + 127) // 128) * 128
    codes_rows = jnp.asarray(
        np.stack([codes_s[c % 32] for c in range(channels)]))
    rng = np.random.default_rng(0)
    block_len = (t_epochs + 3) * n0 + wp
    bre = jnp.asarray(rng.standard_normal(block_len), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(block_len), jnp.float32)
    offsets = jnp.full((channels,), n0, jnp.int32)
    state0 = np.zeros((channels, fused.N_FIELDS), np.float32)
    state0[:, 0] = 1000.0
    state0[:, 3] = spec.code_rate_hz
    state0[:, 7] = 1.0
    state0 = jnp.asarray(state0)
    chip_phase = jnp.zeros((channels,), jnp.float32)
    cps = jnp.full((channels,), spec.code_rate_hz / fs, jnp.float32)
    p1, p2, d1, d2 = fused.loop_filter_consts(cfg)
    n_drift = 5
    el_pad = params.el_shift + (n_drift - 1) // 2
    kw = dict(n0=n0, fs=fs, lock_threshold=cfg.lock_threshold,
              max_lost=cfg.max_lost_epochs,
              pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
              interpret=interp)

    # ---- a. full step -------------------------------------------------
    @jax.jit
    def full_step(st):
        wre, wim = fused.slice_windows(bre, bim, offsets, t_epochs, n0,
                                       wp, el_pad)
        reps = fused.build_replicas(codes_rows, chip_phase, cps,
                                    params.el_shift, n0, wp,
                                    n_drift=n_drift)
        _, st2 = fused.track_block_fused(wre, wim, reps, st, **kw)
        return st2

    timed(full_step, state0, args.blocks, "a. full step", t_epochs)

    # ---- b. kernel only -----------------------------------------------
    wre0, wim0 = jax.jit(functools.partial(
        fused.slice_windows, t_epochs=t_epochs, n0=n0, wp=wp,
        el_pad=el_pad))(bre, bim, offsets)
    reps0 = jax.jit(functools.partial(
        fused.build_replicas, el_shift=params.el_shift, n0=n0, wp=wp,
        n_drift=n_drift))(codes_rows, chip_phase, cps)
    wre0, wim0, reps0 = jax.block_until_ready((wre0, wim0, reps0))

    @jax.jit
    def kernel_only(st, wre, wim, reps):
        _, st2 = fused.track_block_fused(wre, wim, reps, st, **kw)
        return st2

    timed(kernel_only, state0, args.blocks, "b. kernel only", t_epochs,
          wre0, wim0, reps0)

    # ---- b2. kernel minus telemetry write ------------------------------
    # same kernel, but telemetry out-shape [T, C, 8] instead of 128 to
    # see the telemetry-store cost (can't drop output entirely)
    # (approximated by timing the kernel at N_FIELDS telem width vs 8
    #  via a hacked pallas_call below)

    # ---- c. grid overhead ----------------------------------------------
    def _noop_kernel(win_re_ref, win_im_ref, reps_ref, state_in_ref,
                     telem_ref, state_out_ref, state):
        t = pl.program_id(0)
        n_epochs = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            state[:] = state_in_ref[:]
        telem_ref[0] = state[:] + win_re_ref[0, :, :fused.N_FIELDS]

        @pl.when(t == n_epochs - 1)
        def _():
            state_out_ref[:] = state[:]

    noop = pl.pallas_call(
        _noop_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_epochs, channels, fused.N_FIELDS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((channels, fused.N_FIELDS), jnp.float32),
        ),
        grid=(t_epochs,),
        in_specs=[
            pl.BlockSpec((1, channels, wp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels, wp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, channels, fused.N_FIELDS), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((channels, fused.N_FIELDS), jnp.float32)],
        interpret=interp,
    )

    @jax.jit
    def grid_only(st, wre, wim, reps):
        _, st2 = noop(wre, wim, reps, st)
        return st2

    timed(grid_only, state0, args.blocks, "c. grid+window-DMA only",
          t_epochs, wre0, wim0, reps0)

    # ---- c2. grid overhead without the window DMA ----------------------
    noop2 = pl.pallas_call(
        _noop_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_epochs, channels, fused.N_FIELDS),
                                 jnp.float32),
            jax.ShapeDtypeStruct((channels, fused.N_FIELDS), jnp.float32),
        ),
        grid=(t_epochs,),
        in_specs=[
            pl.BlockSpec((1, channels, fused.N_FIELDS), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels, fused.N_FIELDS), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, channels, fused.N_FIELDS), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((channels, fused.N_FIELDS), jnp.float32)],
        interpret=interp,
    )
    wsmall = jax.block_until_ready(wre0[:, :, :fused.N_FIELDS])

    @jax.jit
    def grid_only2(st, ws, reps):
        _, st2 = noop2(ws, ws, reps, st)
        return st2

    timed(grid_only2, state0, args.blocks, "c2. grid only (no DMA)",
          t_epochs, wsmall, reps0)

    # ---- d. pre-steps only ----------------------------------------------
    @jax.jit
    def pre_steps(st):
        wre, wim = fused.slice_windows(bre, bim, offsets, t_epochs, n0,
                                       wp, el_pad)
        reps = fused.build_replicas(codes_rows, chip_phase, cps,
                                    params.el_shift, n0, wp,
                                    n_drift=n_drift)
        return st + wre[0, :, :fused.N_FIELDS] + wim[0, :, :fused.N_FIELDS] \
            + reps[:, 0, :fused.N_FIELDS]

    timed(pre_steps, state0, args.blocks, "d. XLA pre-steps only",
          t_epochs)

    # ---- e. resident kernel ---------------------------------------------
    wp_res = ((2 * n0 + 64 + 127) // 128) * 128 + (128 if n0 % 128 else 0)
    codes4 = np.asarray(trk.make_sampled_code_table(
        spec, fs, 32, window=3 * n0 + wp_res + 16))
    codes4_rows = jnp.asarray(
        np.stack([codes4[c % 32] for c in range(channels)]))
    reps_sh = jax.jit(functools.partial(
        fused.build_replicas_shared, el_shift=params.el_shift, n0=n0,
        wp=wp_res, n_drift=n_drift))(
            codes4_rows, chip_phase, cps,
            jnp.asarray(np.full(channels, 64, np.int32)))
    reps_sh = jax.block_until_ready(reps_sh)
    st_res = np.asarray(state0).copy()
    st_res[:, 9] = 64.0
    st_res = jnp.asarray(st_res)

    for k_ep in (128, t_epochs):
        @functools.partial(jax.jit, static_argnames=("k_ep",))
        def res_step(st, rep, k_ep):
            _, st2 = fused.track_block_fused_resident(
                bre, bim, rep, st, t_epochs=t_epochs, k_epochs=k_ep,
                wp=wp_res, **kw)
            return st2

        timed(functools.partial(res_step, k_ep=k_ep), st_res, args.blocks,
              f"e. resident k={k_ep}", t_epochs, reps_sh)


if __name__ == "__main__":
    main()
