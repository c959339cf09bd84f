"""Split the fused tracking path cost: XLA pre-steps vs pallas kernel.

Times, each as a chained loop with one final sync:
  kernel-only    — track_block_fused on PRE-materialized windows+replicas
  presteps-only  — slice_windows + build_replicas, result reduced to a
                   scalar on device (no download)
  full           — presteps + kernel (the production path)

Usage: python tools/split_probe.py [--block-ms 500] [--blocks 8]
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
    ap.add_argument("--fs", type=float, default=2_046_000.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.config import TrackConfig
    from gnss_sdr_tpu.models import GPS_L1CA
    from gnss_sdr_tpu.ops.pallas import track_block_fused as fused
    from gnss_sdr_tpu.receiver import tracking as trk

    spec = GPS_L1CA
    fs, channels = args.fs, args.channels
    n0 = spec.samples_per_code(fs)
    t_epochs = args.block_ms
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
              pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2)

    @jax.jit
    def presteps(b1, b2):
        wre, wim = fused.slice_windows(b1, b2, offsets, t_epochs, n0,
                                       wp, el_pad)
        reps = fused.build_replicas(codes_rows, chip_phase, cps,
                                    params.el_shift, n0, wp,
                                    n_drift=n_drift)
        return wre, wim, reps

    wre0, wim0, reps0 = jax.block_until_ready(presteps(bre, bim))

    @jax.jit
    def kernel_only(st, a, b, r):
        return fused.track_block_fused(a, b, r, st, **kw)

    @jax.jit
    def presteps_chain(b1, b2):
        def body(carry, _):
            wre, wim, reps = presteps.__wrapped__(carry[0], carry[1])
            s = wre[0, 0, 0] + wim[0, 0, 0] + reps[0, 0, 0]
            return (carry[0] + s * 1e-20, carry[1]), s
        (_, _), ss = jax.lax.scan(body, (b1, b2), None,
                                  length=args.blocks)
        return ss

    @jax.jit
    def full(st, b1, b2):
        wre, wim, reps = presteps.__wrapped__(b1, b2)
        return fused.track_block_fused(wre, wim, reps, st, **kw)

    sig_s = args.block_ms / 1000.0

    def timeit(label, fn, *a):
        out = jax.block_until_ready(fn(*a))
        st = out[1] if isinstance(out, tuple) and len(out) == 2 else None
        t0 = time.perf_counter()
        if st is not None:
            s = st
            for _ in range(args.blocks):
                tel, s = fn(a[0] * 0 + s if False else s, *a[1:])
            jax.block_until_ready(tel)
        else:
            jax.block_until_ready(fn(*a))
        dt = (time.perf_counter() - t0) / (args.blocks * sig_s)
        print(f"{label:16s} {dt:10.5f} s/signal-s  "
              f"{dt * 1e6 * sig_s / args.block_ms:8.2f} us/epoch")

    timeit("kernel-only", kernel_only, state0, wre0, wim0, reps0)
    timeit("full", full, state0, bre, bim)
    # presteps chained (already internally looped, one dispatch)
    jax.block_until_ready(presteps_chain(bre, bim))
    t0 = time.perf_counter()
    jax.block_until_ready(presteps_chain(bim, bre))
    dt = (time.perf_counter() - t0) / (args.blocks * sig_s)
    print(f"{'presteps-only':16s} {dt:10.5f} s/signal-s  "
          f"{dt * 1e6 * sig_s / args.block_ms:8.2f} us/epoch")


if __name__ == "__main__":
    main()
