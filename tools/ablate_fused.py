"""On-chip ablation profile of the fused tracking kernel.

Times track_block_fused with individual stages stubbed out (the
``ablate`` profiling hook) to attribute the per-epoch cost:
carrier trig, replica variant select, E/L rolls, E/L correlations,
telemetry scatter. Run on the real TPU:

    python tools/ablate_fused.py [--blocks 10] [--block-ms 500]

Prints a table of s-per-signal-s per variant and the delta vs full.
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
    ap.add_argument("--blocks", type=int, default=10)
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
    interpret = jax.default_backend() == "cpu"

    wre, wim = jax.jit(
        lambda: fused.slice_windows(bre, bim, offsets, t_epochs, n0,
                                    wp, el_pad))()
    reps = jax.jit(
        lambda: fused.build_replicas(codes_rows, chip_phase, cps,
                                     params.el_shift, n0, wp,
                                     n_drift=n_drift))()
    jax.block_until_ready((wre, wim, reps))

    def make_step(ablate):
        # windows/replicas passed as ARGUMENTS (closure-captured arrays
        # embed as constants in the compile payload — 557 MB here)
        @jax.jit
        def step(a, b, r, st):
            return fused.track_block_fused(
                a, b, r, st, n0=n0, fs=fs,
                lock_threshold=cfg.lock_threshold,
                max_lost=cfg.max_lost_epochs,
                pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                interpret=interpret, ablate=ablate)
        return step

    # also time the XLA pre-steps alone (windows+replicas rebuilt, no
    # kernel) to split pre-step vs kernel cost
    @jax.jit
    def presteps(st):
        a, b = fused.slice_windows(bre, bim, offsets, t_epochs, n0,
                                   wp, el_pad)
        r = fused.build_replicas(codes_rows, chip_phase, cps,
                                 params.el_shift, n0, wp,
                                 n_drift=n_drift)
        return (a.sum() + b.sum() + r.sum()).reshape(1, 1) + st[:1, :1]

    variants = ["", "notrig", "nosel", "noroll", "noel", "notelem",
                "notrig,nosel,noroll,noel,notelem"]
    results = {}
    for v in variants:
        step = make_step(v)
        telem, st = step(wre, wim, reps, state0)
        jax.block_until_ready((telem, st))
        t0 = time.perf_counter()
        st = state0
        for _ in range(args.blocks):
            telem, st = step(wre, wim, reps, st)
        jax.block_until_ready((telem, st))
        dt = time.perf_counter() - t0
        per_sig = dt / (args.blocks * t_epochs / 1000.0)
        results[v or "full"] = per_sig

    x = presteps(state0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(args.blocks):
        x = presteps(x[:1, :1] * 0 + state0)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    results["presteps-only"] = dt / (args.blocks * t_epochs / 1000.0)

    full = results["full"]
    print(f"{'variant':<36} {'s/signal-s':>12} {'delta_ms':>10} "
          f"{'rtf':>8}")
    for k, v in results.items():
        print(f"{k:<36} {v:>12.5f} {(full - v) * 1e3:>10.2f} "
              f"{1.0 / v:>8.1f}x")


if __name__ == "__main__":
    main()
