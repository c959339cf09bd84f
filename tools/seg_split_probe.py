"""Decompose the seg-layout fused block step on the real chip.

Times, each as its own chained loop with one sync:
  gather    — gather_segments alone
  replicas  — build_replicas (with lane_shift) alone
  kernel    — track_block_fused_seg alone on pre-gathered segments
  full      — the complete _fused_block_step_seg

    python tools/seg_split_probe.py [--blocks 8] [--fs 2046000]
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
    from gnss_sdr_tpu.receiver import fused_runner as fr
    from gnss_sdr_tpu.receiver import tracking as trk

    spec = GPS_L1CA
    fs, C, T = args.fs, args.channels, args.block_ms
    n0 = spec.samples_per_code(fs)
    cfg = TrackConfig(n_channels=C, correlator="fused")
    params = trk.TrackParams.create(cfg, spec, fs)
    codes_s = np.asarray(trk.make_sampled_code_table(
        spec, fs, 32, window=params.window))
    codes_rows = jnp.asarray(
        np.stack([codes_s[c % 32] for c in range(C)]))
    buf_len = (T + 4) * n0 + 8192
    ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, T, buf_len,
                         layout="seg")
    wp, l_seg, el_pad = ft.wp, ft.l_seg, ft.el_pad
    el_shift = params.el_shift
    p1, p2, d1, d2 = fused.loop_filter_consts(cfg)

    rng = np.random.default_rng(0)
    bre = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    offset0 = np.full(C, n0, np.int64)
    a_c = ((offset0 - el_pad) // 128) * 128
    starts = jnp.asarray(a_c.astype(np.int32))
    rem_c0 = jnp.asarray((offset0 - a_c - el_pad).astype(np.int32))
    anchor = jnp.zeros((C,), jnp.int32)

    mat = np.zeros((C, fused.N_FIELDS), np.float32)
    mat[:, 0] = 1000.0
    mat[:, 3] = spec.code_rate_hz
    mat[:, 7] = 1.0
    mat[:, 9] = (offset0 - a_c).astype(np.float32)
    mat[:, 12] = a_c.astype(np.float32)
    mat_j = jnp.asarray(mat)

    @jax.jit
    def g_gather(x, y):
        r1, r2 = fused.gather_segments(x, y, starts, l_seg)
        e = 1e-20 * (r1[0, 0] + r2[0, 0])
        return x + e, y + e

    @jax.jit
    def g_reps(st):
        r = fused.build_replicas(codes_rows, None, None, el_shift,
                                 n0, wp, n_drift=5, anchor=anchor,
                                 lane_shift=rem_c0)
        return st + 1e-20 * r[0, 0, 0]

    seg_re, seg_im = jax.jit(
        lambda: fused.gather_segments(bre, bim, starts, l_seg))()
    reps0 = jax.jit(
        lambda: fused.build_replicas(codes_rows, None, None, el_shift,
                                     n0, wp, n_drift=5, anchor=anchor,
                                     lane_shift=rem_c0))()
    jax.block_until_ready((seg_re, seg_im, reps0))

    @jax.jit
    def g_kernel(st):
        telem, so = fused.track_block_fused_seg(
            seg_re, seg_im, reps0, st, t_epochs=T, n0=n0, wp=wp,
            fs=fs, lock_threshold=cfg.lock_threshold,
            max_lost=cfg.max_lost_epochs,
            pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
            el_shift=el_shift)
        return so + 1e-20 * telem[0, 0, 0]

    @jax.jit
    def g_full(st):
        telem, so = ft._step(bre, bim, codes_rows, st)
        return jnp.concatenate(
            [so[:, :8], mat_j[:, 8:14], so[:, 14:]],
            axis=1) + 1e-20 * telem[0, 0, 0]

    results = {}
    for name, fn, arg in (("gather", g_gather, (bre, bim)),
                          ("replicas", g_reps, (mat_j,)),
                          ("kernel", g_kernel, (mat_j,)),
                          ("full", g_full, (mat_j,))):
        out = fn(*arg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        x = arg
        for _ in range(args.blocks):
            out = fn(*x)
            x = out if isinstance(out, tuple) else (out,)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[name] = dt / (args.blocks * T / 1000.0)

    print(f"fs={fs:.0f} n0={n0} wp={wp} l_seg={l_seg} C={C} T={T}")
    print(f"{'stage':<10} {'s/signal-s':>12} {'rtf':>9}")
    for k, v in results.items():
        print(f"{k:<10} {v:>12.6f} {1.0 / v:>9.1f}")


if __name__ == "__main__":
    main()
