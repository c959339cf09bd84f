"""Decompose the DIRECT fused kernel on the real chip via ablate hooks.

Times (slope method, one sync per chain):
  full       — production kernel
  min        — ablate everything (DMA + window reads + minimal ops)
  notrig     — carrier trig off
  noselroll  — replica select + rolls off
plus the seg kernel's 'min' for an apples-to-apples DMA/read floor.

    python tools/direct_ablate_probe.py [--n1 8] [--n2 24]
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
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=24)
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
    codes_rows = jnp.asarray(np.stack([codes_s[c % 32] for c in range(C)]))
    buf_len = (T + 4) * n0 + 8192
    rng = np.random.default_rng(0)
    bre = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    p1, p2, d1, d2 = fused.loop_filter_consts(cfg)
    el_shift = params.el_shift

    ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, T, buf_len,
                         layout="direct")
    offset0 = np.full(C, n0, np.int64)
    a_c = ((offset0 - ft.el_pad) // 128) * 128
    starts = jnp.asarray(a_c.astype(np.int32))
    rem_c0 = jnp.asarray((offset0 - a_c - ft.el_pad).astype(np.int32))
    anchor = jnp.zeros((C,), jnp.int32)
    mat = np.zeros((C, fused.N_FIELDS), np.float32)
    mat[:, 0] = 1000.0
    mat[:, 3] = spec.code_rate_hz
    mat[:, 7] = 1.0
    mat[:, 9] = (offset0 - a_c).astype(np.float32)
    st0 = jnp.asarray(mat)

    reps = jax.jit(lambda: fused.build_replicas(
        codes_rows, None, None, el_shift, n0, ft.wp, n_drift=5,
        anchor=anchor, lane_shift=rem_c0))()
    jax.block_until_ready(reps)

    def slope(mk):
        f1, f2 = mk(args.n1), mk(args.n2)
        o = f1(st0); jax.block_until_ready(o)
        o = f2(st0); jax.block_until_ready(o)
        t0 = time.perf_counter(); o = f1(st0); jax.block_until_ready(o)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); o = f2(st0); jax.block_until_ready(o)
        t2 = time.perf_counter() - t0
        return (t2 - t1) / (args.n2 - args.n1)

    def mk_direct(ablate):
        def mk(n):
            @jax.jit
            def f(st):
                def body(s, _):
                    telem, so = fused.track_block_fused_direct(
                        bre, bim, starts, reps, s, t_epochs=T,
                        k_epochs=ft.k_epochs, n0=n0, wp=ft.wp, fs=fs,
                        lock_threshold=cfg.lock_threshold,
                        max_lost=cfg.max_lost_epochs,
                        pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                        el_shift=el_shift, ablate=ablate)
                    return s + 1e-20 * (so[0, 0] + telem[0, 0, 0]), None
                out, _ = jax.lax.scan(body, st, None, length=n)
                return out
            return f
        return mk

    # seg kernel min for comparison
    ft_seg = fr.FusedTracker(params, cfg, spec, fs, codes_s, T, buf_len,
                             layout="seg")
    reps_seg = jax.jit(lambda: fused.build_replicas(
        codes_rows, None, None, el_shift, n0, ft_seg.wp, n_drift=5,
        anchor=anchor, lane_shift=rem_c0))()
    seg_re, seg_im = jax.jit(lambda: fused.gather_segments(
        bre, bim, starts, ft_seg.l_seg))()
    jax.block_until_ready((reps_seg, seg_re, seg_im))

    def mk_seg(ablate):
        def mk(n):
            @jax.jit
            def f(st):
                def body(s, _):
                    telem, so = fused.track_block_fused_seg(
                        seg_re, seg_im, reps_seg, s, t_epochs=T, n0=n0,
                        wp=ft_seg.wp, fs=fs,
                        lock_threshold=cfg.lock_threshold,
                        max_lost=cfg.max_lost_epochs,
                        pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                        el_shift=el_shift, ablate=ablate)
                    return s + 1e-20 * (so[0, 0] + telem[0, 0, 0]), None
                out, _ = jax.lax.scan(body, st, None, length=n)
                return out
            return f
        return mk

    sig = T / 1000.0
    rows = [
        ("direct-full", mk_direct("")),
        ("direct-min", mk_direct("notrig,nosel,noroll,noel,notelem")),
        ("direct-notrig", mk_direct("notrig")),
        ("direct-noselroll", mk_direct("nosel,noroll")),
        ("seg-full", mk_seg("")),
        ("seg-min", mk_seg("notrig,nosel,noroll,noel,notelem")),
    ]
    print(f"fs={fs:.0f} n0={n0} wp_direct={ft.wp} K={ft.k_epochs} "
          f"wp_seg={ft_seg.wp}")
    print(f"{'variant':<18} {'dev-ms/blk':>10} {'s/signal-s':>11} {'rtf':>8}")
    for name, mk in rows:
        try:
            v = slope(mk)
            print(f"{name:<18} {v * 1e3:>10.3f} {v / sig:>11.6f} "
                  f"{sig / max(v, 1e-9):>8.1f}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:<18} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
