"""Slope-based TRUE device time for the fused layouts.

The tunnel pays a ~30 ms flush quantum per sync, so short timed runs
are quantum-dominated. This probe times each variant at TWO scan
lengths and reports the slope — the true per-block device time.

    python tools/slope_probe.py [--n1 8] [--n2 40] [--fs 2046000]
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
    ap.add_argument("--n2", type=int, default=40)
    ap.add_argument("--block-ms", type=int, default=500)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--fs", type=float, default=2_046_000.0)
    ap.add_argument("--skip", default="",
                    help="comma list of variants to skip")
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
    N1, N2 = args.n1, args.n2
    skip = set(args.skip.split(",")) if args.skip else set()
    n0 = spec.samples_per_code(fs)
    cfg = TrackConfig(n_channels=C, correlator="fused")
    params = trk.TrackParams.create(cfg, spec, fs)
    codes_s = np.asarray(trk.make_sampled_code_table(
        spec, fs, 32, window=params.window))
    codes_rows = jnp.asarray(
        np.stack([codes_s[c % 32] for c in range(C)]))
    buf_len = (T + 4) * n0 + 8192
    rng = np.random.default_rng(0)
    bre = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    p1, p2, d1, d2 = fused.loop_filter_consts(cfg)
    el_shift = params.el_shift

    def mat_for(layout, ft):
        offset0 = np.full(C, n0, np.int64)
        mat = np.zeros((C, fused.N_FIELDS), np.float32)
        mat[:, 0] = 1000.0
        mat[:, 3] = spec.code_rate_hz
        mat[:, 7] = 1.0
        if layout in ("seg", "direct"):
            a_c = ((offset0 - ft.el_pad) // 128) * 128
            mat[:, 9] = (offset0 - a_c).astype(np.float32)
            mat[:, 12] = a_c.astype(np.float32)
        else:
            mat[:, 12] = offset0.astype(np.float32)
        return mat

    def slope(mk, arg):
        f1, f2 = mk(N1), mk(N2)
        o = f1(arg)
        jax.block_until_ready(o)
        o = f2(arg)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = f1(arg)
        jax.block_until_ready(o)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        o = f2(arg)
        jax.block_until_ready(o)
        t2 = time.perf_counter() - t0
        return (t2 - t1) / (N2 - N1)

    results = {}

    for layout in ("windows", "seg", "direct"):
        if layout in skip:
            continue
        ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, T,
                             buf_len, layout=layout)
        mat = mat_for(layout, ft)
        fix = jnp.asarray(mat[:, 8:14])

        def mk(n, ft=ft, fix=fix):
            @jax.jit
            def f(st):
                def body(s, _):
                    telem, so = ft._step(bre, bim, codes_rows, s)
                    so = jnp.concatenate(
                        [so[:, :8], fix, so[:, 14:]], axis=1)
                    return so + 1e-20 * telem[0, 0, 0], None
                out, _ = jax.lax.scan(f=body, init=st, xs=None, length=n)
                return out
            return f

        results[layout] = slope(mk, jnp.asarray(mat))

    if "resident" not in skip:
        wp_res = ((2 * n0 + 256 + 127) // 128) * 128
        codes4x = jnp.asarray(np.stack([
            np.tile(codes_s[c % 32][:n0], 5)[: 3 * n0 + wp_res + 8]
            for c in range(C)]))
        offs = jnp.zeros((C,), jnp.int32)
        chip_phase = jnp.zeros((C,), jnp.float32)
        cps = jnp.full((C,), spec.code_rate_hz / fs, jnp.float32)
        reps_res = jax.jit(lambda: fused.build_replicas_shared(
            codes4x, chip_phase, cps, offs, el_shift, n0, wp_res,
            n_drift=5))()
        jax.block_until_ready(reps_res)
        mat = mat_for("windows", None)
        mat[:, 9] = 4.0

        def mk_res(n):
            @jax.jit
            def f(st):
                def body(s, _):
                    telem, so = fused.track_block_fused_resident(
                        bre, bim, reps_res, s, t_epochs=T, n0=n0,
                        wp=wp_res, fs=fs,
                        lock_threshold=cfg.lock_threshold,
                        max_lost=cfg.max_lost_epochs,
                        pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                        el_shift=el_shift)
                    return so + 1e-20 * telem[0, 0, 0], None
                out, _ = jax.lax.scan(f=body, init=st, xs=None, length=n)
                return out
            return f

        results["resident"] = slope(mk_res, jnp.asarray(mat))

    # seg stage splits
    if "stages" not in skip:
        ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, T, buf_len,
                             layout="seg")
        offset0 = np.full(C, n0, np.int64)
        a_c = ((offset0 - ft.el_pad) // 128) * 128
        starts = jnp.asarray(a_c.astype(np.int32))
        rem_c0 = jnp.asarray(
            (offset0 - a_c - ft.el_pad).astype(np.int32))
        anchor = jnp.zeros((C,), jnp.int32)

        def mk_gather(n):
            @jax.jit
            def f(xy):
                def body(c, _):
                    x, y = c
                    r1, r2 = fused.gather_segments(x, y, starts,
                                                   ft.l_seg)
                    e = 1e-20 * (r1[0, 0] + r2[0, 0])
                    return (x + e, y + e), None
                out, _ = jax.lax.scan(f=body, init=xy, xs=None, length=n)
                return out
            return f

        results["gather-only"] = slope(mk_gather, (bre, bim))

        def mk_reps(n):
            @jax.jit
            def f(st):
                def body(s, _):
                    r = fused.build_replicas(
                        codes_rows, None, None, el_shift, n0, ft.wp,
                        n_drift=5, anchor=anchor, lane_shift=rem_c0)
                    return s + 1e-20 * r[0, 0, 0], None
                out, _ = jax.lax.scan(f=body, init=st, xs=None, length=n)
                return out
            return f

        st0 = jnp.asarray(mat_for("seg", ft))
        results["replicas-only"] = slope(mk_reps, st0)

        seg_re, seg_im = jax.jit(lambda: fused.gather_segments(
            bre, bim, starts, ft.l_seg))()
        reps0 = jax.jit(lambda: fused.build_replicas(
            codes_rows, None, None, el_shift, n0, ft.wp, n_drift=5,
            anchor=anchor, lane_shift=rem_c0))()
        jax.block_until_ready((seg_re, seg_im, reps0))

        def mk_kernel(n):
            @jax.jit
            def f(st):
                def body(s, _):
                    telem, so = fused.track_block_fused_seg(
                        seg_re, seg_im, reps0, s, t_epochs=T, n0=n0,
                        wp=ft.wp, fs=fs,
                        lock_threshold=cfg.lock_threshold,
                        max_lost=cfg.max_lost_epochs,
                        pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                        el_shift=el_shift)
                    return so + 1e-20 * telem[0, 0, 0], None
                out, _ = jax.lax.scan(f=body, init=st, xs=None, length=n)
                return out
            return f

        results["seg-kernel-only"] = slope(mk_kernel, st0)

    sig = T / 1000.0
    print(f"fs={fs:.0f} n0={n0} N1={N1} N2={N2}")
    print(f"{'variant':<16} {'dev-ms/blk':>10} {'s/signal-s':>11} "
          f"{'rtf':>8}")
    for k, v in results.items():
        print(f"{k:<16} {v * 1e3:>10.3f} {v / sig:>11.6f} "
              f"{sig / max(v, 1e-9):>8.1f}")


if __name__ == "__main__":
    main()
