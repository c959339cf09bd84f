"""TRUE device time per layout: N-block lax.scan chains, ONE dispatch.

Subtracts the measured no-op dispatch cost. Layouts: windows, seg,
resident, plus stage splits (gather/replicas/kernel) all scan-chained.

    python tools/true_device_probe.py [--blocks 8] [--fs 2046000]
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
    fs, C, T, N = args.fs, args.channels, args.block_ms, args.blocks
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
        if layout == "seg":
            a_c = ((offset0 - ft.el_pad) // 128) * 128
            mat[:, 9] = (offset0 - a_c).astype(np.float32)
            mat[:, 12] = a_c.astype(np.float32)
        else:
            mat[:, 12] = offset0.astype(np.float32)
        return mat

    def timed(fn, arg):
        out = fn(arg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(arg)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    results = {}

    @jax.jit
    def noop_chain(st):
        def body(s, _):
            return s * jnp.float32(1.0000001), None
        out, _ = jax.lax.scan(body, st, None, length=N)
        return out

    st0_np = mat_for("seg", fr.FusedTracker(
        params, cfg, spec, fs, codes_s, T, buf_len, layout="seg"))
    st0 = jnp.asarray(st0_np)
    base = timed(noop_chain, st0)

    for layout in ("windows", "seg"):
        ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, T,
                             buf_len, layout=layout)
        mat = mat_for(layout, ft)
        fix = jnp.asarray(mat[:, 8:14])

        @jax.jit
        def chain(st, ft=ft, fix=fix):
            def body(s, _):
                telem, so = ft._step(bre, bim, codes_rows, s)
                so = jnp.concatenate([so[:, :8], fix, so[:, 14:]],
                                     axis=1)
                return so + 1e-20 * telem[0, 0, 0], None
            out, _ = jax.lax.scan(body, st, None, length=N)
            return out

        results[layout] = timed(chain, jnp.asarray(mat)) - base

    # resident layout (shared stream)
    wp_res = ((2 * n0 + 256 + 127) // 128) * 128
    codes4x = jnp.asarray(np.stack([
        np.tile(codes_s[c % 32][:n0], 5)[: 3 * n0 + wp_res + 2 * 4]
        for c in range(C)]))
    offs = jnp.full((C,), 0, jnp.int32)
    chip_phase = jnp.zeros((C,), jnp.float32)
    cps = jnp.full((C,), spec.code_rate_hz / fs, jnp.float32)
    reps_res = jax.jit(lambda: fused.build_replicas_shared(
        codes4x, chip_phase, cps, offs, el_shift, n0, wp_res,
        n_drift=5))()
    jax.block_until_ready(reps_res)
    mat = mat_for("windows", None)
    mat[:, 9] = 4.0  # el_pad

    @jax.jit
    def chain_res(st):
        def body(s, _):
            telem, so = fused.track_block_fused_resident(
                bre, bim, reps_res, s, t_epochs=T, n0=n0, wp=wp_res,
                fs=fs, lock_threshold=cfg.lock_threshold,
                max_lost=cfg.max_lost_epochs,
                pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                el_shift=el_shift)
            return so + 1e-20 * telem[0, 0, 0], None
        out, _ = jax.lax.scan(body, jnp.asarray(st), None, length=N)
        return out

    results["resident"] = timed(chain_res, jnp.asarray(mat)) - base

    # seg stage splits
    ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, T, buf_len,
                         layout="seg")
    offset0 = np.full(C, n0, np.int64)
    a_c = ((offset0 - ft.el_pad) // 128) * 128
    starts = jnp.asarray(a_c.astype(np.int32))
    rem_c0 = jnp.asarray((offset0 - a_c - ft.el_pad).astype(np.int32))
    anchor = jnp.zeros((C,), jnp.int32)

    @jax.jit
    def chain_gather(xy):
        def body(c, _):
            x, y = c
            r1, r2 = fused.gather_segments(x, y, starts, ft.l_seg)
            e = 1e-20 * (r1[0, 0] + r2[0, 0])
            return (x + e, y + e), None
        out, _ = jax.lax.scan(body, xy, None, length=N)
        return out

    results["gather-only"] = timed(chain_gather, (bre, bim)) - base

    @jax.jit
    def chain_reps(st):
        def body(s, _):
            r = fused.build_replicas(codes_rows, None, None, el_shift,
                                     n0, ft.wp, n_drift=5,
                                     anchor=anchor, lane_shift=rem_c0)
            return s + 1e-20 * r[0, 0, 0], None
        out, _ = jax.lax.scan(body, st, None, length=N)
        return out

    results["replicas-only"] = timed(chain_reps, st0) - base

    seg_re, seg_im = jax.jit(lambda: fused.gather_segments(
        bre, bim, starts, ft.l_seg))()
    reps0 = jax.jit(lambda: fused.build_replicas(
        codes_rows, None, None, el_shift, n0, ft.wp, n_drift=5,
        anchor=anchor, lane_shift=rem_c0))()
    jax.block_until_ready((seg_re, seg_im, reps0))

    @jax.jit
    def chain_kernel(st):
        def body(s, _):
            telem, so = fused.track_block_fused_seg(
                seg_re, seg_im, reps0, s, t_epochs=T, n0=n0, wp=ft.wp,
                fs=fs, lock_threshold=cfg.lock_threshold,
                max_lost=cfg.max_lost_epochs,
                pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                el_shift=el_shift)
            return so + 1e-20 * telem[0, 0, 0], None
        out, _ = jax.lax.scan(body, st, None, length=N)
        return out

    results["seg-kernel-only"] = timed(chain_kernel, st0) - base

    sig = N * T / 1000.0
    print(f"fs={fs:.0f} n0={n0} wp={ft.wp} blocks={N} "
          f"noop-chain-base={base * 1e3:.1f}ms")
    print(f"{'variant':<16} {'dev-ms/blk':>10} {'s/signal-s':>11} "
          f"{'rtf':>8}")
    for k, v in results.items():
        print(f"{k:<16} {v / N * 1e3:>10.2f} {v / sig:>11.6f} "
              f"{sig / max(v, 1e-9):>8.1f}")


if __name__ == "__main__":
    main()
