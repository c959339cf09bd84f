"""Time the COMPLETE fused block step (pre-steps + kernel) per layout.

Measures what the receiver actually dispatches per block
(receiver/fused_runner.py _fused_block_step / _fused_block_step_seg):
gather/slice + build_replicas + fused kernel, chained device-side with
one sync, for both layouts and both the unaligned (2.046 MHz, n0=2046)
and lane-aligned (2.048 MHz, n0=2048) operating points.

    python tools/fullstep_probe.py [--blocks 8] [--block-ms 500]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_point(fs: float, channels: int, t_epochs: int, blocks: int):
    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.config import TrackConfig
    from gnss_sdr_tpu.models import GPS_L1CA
    from gnss_sdr_tpu.ops.pallas import track_block_fused as fused
    from gnss_sdr_tpu.receiver import fused_runner as fr
    from gnss_sdr_tpu.receiver import tracking as trk

    spec = GPS_L1CA
    n0 = spec.samples_per_code(fs)
    cfg = TrackConfig(n_channels=channels, correlator="fused")
    params = trk.TrackParams.create(cfg, spec, fs)
    codes_s = np.asarray(trk.make_sampled_code_table(
        spec, fs, 32, window=params.window))
    codes_rows = jnp.asarray(
        np.stack([codes_s[c % 32] for c in range(channels)]))

    rng = np.random.default_rng(0)
    buf_len = (t_epochs + 4) * n0 + 8192
    bre = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)

    results = {}
    for layout in ("windows", "seg"):
        ft = fr.FusedTracker(params, cfg, spec, fs, codes_s,
                             t_epochs, buf_len, layout=layout)
        c = channels
        mat = np.zeros((c, fused.N_FIELDS), np.float32)
        mat[:, 0] = 1000.0
        mat[:, 3] = spec.code_rate_hz
        mat[:, 7] = 1.0
        offset0 = np.full(c, n0, np.int64)
        if layout == "seg":
            a_c = ((offset0 - ft.el_pad) // 128) * 128
            mat[:, 9] = (offset0 - a_c).astype(np.float32)
            mat[:, 12] = a_c.astype(np.float32)
        else:
            mat[:, 12] = offset0.astype(np.float32)
        mat[:, 13] = 0.0
        mat_j = jnp.asarray(mat)

        telem, st = ft._step(bre, bim, codes_rows, mat_j)
        jax.block_until_ready((telem, st))
        # chain: carry state but force fresh constant cols 9/12/13
        fix = jnp.asarray(mat[:, 8:14])

        t0 = time.perf_counter()
        st = mat_j
        for _ in range(blocks):
            st = jnp.concatenate(
                [st[:, :8], fix, st[:, 14:]], axis=1)
            telem, st = ft._step(bre, bim, codes_rows, st)
        jax.block_until_ready((telem, st))
        dt = time.perf_counter() - t0
        results[layout] = dt / (blocks * t_epochs / 1000.0)
    return n0, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--block-ms", type=int, default=500)
    ap.add_argument("--channels", type=int, default=32)
    args = ap.parse_args()

    print(f"{'fs':>10} {'n0':>6} {'layout':<9} {'s/signal-s':>12} "
          f"{'rtf':>8}")
    for fs in (2_046_000.0, 2_048_000.0):
        n0, res = run_point(fs, args.channels, args.block_ms,
                            args.blocks)
        for layout, v in res.items():
            print(f"{fs:>10.0f} {n0:>6} {layout:<9} {v:>12.6f} "
                  f"{1.0 / v:>8.1f}")


if __name__ == "__main__":
    main()
