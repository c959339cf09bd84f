"""Separate per-dispatch tunnel overhead from true device compute.

Times the SAME seg-layout fused block step two ways:
  pyloop — N Python-level dispatches (bench.py's track methodology)
  scan   — ONE dispatch: lax.scan over N blocks inside a single jit
Plus a no-op dispatch loop to measure the raw per-dispatch cost.

    python tools/dispatch_probe.py [--blocks 8]
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
    ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, T, buf_len,
                         layout="seg")

    rng = np.random.default_rng(0)
    bre = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    offset0 = np.full(C, n0, np.int64)
    a_c = ((offset0 - ft.el_pad) // 128) * 128
    mat = np.zeros((C, fused.N_FIELDS), np.float32)
    mat[:, 0] = 1000.0
    mat[:, 3] = spec.code_rate_hz
    mat[:, 7] = 1.0
    mat[:, 9] = (offset0 - a_c).astype(np.float32)
    mat[:, 12] = a_c.astype(np.float32)
    mat_j = jnp.asarray(mat)
    fix = jnp.asarray(mat[:, 8:14])

    @jax.jit
    def one(st):
        telem, so = ft._step(bre, bim, codes_rows, st)
        so = jnp.concatenate([so[:, :8], fix, so[:, 14:]], axis=1)
        return so + 1e-20 * telem[0, 0, 0]

    @jax.jit
    def chained(st):
        def body(s, _):
            return one(s), None
        out, _ = jax.lax.scan(body, st, None, length=N)
        return out

    @jax.jit
    def noop(st):
        return st * jnp.float32(1.0000001)

    results = {}
    # pyloop
    st = one(mat_j)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    st = mat_j
    for _ in range(N):
        st = one(st)
    jax.block_until_ready(st)
    results["pyloop"] = time.perf_counter() - t0
    # scan
    st = chained(mat_j)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    st = chained(mat_j)
    jax.block_until_ready(st)
    results["scan"] = time.perf_counter() - t0
    # noop dispatches
    st = noop(mat_j)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    st = mat_j
    for _ in range(N):
        st = noop(st)
    jax.block_until_ready(st)
    results["noop-pyloop"] = time.perf_counter() - t0

    sig = N * T / 1000.0
    print(f"fs={fs:.0f} n0={n0} blocks={N}")
    for k, v in results.items():
        print(f"{k:<12} total={v:.4f}s  per-block={v / N * 1e3:.2f}ms  "
              f"s/signal-s={v / sig:.6f}  rtf={sig / v:.1f}")


if __name__ == "__main__":
    main()
