"""Where do the mxu layout's ms/signal-s go? (round-4 perf pass)

Chains on the real chip, all timed with device_get fences and fresh
inputs per pass (tunnel memoization + early-ack, tools/mxu_verify.py):

  kernel/full      track_block_fused_mxu alone, prebuilt replica bank
  kernel/notelem   ... minus the 17-column telemetry scatter
  kernel/nosmall   ... stages 1+2 only (mix + MXU contraction)
  step (w/ reps)   _fused_block_step_mxu (adds build_replicas)

Compare against the run_blocks scan slope (bench.py) to get the
scan-glue share (re-anchor/absorb XLA between kernel launches).
"""
import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gnss_jax_cache_" + jax.default_backend())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gnss_sdr_tpu.config import TrackConfig           # noqa: E402
from gnss_sdr_tpu.models import GPS_L1CA              # noqa: E402
from gnss_sdr_tpu.ops.pallas import track_block_fused as fused  # noqa: E402
from gnss_sdr_tpu.receiver import fused_runner as fr  # noqa: E402
from gnss_sdr_tpu.receiver import tracking as trk     # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--t-epochs", type=int, default=500)
    # chains must run LONG past the tunnel's ~30-60 ms sync quantum or
    # the slope is noise (device time at ~4 ms/signal-s is only ~2 ms
    # per 500 ms block)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--only", type=str, default="",
                    help="comma list of chain names to run (substring "
                    "match); empty = all")
    args = ap.parse_args()

    spec = GPS_L1CA
    fs = 2_046_000.0
    c = args.channels
    t_epochs = args.t_epochs
    n0 = spec.samples_per_code(fs)
    cfg = TrackConfig(n_channels=c, correlator="fused")
    params = trk.TrackParams.create(cfg, spec, fs)
    codes_s = np.asarray(trk.make_sampled_code_table(
        spec, fs, 32, window=params.window))
    codes_rows = jnp.asarray(np.stack([codes_s[i % 32] for i in range(c)]))
    ft = fr.FusedTracker(params, cfg, spec, fs, codes_s, t_epochs,
                         8 * n0 + 8192 + t_epochs * n0, layout="mxu")
    print(f"k={ft.k_epochs} rows={ft.n_rows} wp={ft.wp} "
          f"el_pad={ft.el_pad}")
    rng = np.random.default_rng(0)
    n_rot = 8
    buf_len = 8 * n0 + 8192 + t_epochs * n0 + (n_rot - 1) * 1024
    bre = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)
    bim = jnp.asarray(rng.standard_normal(buf_len), jnp.float32)

    offset0 = np.full(c, n0, np.int64)
    a_c = ((offset0 - ft.el_pad) // 128) * 128
    mat = np.zeros((c, fused.N_FIELDS), np.float32)
    mat[:, 0] = 1000.0
    mat[:, 3] = spec.code_rate_hz
    mat[:, 7] = 1.0
    mat[:, 9] = (offset0 - a_c).astype(np.float32)
    mat = jnp.asarray(mat)
    starts0 = jnp.asarray(a_c.astype(np.int32))
    anchor = jnp.zeros(c, jnp.int32)
    rem_c0 = (mat[:, 9] - jnp.float32(ft.el_pad)).astype(jnp.int32)
    reps = fused.build_replicas(
        codes_rows, None, None, params.el_shift, n0, ft.wp,
        n_drift=ft.n_rows, anchor=anchor, lane_shift=rem_c0
    ).astype(jnp.bfloat16)
    p1, p2, d1, d2 = fused.loop_filter_consts(cfg)

    def kernel_chain(n, ablate, telem_mode="full", spread_cap=0):
        @jax.jit
        def f(st, b0):
            def body(carry, b):
                s = carry
                starts = starts0 + ((b0 + b) % n_rot) * 1024
                if spread_cap:
                    base = jnp.maximum(jnp.max(starts) - spread_cap, 0)
                    starts = jnp.concatenate(
                        [starts, base[None]]).astype(jnp.int32)
                telem, so = fused.track_block_fused_mxu(
                    bre, bim, starts, reps, s,
                    t_epochs=t_epochs, k_epochs=ft.k_epochs, n0=n0,
                    wp=ft.wp, fs=fs, code_len=1023.0,
                    lock_threshold=cfg.lock_threshold,
                    max_lost=cfg.max_lost_epochs,
                    pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
                    el_shift=params.el_shift, ablate=ablate,
                    telem_mode=telem_mode, spread_cap=spread_cap)
                so = jnp.concatenate(
                    [so[:, :1] * 0 + mat[:, :1], so[:, 1:]], axis=1)
                return mat + 1e-20 * so, telem[0, 0, 0]
            out, ys = jax.lax.scan(body, st,
                                   jnp.arange(n, dtype=jnp.int32))
            return out, ys
        return f

    def step_chain(n):
        @jax.jit
        def f(st, b0):
            def body(carry, b):
                starts = starts0 + ((b0 + b) % n_rot) * 1024
                telem, so = ft._step(bre, bim, codes_rows, carry,
                                     starts)
                return mat + 1e-20 * so, telem[0, 0, 0]
            out, ys = jax.lax.scan(body, st,
                                   jnp.arange(n, dtype=jnp.int32))
            return out, ys
        return f

    n1, n2 = max(2, args.blocks // 8), args.blocks
    sig_s = t_epochs / 1000.0

    def measure(name, mk):
        if args.only and not any(
                tok in name for tok in args.only.split(",")):
            return None
        f1, f2 = mk(n1), mk(n2)
        jax.device_get(f1(mat, jnp.int32(0))[1])
        jax.device_get(f2(mat, jnp.int32(0))[1])
        slopes = []
        for i in (1, 2):
            t0 = time.perf_counter()
            jax.device_get(f1(mat, jnp.int32(i))[1])
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.device_get(f2(mat, jnp.int32(i))[1])
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (n2 - n1))
        per_ss = min(slopes) / sig_s
        print(f"{name:18s} {per_ss*1e3:7.3f} ms/signal-s "
              f"({1.0/per_ss:6.0f}x) agree="
              f"{min(slopes)/max(slopes):.2f}")
        return per_ss

    measure("kernel/dmaonly", lambda n: kernel_chain(n, "dmaonly"))
    measure("kernel/nomix+ns", lambda n: kernel_chain(n,
                                                      "nomix,nosmall"))
    measure("kernel/nosmall", lambda n: kernel_chain(n, "nosmall"))
    measure("kernel/stopsel", lambda n: kernel_chain(n, "stopsel"))
    measure("kernel/stop3", lambda n: kernel_chain(n, "stop3"))
    measure("kernel/noroll", lambda n: kernel_chain(n, "noroll",
                                                    telem_mode="lean"))
    measure("kernel/notelem", lambda n: kernel_chain(n, "notelem"))
    measure("kernel/lean", lambda n: kernel_chain(n, "",
                                                  telem_mode="lean"))
    measure("kernel/lean-sh", lambda n: kernel_chain(
        n, "", telem_mode="lean", spread_cap=ft.spread_cap))
    measure("kernel/dma-sh", lambda n: kernel_chain(
        n, "dmaonly", spread_cap=ft.spread_cap))
    measure("kernel/full", lambda n: kernel_chain(n, ""))
    measure("step(+reps)", step_chain)


if __name__ == "__main__":
    main()
