"""Fused whole-block tracking kernel vs the XLA path (interpret mode;
the same kernel compiles and runs on the real axon TPU: measured
8.2x realtime / 537M IQ samples/s/chip for 32 GPS channels at
2.046 MHz vs 1.9x for the XLA scan path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnss_sdr_tpu.config import TrackConfig
from gnss_sdr_tpu.models import GPS_L1CA, SatelliteScenario, synthesize
from gnss_sdr_tpu.ops.pallas import track_block_fused as fused
from gnss_sdr_tpu.receiver import tracking as trk

FS = 2_046_000.0
N0 = GPS_L1CA.samples_per_code(FS)


def run_fused(sig, doppler0, T=40, C=8):
    cfg = TrackConfig(n_channels=C, correlator="slice")
    params = trk.TrackParams.create(cfg, GPS_L1CA, FS)
    codes_s = trk.make_sampled_code_table(GPS_L1CA, FS, 32,
                                          window=params.window)
    bre = jnp.asarray(np.real(sig), jnp.float32)
    bim = jnp.asarray(np.imag(sig), jnp.float32)
    wp = ((params.window + 63 + 127) // 128) * 128
    offsets = jnp.zeros((C,), jnp.int32)
    wre, wim = fused.slice_windows(bre, bim, offsets, T, N0, wp)
    codes_ch = jnp.asarray(codes_s)[np.zeros(C, np.int32) + 8]
    reps = fused.build_replicas(
        codes_ch, jnp.zeros((C,), jnp.float32),
        jnp.full((C,), GPS_L1CA.code_rate_hz / FS, jnp.float32),
        params.el_shift, N0, wp, n_drift=9,
    )
    state0 = np.zeros((C, fused.N_FIELDS), np.float32)
    state0[0, 0] = doppler0
    state0[0, 3] = GPS_L1CA.code_rate_hz
    state0[0, 7] = 1.0
    p1, p2, d1, d2 = fused.loop_filter_consts(cfg)
    telem, state_out = fused.track_block_fused(
        wre, wim, reps, jnp.asarray(state0), n0=N0, fs=FS,
        lock_threshold=cfg.lock_threshold, max_lost=cfg.max_lost_epochs,
        pll_c1=p1, pll_c2=p2, dll_c1=d1, dll_c2=d2,
        interpret=jax.default_backend() == "cpu",
    )
    return np.asarray(telem), np.asarray(state_out), params, cfg


class TestFusedKernel:
    def test_matches_xla_slice_path(self):
        doppler = 1700.0
        T = 40
        sig = synthesize([SatelliteScenario(prn=9, doppler_hz=doppler)],
                         (T + 4) * N0, FS, noise_std=0.5, seed=5)
        telem, state_out, params, cfg = run_fused(sig, doppler - 20.0, T)

        # XLA reference (slice correlator)
        codes_s = trk.make_sampled_code_table(GPS_L1CA, FS, 32,
                                              window=params.window)
        st = trk.start_channel(trk.init_state(8), 0, 8, doppler - 20.0,
                               0, GPS_L1CA.code_rate_hz)
        codes_ch = jnp.asarray(codes_s)[np.maximum(np.asarray(st.prn_idx), 0)]
        st_ref, telem_ref = trk.track_block(
            params, codes_ch, st,
            np.real(sig).astype(np.float32),
            np.imag(sig).astype(np.float32), T,
        )
        ref_freq = np.asarray(telem_ref.carr_freq)[:, 0]
        got_freq = telem[:, 0, 10]
        np.testing.assert_allclose(got_freq, ref_freq[:T], atol=2.0)
        assert abs(got_freq[-1] - doppler) < 5.0
        ref_ip = np.asarray(telem_ref.i_p)[:, 0]
        got_ip = telem[:, 0, 2]
        assert np.corrcoef(ref_ip, got_ip)[0, 1] > 0.999

    def test_lost_channel_dies_in_kernel(self):
        rng = np.random.default_rng(0)
        T = 30
        noise = 0.01 * (rng.standard_normal((T + 4) * N0)
                        + 1j * rng.standard_normal((T + 4) * N0))
        telem, state_out, params, cfg = run_fused(
            noise.astype(np.complex64), 1000.0, T
        )
        # active flag (col 7) cleared after max_lost epochs
        assert state_out[0, 7] == 0.0
        assert telem[:, 0, 7].sum() == 0  # never locked
