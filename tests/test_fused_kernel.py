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
    offsets = jnp.full((C,), N0, jnp.int32)   # >= el_pad from the start
    el_pad = params.el_shift + 4              # n_drift=9 -> half=4
    wre, wim = fused.slice_windows(bre, bim, offsets, T, N0, wp, el_pad)
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
                               N0, GPS_L1CA.code_rate_hz)
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
        # 0.95, not 0.999: this scene's code phase (0) sits exactly on
        # the floor-anchor discontinuity, so both paths chatter the
        # replica by one sample on sub-LSB ledger noise — at
        # noise-path-dependent epochs. The chatter is between adjacent
        # equivalence classes at the boundary (power unaffected; the
        # freq-trajectory and convergence asserts above stay tight)
        assert np.corrcoef(ref_ip[:T], got_ip)[0, 1] > 0.95

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


class TestSharedStreamPath:
    def test_matches_streamed_windows(self):
        """The shared-stream resident kernel (one IQ copy for all
        channels, in-kernel window slicing, requires n0 % 128 == 0)
        must agree with the streamed-window kernel on every telemetry
        and state column."""
        import jax.numpy as jnp

        FS2, N02 = 2_048_000.0, 2048
        WP2 = ((N02 + 63 + 127) // 128) * 128
        C, T, ND = 4, 24, 5
        rng = np.random.default_rng(3)
        L = (T + 2) * N02 + 2 * N02
        bre = jnp.asarray(rng.standard_normal(L), jnp.float32)
        bim = jnp.asarray(rng.standard_normal(L), jnp.float32)
        offsets = jnp.asarray(rng.integers(8, N02, C), jnp.int32)
        code1 = np.sign(rng.standard_normal((C, N02)))
        codes3x = jnp.asarray(np.tile(code1, (1, 4))[:, :2 * N02 + WP2 + 4],
                              jnp.float32)
        cp = jnp.asarray(rng.uniform(0, 1023, C), jnp.float32)
        cps = jnp.full((C,), 1.023e6 / FS2, jnp.float32)
        st = np.zeros((C, 128), np.float32)
        st[:, 0] = rng.uniform(500, 1500, C)
        st[:, 3] = 1.023e6
        st[:, 7] = 1.0

        kw = dict(n0=N02, fs=FS2, pll_c1=0.01, pll_c2=0.005,
                  dll_c1=0.001, dll_c2=0.0005, interpret=True)
        el_pad = 1 + (ND - 1) // 2
        wre, wim = fused.slice_windows(bre, bim, offsets, T, N02, WP2,
                                       el_pad)
        reps = fused.build_replicas(codes3x, cp, cps, 1, N02, WP2,
                                    n_drift=ND)
        t1, s1 = fused.track_block_fused(wre, wim, reps,
                                         jnp.asarray(st), **kw)

        wpp = ((2 * N02 + 128 + 127) // 128) * 128
        codes4x = jnp.asarray(
            np.tile(code1, (1, 6))[:, :3 * N02 + wpp + 8], jnp.float32)
        reps_sh = fused.build_replicas_shared(codes4x, cp, cps, offsets,
                                              1, N02, wpp, n_drift=ND)
        st_sh = st.copy()
        st_sh[:, 9] = np.asarray(offsets)
        t2, s2 = fused.track_block_fused_resident(
            bre, bim, reps_sh, jnp.asarray(st_sh), t_epochs=T,
            k_epochs=8, wp=wpp, **kw)

        t1n, t2n = np.asarray(t1), np.asarray(t2)
        scale = max(1.0, np.abs(t1n[..., :7]).max())
        assert np.abs(t1n[..., :7] - t2n[..., :7]).max() / scale < 1e-4
        assert np.abs(t1n[..., 10] - t2n[..., 10]).max() < 0.05
        assert np.abs(np.asarray(s1)[:, :9]
                      - np.asarray(s2)[:, :9]).max() < 0.1

    def test_layout_parity_windows_seg_direct(self):
        """The three FusedTracker window feeds ('windows' XLA slices,
        'seg' gathered segments, 'direct' in-kernel per-channel DMA)
        must produce identical telemetry and state through the FULL
        runner path (re-anchor + kernel + absorb) for unaligned
        offsets (offset % 128 != 0 AND n0 % 128 != 0) — the rem_c0 /
        rem_e / rem_j lane bookkeeping is exactly where an off-by-one
        would hide."""
        from gnss_sdr_tpu.receiver import fused_runner as fr

        C, T = 4, 40
        cfg = TrackConfig(n_channels=C, correlator="fused")
        params = trk.TrackParams.create(cfg, GPS_L1CA, FS)
        codes_s = trk.make_sampled_code_table(GPS_L1CA, FS, 32,
                                              window=params.window)
        codes_rows = jnp.asarray(np.asarray(codes_s)[
            np.arange(C) % 32])
        rng = np.random.default_rng(11)
        buf_len = (T + 4) * N0 + 8192
        sig = synthesize(
            [SatelliteScenario(prn=p + 1, doppler_hz=900.0 + 130.0 * p)
             for p in range(C)],
            buf_len, FS, noise_std=0.3, seed=2)
        bre = jnp.asarray(np.real(sig), jnp.float32)
        bim = jnp.asarray(np.imag(sig), jnp.float32)

        def mk_state():
            st = trk.init_state(C)
            for ch in range(C):
                # offsets deliberately NOT 128-aligned
                st = trk.start_channel(
                    st, ch, ch % 32, 900.0 + 130.0 * ch,
                    N0 + 37 + 101 * ch, GPS_L1CA.code_rate_hz)
            return st

        results = {}
        for layout in ("windows", "seg", "direct"):
            ft = fr.FusedTracker(params, cfg, GPS_L1CA, FS, codes_s,
                                 T, buf_len, layout=layout)
            assert ft.layout == layout
            st, telem = ft.run_block(mk_state(), bre, bim, codes_rows)
            results[layout] = (st, telem)

        ref_st, ref_t = results["windows"]
        for layout in ("seg", "direct"):
            st, t = results[layout]
            for f in ("i_e", "q_e", "i_p", "q_p", "i_l", "q_l",
                      "power", "pll_err", "dll_err", "carr_freq",
                      "code_rate", "chip_phase"):
                a, b = getattr(ref_t, f), getattr(t, f)
                np.testing.assert_allclose(
                    b, a, rtol=2e-5, atol=2e-4 * max(
                        1.0, np.abs(a).max()),
                    err_msg=f"{layout}: telemetry field {f}")
            assert np.array_equal(ref_t.processed, t.processed)
            assert np.array_equal(ref_t.start_offset, t.start_offset)
            for f in ("offset", "epochs", "chip_int", "active"):
                np.testing.assert_array_equal(
                    getattr(ref_st, f), getattr(st, f),
                    err_msg=f"{layout}: state field {f}")
            np.testing.assert_allclose(
                st.carr_freq, ref_st.carr_freq, rtol=1e-5,
                err_msg=f"{layout}: state carr_freq")

    def test_unaligned_n0_matches_streamed_windows(self):
        """The resident kernel generalized to n0 % 128 != 0 (aligned-
        floor slice + remainder lane shift + dynamic replica roll) must
        agree with the streamed-window kernel at the 2.046 MHz headline
        operating point (n0 = 2046)."""
        import jax.numpy as jnp

        FS2, N02 = 2_046_000.0, 2046
        WP2 = ((N02 + 63 + 127) // 128) * 128
        C, T, ND = 4, 24, 5
        rng = np.random.default_rng(7)
        L = (T + 2) * N02 + 2 * N02 + 256
        bre = jnp.asarray(rng.standard_normal(L), jnp.float32)
        bim = jnp.asarray(rng.standard_normal(L), jnp.float32)
        offsets = jnp.asarray(rng.integers(8, N02, C), jnp.int32)
        code1 = np.sign(rng.standard_normal((C, N02)))
        codes3x = jnp.asarray(np.tile(code1, (1, 4))[:, :2 * N02 + WP2 + 4],
                              jnp.float32)
        cp = jnp.asarray(rng.uniform(0, 1023, C), jnp.float32)
        cps = jnp.full((C,), 1.023e6 / FS2, jnp.float32)
        st = np.zeros((C, 128), np.float32)
        st[:, 0] = rng.uniform(500, 1500, C)
        st[:, 3] = 1.023e6
        st[:, 7] = 1.0

        kw = dict(n0=N02, fs=FS2, pll_c1=0.01, pll_c2=0.005,
                  dll_c1=0.001, dll_c2=0.0005, interpret=True)
        el_pad = 1 + (ND - 1) // 2
        wre, wim = fused.slice_windows(bre, bim, offsets, T, N02, WP2,
                                       el_pad)
        reps = fused.build_replicas(codes3x, cp, cps, 1, N02, WP2,
                                    n_drift=ND)
        t1, s1 = fused.track_block_fused(wre, wim, reps,
                                         jnp.asarray(st), **kw)

        # +128 margin: the unaligned slice starts up to 127 lanes early
        wpp = ((2 * N02 + 256 + 127) // 128) * 128
        codes4x = jnp.asarray(
            np.tile(code1, (1, 6))[:, :3 * N02 + wpp + 8], jnp.float32)
        reps_sh = fused.build_replicas_shared(codes4x, cp, cps, offsets,
                                              1, N02, wpp, n_drift=ND)
        st_sh = st.copy()
        st_sh[:, 9] = np.asarray(offsets)
        t2, s2 = fused.track_block_fused_resident(
            bre, bim, reps_sh, jnp.asarray(st_sh), t_epochs=T,
            k_epochs=8, wp=wpp, **kw)

        t1n, t2n = np.asarray(t1), np.asarray(t2)
        scale = max(1.0, np.abs(t1n[..., :7]).max())
        assert np.abs(t1n[..., :7] - t2n[..., :7]).max() / scale < 1e-4
        assert np.abs(t1n[..., 10] - t2n[..., 10]).max() < 0.05
        assert np.abs(np.asarray(s1)[:, :9]
                      - np.asarray(s2)[:, :9]).max() < 0.1
