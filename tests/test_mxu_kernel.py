"""MXU fused-tracking layout (track_block_fused_mxu) vs the per-epoch
direct layout.

The mxu layout holds NCO rates for K-epoch supersteps so the E/P/L
correlation batches into ONE block-diagonal bf16 MXU contraction
(ops/pallas/track_block_fused.py::_mxu_run_k). Contract:

  * same state columns / telemetry format / runner bookkeeping as the
    direct layout (drop-in via TrackConfig.fused_layout);
  * epoch 0 of a block sees the exact block-start state, so its
    correlations must match the direct layout to bf16 rounding;
  * later epochs legitimately diverge (held rates + bf16), but
    TRACKING must be equivalent: lock held, Doppler converges to
    truth, ledger bookkeeping exact;
  * run_blocks (the in-graph multi-block scan) composes with the mxu
    step exactly as with direct.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gnss_sdr_tpu.config import TrackConfig
from gnss_sdr_tpu.models import GPS_L1CA, SatelliteScenario, synthesize
from gnss_sdr_tpu.receiver import fused_runner as fr
from gnss_sdr_tpu.receiver import tracking as trk

FS = 2_046_000.0
N0 = GPS_L1CA.samples_per_code(FS)
C = 2
DOPPLERS = [800.0, 950.0]


def _scene(total, noise=0.2, seed=4):
    sig = synthesize(
        [SatelliteScenario(prn=p + 1, doppler_hz=DOPPLERS[p],
                           amplitude=0.5)
         for p in range(C)],
        total, FS, noise_std=noise, seed=seed)
    return (jnp.asarray(np.real(sig).astype(np.float32)),
            jnp.asarray(np.imag(sig).astype(np.float32)))


def _aligned_state():
    """Channels started on the truth: code boundary at offset n0
    (scenario code_phase_chips=0 puts a boundary at sample n0), truth
    Doppler — tracking must HOLD, not pull in."""
    st = trk.init_state(C)
    for ch in range(C):
        st = trk.start_channel(st, ch, ch, DOPPLERS[ch], N0,
                               GPS_L1CA.code_rate_hz)
    return st


def _tracker(layout, T, history, block, **cfg_kw):
    cfg = TrackConfig(n_channels=C, correlator="fused", **cfg_kw)
    params = trk.TrackParams.create(cfg, GPS_L1CA, FS)
    codes_s = trk.make_sampled_code_table(GPS_L1CA, FS, 32,
                                          window=params.window)
    codes_rows = jnp.asarray(np.asarray(codes_s)[np.arange(C)])
    ft = fr.FusedTracker(params, cfg, GPS_L1CA, FS, codes_s, T,
                         history + block, layout=layout)
    return ft, codes_rows


def _run_layout(layout, T=20, B=4, **cfg_kw):
    block = T * N0
    history = 2 * N0 + 4096
    sre, sim = _scene(history + B * block)
    ft, codes_rows = _tracker(layout, T, history, block, **cfg_kw)
    st = _aligned_state()
    telems = []
    for b in range(B):
        w_re = sre[b * block: b * block + history + block]
        w_im = sim[b * block: b * block + history + block]
        st, tl = ft.run_block(st, w_re, w_im, codes_rows)
        telems.append(tl)
        st = trk.rebase(st, block)
    return st, telems


class TestMxuParity:
    def test_layout_resolves(self):
        ft, _ = _tracker("mxu", 20, 2 * N0 + 4096, 20 * N0)
        assert ft.layout == "mxu"
        assert ft.k_epochs == 5
        # n_drift 5 + 2 * el_shift 1 = 7, padded to the aligned 8
        assert ft.n_rows == 8
        assert ft.wp % 128 == 0

    def test_epoch0_correlations_match_direct(self):
        _, tl_d = _run_layout("direct", B=1)
        _, tl_m = _run_layout("mxu", B=1)
        for f in ("i_p", "q_p", "i_e", "q_e", "i_l", "q_l"):
            x = getattr(tl_d[0], f)[0]
            y = getattr(tl_m[0], f)[0]
            scale = max(1.0, float(np.abs(x).max()))
            assert np.abs(x - y).max() / scale < 2 ** -7, f

    def test_bookkeeping_matches_direct(self):
        st_d, tl_d = _run_layout("direct")
        st_m, tl_m = _run_layout("mxu")
        # sample-level bookkeeping is integer and rate walks are tiny:
        # offsets/epochs must agree exactly on a clean scene
        np.testing.assert_array_equal(st_d.offset, st_m.offset)
        np.testing.assert_array_equal(st_d.epochs, st_m.epochs)
        np.testing.assert_array_equal(st_d.active, st_m.active)
        for a, s in zip(tl_d, tl_m):
            np.testing.assert_array_equal(a.processed, s.processed)
            np.testing.assert_array_equal(a.start_offset,
                                          s.start_offset)


class TestMxuTracking:
    def test_holds_lock_and_truth_doppler(self):
        st, telems = _run_layout("mxu", T=20, B=6)
        for tl in telems[1:]:
            assert np.mean(tl.locked) > 0.95
        cf = np.asarray(st.carr_freq)
        for ch in range(C):
            assert abs(cf[ch] - DOPPLERS[ch]) < 15.0, ch
        # chip ledger glued to the scene: code rate stays near nominal
        cr = np.asarray(st.code_rate)
        assert np.all(np.abs(cr - GPS_L1CA.code_rate_hz) < 5.0)

    def test_direct_equivalent_quality(self):
        st_d, _ = _run_layout("direct", T=20, B=6)
        st_m, _ = _run_layout("mxu", T=20, B=6)
        cf_d = np.asarray(st_d.carr_freq)
        cf_m = np.asarray(st_m.carr_freq)
        # both settle on the truth; held-rate + bf16 jitter stays
        # within the loop's own noise floor
        assert np.abs(cf_d - cf_m).max() < 10.0

    def test_costas_mode(self):
        st, telems = _run_layout("mxu", T=20, B=4, lock_mode="costas")
        assert np.mean(telems[-1].locked) > 0.9

    def test_interp_mode(self):
        st, telems = _run_layout("mxu", T=20, B=4, interp_code=True)
        assert np.mean(telems[-1].locked) > 0.95
        cf = np.asarray(st.carr_freq)
        for ch in range(C):
            assert abs(cf[ch] - DOPPLERS[ch]) < 15.0

    def test_carrier_aiding(self):
        """Aided effective code rate flows through the held-rate
        superstep math (the TTFF/live configuration)."""
        st, telems = _run_layout("mxu", T=20, B=6, carrier_aiding=True)
        for tl in telems[1:]:
            assert np.mean(tl.locked) > 0.95
        cf = np.asarray(st.carr_freq)
        for ch in range(C):
            assert abs(cf[ch] - DOPPLERS[ch]) < 15.0, ch


class TestMxuScan:
    def test_run_blocks_matches_per_block(self):
        T, B = 20, 4
        block = T * N0
        history = 2 * N0 + 4096
        sre, sim = _scene(history + B * block)
        ft, codes_rows = _tracker("mxu", T, history, block)

        st_ref = _aligned_state()
        telems_ref = []
        for b in range(B):
            w_re = sre[b * block: b * block + history + block]
            w_im = sim[b * block: b * block + history + block]
            st_ref, tl = ft.run_block(st_ref, w_re, w_im, codes_rows)
            telems_ref.append(tl)
            st_ref = trk.rebase(st_ref, block)

        st_scan, telems_scan = ft.run_blocks(
            _aligned_state(), sre, sim, codes_rows, B)

        for b, (a, s) in enumerate(zip(telems_ref, telems_scan)):
            assert np.array_equal(a.processed, s.processed), b
            np.testing.assert_array_equal(a.start_offset,
                                          s.start_offset)
            for f in ("i_p", "q_p", "carr_freq"):
                x, y = getattr(a, f), getattr(s, f)
                scale = max(1.0, np.abs(x).max())
                assert np.abs(x - y).max() / scale < 2e-3, (b, f)
        np.testing.assert_array_equal(st_scan.offset, st_ref.offset)
        np.testing.assert_array_equal(st_scan.epochs, st_ref.epochs)
        np.testing.assert_allclose(st_scan.carr_freq, st_ref.carr_freq,
                                   rtol=1e-4)


class TestMxuReceiver:
    def test_full_receiver_tracks(self):
        from gnss_sdr_tpu import ReceiverConfig, RfConfig
        from gnss_sdr_tpu.config import AcqConfig
        from gnss_sdr_tpu.receiver import Receiver, SyntheticSource

        src = SyntheticSource(
            [SatelliteScenario(prn=5, doppler_hz=1210.0, amplitude=0.4),
             SatelliteScenario(prn=9, doppler_hz=-640.0, amplitude=0.4)],
            FS, noise_std=1.0, seed=11,
            total_samples=int(0.5 * FS))
        rx = Receiver(
            ReceiverConfig(
                rf=RfConfig(freq_if_hz=0.0, output_sample_rate_hz=FS),
                acq=AcqConfig(),
                track=TrackConfig(n_channels=4, correlator="fused",
                                  fused_layout="mxu"),
                block_ms=20,
            ),
            src,
        )
        s = rx.run()
        assert rx.fused.layout == "mxu"
        assert s["tracked_prns"] == [5, 9]
        by_prn = {c["prn"]: c for c in s["channels"]}
        assert abs(by_prn[5]["last_doppler_hz"] - 1210.0) < 40
        assert abs(by_prn[9]["last_doppler_hz"] + 640.0) < 40


class TestMxuChannelDeath:
    """Forced loss-of-lock through the closed-form lifecycle chain
    (_mxu_run_k's vector_chain): with an unreachable lock threshold
    every epoch is unlocked, the lost counter is the epoch index + 1,
    and the channel must die exactly when it crosses max_lost — same
    epoch, same flags, same final counters as the per-epoch direct
    layout (reference lifecycle: do_tracking.rs:197-208)."""

    def _run_dead(self, layout, wire="f32", max_lost=7):
        T, B = 20, 3
        block = T * N0
        history = 2 * N0 + 4096
        sre, sim = _scene(history + B * block)
        cfg = TrackConfig(n_channels=C, correlator="fused",
                          lock_threshold=1e12,
                          max_lost_epochs=max_lost)
        params = trk.TrackParams.create(cfg, GPS_L1CA, FS)
        codes_s = trk.make_sampled_code_table(GPS_L1CA, FS, 32,
                                              window=params.window)
        codes_rows = jnp.asarray(np.asarray(codes_s)[np.arange(C)])
        ft = fr.FusedTracker(params, cfg, GPS_L1CA, FS, codes_s, T,
                             history + block, layout=layout, wire=wire)
        st, telems = ft.run_blocks(_aligned_state(), sre, sim,
                                   codes_rows, B)
        return st, telems

    @pytest.mark.parametrize("max_lost", [3, 7, 12])
    def test_death_epoch_matches_direct(self, max_lost):
        st_d, tl_d = self._run_dead("direct", max_lost=max_lost)
        st_m, tl_m = self._run_dead("mxu", max_lost=max_lost)
        np.testing.assert_array_equal(st_d.active, st_m.active)
        np.testing.assert_array_equal(st_d.lost_count, st_m.lost_count)
        assert not np.any(st_m.active)          # everyone died
        for b, (a, s) in enumerate(zip(tl_d, tl_m)):
            np.testing.assert_array_equal(a.processed, s.processed)
            np.testing.assert_array_equal(a.lost_event, s.lost_event,
                                          err_msg=f"block {b}")
            np.testing.assert_array_equal(a.locked, s.locked)
        # exactly one lost_event per channel, at epoch max_lost - 1
        ev = np.concatenate([t.lost_event for t in tl_m], axis=0)
        assert ev.sum(axis=0).tolist() == [1] * C
        assert np.argmax(ev, axis=0).tolist() == [max_lost - 1] * C

    def test_slim2_wire_matches_f32_on_death(self):
        st_f, tl_f = self._run_dead("mxu", wire="f32")
        st_s, tl_s = self._run_dead("mxu", wire="slim2")
        np.testing.assert_array_equal(st_f.active, st_s.active)
        np.testing.assert_array_equal(st_f.lost_count, st_s.lost_count)
        for a, s in zip(tl_f, tl_s):
            np.testing.assert_array_equal(a.processed, s.processed)
            np.testing.assert_array_equal(a.lost_event, s.lost_event)
            np.testing.assert_array_equal(a.locked, s.locked)
            np.testing.assert_array_equal(a.start_offset,
                                          s.start_offset)


class TestSharedFetch:
    def test_shared_fetch_bit_identical(self):
        """The shared-fetch window feed (one HBM fetch per superstep +
        per-channel VMEM copies) moves the SAME bytes into the same
        slots as the per-channel DMA, so run_blocks outputs must be
        BIT-identical."""
        T, B = 20, 3
        block = T * N0
        history = 2 * N0 + 4096
        sre, sim = _scene(history + B * block)
        cfg = TrackConfig(n_channels=C, correlator="fused")
        params = trk.TrackParams.create(cfg, GPS_L1CA, FS)
        codes_s = trk.make_sampled_code_table(GPS_L1CA, FS, 32,
                                              window=params.window)
        codes_rows = jnp.asarray(np.asarray(codes_s)[np.arange(C)])

        def run(shared):
            ft = fr.FusedTracker(params, cfg, GPS_L1CA, FS, codes_s, T,
                                 history + block, layout="mxu",
                                 shared_fetch=shared)
            assert (ft.spread_cap > 0) == shared
            return ft.run_blocks(_aligned_state(), sre, sim,
                                 codes_rows, B)

        st_a, tl_a = run(False)
        st_b, tl_b = run(True)
        for f in st_a._fields:
            np.testing.assert_array_equal(getattr(st_a, f),
                                          getattr(st_b, f), err_msg=f)
        for a, b in zip(tl_a, tl_b):
            for f in ("i_p", "q_p", "i_e", "q_l", "carr_freq",
                      "chip_phase", "start_offset"):
                np.testing.assert_array_equal(getattr(a, f),
                                              getattr(b, f), err_msg=f)
