"""End-to-end receiver tests: cold start -> acquire -> track -> hold lock.

The system-level gate mirroring the reference's real-capture integration
tests (reference: src/acquisition/do_acquisition.rs:398-466 acquisition
truth-set; src/tracking/do_tracking.rs:657-751 acq->track 100-epoch lock
hold), run against the synthetic oracle with known truth.
"""
import numpy as np
import pytest

from gnss_sdr_tpu.config import AcqConfig, ReceiverConfig, RfConfig, SdrConfig, TrackConfig
from gnss_sdr_tpu.models import SatelliteScenario
from gnss_sdr_tpu.receiver import ArraySource, Receiver, SyntheticSource
from gnss_sdr_tpu.models import synthesize

FS = 4_096_000.0

TRUTH = [
    # (prn, doppler_hz, code_phase_chips, amplitude)
    (3, -2800.0, 101.5, 0.30),
    (14, 1200.0, 512.0, 0.25),
    (21, 4500.0, 900.25, 0.28),
    (30, -500.0, 33.0, 0.22),
]


def make_cfg(block_ms=20, n_channels=8):
    return ReceiverConfig(
        rf=RfConfig(freq_if_hz=0.0, output_sample_rate_hz=FS),
        acq=AcqConfig(non_coherent_ms=10),
        track=TrackConfig(n_channels=n_channels),
        block_ms=block_ms,
    )


@pytest.fixture(scope="module")
def tracked_receiver():
    sats = [
        SatelliteScenario(prn=p, doppler_hz=d, code_phase_chips=c, amplitude=a)
        for p, d, c, a in TRUTH
    ]
    source = SyntheticSource(sats, FS, noise_std=1.0, seed=7)
    rx = Receiver(make_cfg(), source)
    rx.run(max_blocks=25)  # 500 ms
    return rx


class TestEndToEnd:
    def test_acquires_exactly_truth_set(self, tracked_receiver):
        rx = tracked_receiver
        truth_prns = {p for p, *_ in TRUTH}
        assert set(rx.active) == truth_prns

    def test_holds_lock_100_epochs(self, tracked_receiver):
        # the reference's 100-epoch lock-hold gate (do_tracking.rs:725-746)
        rx = tracked_receiver
        for trace in rx.telemetry.all_traces():
            assert len(trace.i_p) >= 100, f"PRN {trace.prn} too few epochs"
            power = np.asarray(trace.i_p) ** 2 + np.asarray(trace.q_p) ** 2
            assert (power[-100:] > rx.cfg.track.lock_threshold).all(), (
                f"PRN {trace.prn} lost lock"
            )

    def test_doppler_converged_to_truth(self, tracked_receiver):
        rx = tracked_receiver
        truth = {p: d for p, d, *_ in TRUTH}
        for trace in rx.telemetry.all_traces():
            settled = float(np.mean(np.asarray(trace.carr_freq)[-50:]))
            assert settled == pytest.approx(
                truth[trace.prn], abs=5.0
            ), f"PRN {trace.prn} doppler wrong"

    def test_code_rate_near_nominal(self, tracked_receiver):
        # zero code-Doppler scene: code rate must stay near 1.023 MHz
        rx = tracked_receiver
        for trace in rx.telemetry.all_traces():
            assert trace.code_rate[-1] == pytest.approx(1.023e6, abs=5.0)

    def test_cn0_estimates_reasonable(self, tracked_receiver):
        rx = tracked_receiver
        for summary in rx.summary()["channels"]:
            assert summary["cn0_dbhz"] is not None
            assert 35.0 < summary["cn0_dbhz"] < 65.0

    def test_telemetry_sample_indices_monotonic(self, tracked_receiver):
        rx = tracked_receiver
        for trace in rx.telemetry.all_traces():
            gs = np.asarray(trace.global_sample)
            d = np.diff(gs)
            assert (d > 0).all()
            # epoch spacing ~ samples per code
            assert np.abs(d - 4096).max() <= 8


class TestLifecycleEndToEnd:
    def test_signal_dropout_frees_channel_and_reacquires(self):
        # NOTE: the reference's absolute lock threshold (prompt power >
        # 15, do_tracking.rs:16) is input-scale dependent: broadband noise
        # at sigma=1 integrates to prompt power >> 15, so a dropout is
        # only declared "lost" when the noise floor is small too. The
        # quiet gap below models a true signal blackout.
        sats = [SatelliteScenario(prn=9, doppler_hz=1000.0, amplitude=0.3)]
        n_on = int(0.3 * FS)  # 300 ms on
        on = synthesize(sats, n_on, FS, noise_std=1.0, seed=1)
        off = synthesize([], int(0.2 * FS), FS, noise_std=0.005, seed=2)
        on2 = synthesize(sats, n_on, FS, noise_std=1.0, seed=3, start_sample=n_on)
        stream = np.concatenate([on, off, on2])
        rx = Receiver(make_cfg(), ArraySource(stream, FS))
        rx.run()

        # reacquired at the end
        assert set(rx.active) == {9}
        traces = [t for t in rx.telemetry.all_traces() if t.prn == 9]
        # channel was lost and restarted: two traces for PRN 9
        assert len(traces) == 2

    def test_eos_terminates(self):
        rx = Receiver(
            make_cfg(), ArraySource(np.zeros(int(0.05 * FS), np.complex64), FS)
        )
        out = rx.run()
        # 50 ms at 20 ms blocks: 2 full + 1 zero-padded partial
        assert out["blocks"] == 3


class TestFrontEndIntegration:
    def test_if_capture_mix_decimate_track(self):
        """Bundled-capture-grade config: int8 real samples at 16.368 MHz
        with a 4.092 MHz IF, front end mixes to baseband and decimates
        4x, receiver tracks at 4.092 MHz (exceeds the reference: its
        resampler was never implemented, frontend.rs:64-66)."""
        from gnss_sdr_tpu.models import synthesize_real_if_int8

        fs_in, f_if, m = 16_368_000.0, 4_092_000.0, 4
        truth_doppler = -1800.0
        sats = [SatelliteScenario(prn=23, doppler_hz=truth_doppler,
                                  code_phase_chips=250.0, amplitude=0.22)]
        raw = synthesize_real_if_int8(
            sats, int(0.35 * fs_in), fs_in, f_if, noise_std=1.0, scale=25.0
        )
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "cap.bin")
            open(path, "wb").write(raw.tobytes())
            from gnss_sdr_tpu.receiver import FileSource

            cfg = ReceiverConfig(
                rf=RfConfig(
                    freq_if_hz=f_if,
                    output_sample_rate_hz=fs_in / m,
                    enable_dc_removal=True,
                    enable_mixing=True,
                    decimation=m,
                ),
                track=TrackConfig(n_channels=4),
                block_ms=20,
            )
            rx = Receiver(cfg, FileSource(path, fs_in, "int8_real"))
            out = rx.run()
        assert rx.fs == fs_in / m
        assert out["tracked_prns"] == [23]
        ch = out["channels"][0]
        assert ch["locked_fraction"] > 0.95
        # after mixing, carrier freq is pure doppler; compare the settled
        # loop average (the instantaneous value jitters ~2-3 Hz)
        trace = [t for t in rx.telemetry.all_traces() if t.prn == 23][0]
        settled = np.mean(np.asarray(trace.carr_freq)[-50:])
        assert settled == pytest.approx(truth_doppler, abs=4.0)


class TestDeviceStreamWindow:
    """DeviceStreamWindow (accelerator backends) must behave exactly
    like the host StreamWindow; exercised here on the CPU backend."""

    def test_parity_with_host_window(self):
        from gnss_sdr_tpu.receiver.stream import (DeviceStreamWindow,
                                                  StreamWindow)

        rng = np.random.default_rng(5)
        h, b = 64, 256
        host = StreamWindow(h, b)
        dev = DeviceStreamWindow(h, b)
        for k in range(4):
            fre = rng.standard_normal(b).astype(np.float32)
            fim = rng.standard_normal(b).astype(np.float32)
            assert host.advance((fre, fim)) == dev.advance((fre, fim))
        # short tail block (zero-padded)
        fre = rng.standard_normal(100).astype(np.float32)
        fim = rng.standard_normal(100).astype(np.float32)
        assert host.advance((fre, fim)) == dev.advance((fre, fim)) == 100
        np.testing.assert_array_equal(host.re, np.asarray(dev.re))
        np.testing.assert_array_equal(host.im, np.asarray(dev.im))
        assert host.global_start == dev.global_start
        assert host.blocks_fed == dev.blocks_fed
        # complex view + load round-trip
        np.testing.assert_array_equal(host.buf, dev.buf)
        dev2 = DeviceStreamWindow(h, b)
        dev2.load(np.asarray(dev.re), np.asarray(dev.im))
        np.testing.assert_array_equal(np.asarray(dev2.re),
                                      np.asarray(dev.re))

    def test_end_of_stream(self):
        from gnss_sdr_tpu.receiver.stream import DeviceStreamWindow

        dev = DeviceStreamWindow(8, 16)
        assert dev.advance(None) is None
        assert dev.advance(np.zeros(0, np.complex64)) is None
