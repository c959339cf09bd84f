"""SDR device layer tests (reference: sdr_wrapper trait + MockDevice +
rtl_sdr JSON config, src/sdr_store/ + src/sdr_mock/)."""
import json

import numpy as np
import pytest

from gnss_sdr_tpu.io import MockDevice, open_device
from gnss_sdr_tpu.models import SatelliteScenario, synthesize


class TestMockDevice:
    def test_json_config(self):
        # the reference's RTL-SDR config keys (rtl_sdr.rs:31-120)
        dev = open_device("mock")
        dev.configure(json.dumps({
            "center_freq_hz": 1_575_420_000.0,
            "sample_rate_hz": 2_048_000.0,
            "bandwidth_hz": 2_048_000.0,
            "gain_db": 40.0,
            "enable_agc": True,
            "antenna": "RX",
        }))
        assert dev.center_frequency == 1_575_420_000.0
        assert dev.sample_rate == 2_048_000.0
        assert dev.gain == 40.0

    def test_unknown_config_key_rejected(self):
        dev = MockDevice()
        with pytest.raises(ValueError, match="center_frequency_hz"):
            dev.configure(json.dumps({"center_frequency_hz": 1.0}))

    def test_out_of_range_rejected(self):
        dev = MockDevice()
        with pytest.raises(ValueError):
            dev.set_center_frequency(1.0)
        with pytest.raises(ValueError):
            dev.set_sample_rate(100e6)

    def test_stream_requires_activation(self):
        dev = MockDevice()
        with pytest.raises(RuntimeError):
            dev.read(100)
        dev.activate_stream()
        assert dev.read(100).shape == (100,)

    def test_replay_and_eos(self):
        samples = np.arange(1000).astype(np.complex64)
        dev = MockDevice(samples=samples)
        dev.activate_stream()
        a = dev.read(600)
        b = dev.read(600)
        assert dev.read(1) is None
        np.testing.assert_array_equal(np.concatenate([a, b]), samples)

    def test_factory_unknown_driver(self):
        with pytest.raises(ValueError, match="unknown SDR driver"):
            open_device("notareal_sdr")

    def test_soapy_unavailable_raises_helpfully(self):
        with pytest.raises(RuntimeError, match="SoapySDR"):
            open_device("rtlsdr")

    def test_device_feeds_receiver(self):
        """MockDevice as a Receiver source (the reference's hardware-mock
        pattern, SURVEY.md section 4)."""
        from gnss_sdr_tpu.config import ReceiverConfig, RfConfig, TrackConfig
        from gnss_sdr_tpu.receiver import Receiver

        fs = 2_048_000.0
        sig = synthesize(
            [SatelliteScenario(prn=13, doppler_hz=-700.0, amplitude=0.3)],
            int(0.3 * fs), fs, noise_std=1.0, seed=6,
        )
        dev = MockDevice(samples=sig)
        dev.set_sample_rate(fs)
        dev.activate_stream()
        rx = Receiver(
            ReceiverConfig(rf=RfConfig(freq_if_hz=0.0,
                                       output_sample_rate_hz=fs),
                           track=TrackConfig(n_channels=4), block_ms=20),
            dev,
        )
        out = rx.run()
        assert out["tracked_prns"] == [13]
