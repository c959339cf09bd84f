"""Pallas kernel validation against the XLA reference path
(interpreter mode on CPU; the same entry points compile on TPU)."""
import numpy as np
import pytest

from gnss_sdr_tpu.models import GPS_L1CA, SatelliteScenario, synthesize
from gnss_sdr_tpu.ops import nco
from gnss_sdr_tpu.ops.correlator import epl_correlate_one_shift
from gnss_sdr_tpu.ops.pallas.epl_correlator import epl_correlate_pallas

import functools

import jax
import jax.numpy as jnp

FS = 2_048_000.0
W = 2056
SHIFT = 1


def make_inputs(n_ch=4, seed=0):
    rng = np.random.default_rng(seed)
    sig = synthesize(
        [SatelliteScenario(prn=p + 1, doppler_hz=500.0 * p,
                           code_phase_chips=10.0 * p)
         for p in range(n_ch)],
        W, FS, noise_std=1.0, seed=seed,
    )
    re = np.tile(np.real(sig).astype(np.float32), (n_ch, 1))
    im = np.tile(np.imag(sig).astype(np.float32), (n_ch, 1))
    n_valid = np.full(n_ch, 2048, np.int32)
    carr_acc = rng.integers(0, 2**32, n_ch, dtype=np.uint32)
    carr_step = np.asarray(
        nco.freq_to_step(np.float32(1000.0) * np.arange(n_ch, dtype=np.float32), FS)
    )
    chip_int = rng.integers(0, 1023, n_ch).astype(np.int32)
    chip_frac = rng.random(n_ch).astype(np.float32)
    cps = np.full(n_ch, 1.023e6 / FS, np.float32)
    codes = np.stack(
        [GPS_L1CA.code_table()[p].astype(np.float32) for p in range(n_ch)]
    )
    return re, im, n_valid, carr_acc, carr_step, chip_int, chip_frac, cps, codes


class TestPallasEplCorrelator:
    def test_matches_xla_shift_path(self):
        args = make_inputs()
        got = epl_correlate_pallas(
            *args, shift=SHIFT, oversample=1, interpret=True
        )
        ref = jax.vmap(
            functools.partial(
                epl_correlate_one_shift, shift=SHIFT, oversample=1
            )
        )(*args)
        for name in got._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                rtol=1e-5, atol=1e-2,
                err_msg=f"field {name}",
            )

    def test_mask_respected(self):
        args = list(make_inputs(n_ch=2, seed=1))
        # full vs truncated epoch must differ
        full = epl_correlate_pallas(*args, shift=SHIFT, interpret=True)
        args[2] = np.array([1024, 2048], np.int32)
        half = epl_correlate_pallas(*args, shift=SHIFT, interpret=True)
        assert not np.allclose(np.asarray(full.i_p[0]), np.asarray(half.i_p[0]))
        np.testing.assert_allclose(
            np.asarray(full.i_p[1]), np.asarray(half.i_p[1]), rtol=1e-6
        )

    def test_boc_oversample(self):
        from gnss_sdr_tpu.models import GALILEO_E1B
        from gnss_sdr_tpu.receiver.tracking import make_code_table

        n_ch = 2
        fs = 8_184_000.0
        w = 1024
        rng = np.random.default_rng(2)
        sig = synthesize(
            [SatelliteScenario(prn=1, signal=GALILEO_E1B)], w, fs
        )
        re = np.tile(np.real(sig).astype(np.float32), (n_ch, 1))
        im = np.tile(np.imag(sig).astype(np.float32), (n_ch, 1))
        codes = np.asarray(make_code_table(GALILEO_E1B, n_ch))
        args = (
            re, im,
            np.full(n_ch, w, np.int32),
            np.zeros(n_ch, np.uint32),
            np.zeros(n_ch, np.uint32),
            np.zeros(n_ch, np.int32),
            np.zeros(n_ch, np.float32),
            np.full(n_ch, 1.023e6 / fs, np.float32),
            codes,
        )
        got = epl_correlate_pallas(*args, shift=4, oversample=2, interpret=True)
        ref = jax.vmap(
            functools.partial(epl_correlate_one_shift, shift=4, oversample=2)
        )(*args)
        np.testing.assert_allclose(
            np.asarray(got.i_p), np.asarray(ref.i_p), rtol=1e-5, atol=1e-2
        )
        # aligned noiseless BOC signal: prompt correlation ~ w
        assert float(got.i_p[0]) > 0.9 * w


class TestPallasInTracking:
    def test_track_block_with_pallas_correlator(self):
        """Full tracking scan with the pallas correlator matches the
        shift-path trajectory (interpreter mode on CPU)."""
        from gnss_sdr_tpu.config import TrackConfig
        from gnss_sdr_tpu.receiver import tracking as trk

        fs = 2_048_000.0
        n0 = GPS_L1CA.samples_per_code(fs)
        sig = synthesize(
            [SatelliteScenario(prn=9, doppler_hz=1700.0)], 25 * n0, fs,
            noise_std=0.5, seed=5,
        )
        re = np.real(sig).astype(np.float32)
        im = np.imag(sig).astype(np.float32)
        codes = trk.make_code_table(GPS_L1CA, 32)

        results = {}
        for corr in ("shift", "pallas"):
            cfg = TrackConfig(n_channels=2, correlator=corr)
            params = trk.TrackParams.create(cfg, GPS_L1CA, fs)
            st = trk.start_channel(
                trk.init_state(2), 0, 8, 1680.0, 0, 1.023e6
            )
            codes_ch = codes[np.maximum(np.asarray(st.prn_idx), 0)]
            st, telem = trk.track_block(params, codes_ch, st, re, im, 20)
            results[corr] = (st, telem)

        st_a, t_a = results["shift"]
        st_b, t_b = results["pallas"]
        np.testing.assert_allclose(
            np.asarray(t_a.carr_freq)[:, 0], np.asarray(t_b.carr_freq)[:, 0],
            rtol=1e-5,
        )
        assert np.asarray(t_b.locked)[:, 0].all()
        np.testing.assert_array_equal(
            np.asarray(st_a.offset), np.asarray(st_b.offset)
        )
