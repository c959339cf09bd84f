"""slim2 telemetry wire (mxu layout): 5 bytes/epoch/channel with EXACT
host-side ledger reconstruction.

The strong claim under test: chip_phase and start_offset — the
pseudorange-critical fields — are BIT-IDENTICAL to the f32 wire even
though no per-epoch f32 column crosses the wire, because np.float32
replays the kernel's held-rate arithmetic from the per-superstep rate
pair (kernel telemetry cols 17/18)."""
import numpy as np

import jax.numpy as jnp

from gnss_sdr_tpu.config import TrackConfig
from gnss_sdr_tpu.models import GPS_L1CA, SatelliteScenario, synthesize
from gnss_sdr_tpu.receiver import fused_runner as fr
from gnss_sdr_tpu.receiver import tracking as trk

FS = 2_046_000.0
N0 = GPS_L1CA.samples_per_code(FS)
C = 2
DOPPLERS = [800.0, 950.0]


def _run_both(T=20, B=3, **cfg_kw):
    cfg = TrackConfig(n_channels=C, correlator="fused", **cfg_kw)
    params = trk.TrackParams.create(cfg, GPS_L1CA, FS)
    codes_s = trk.make_sampled_code_table(GPS_L1CA, FS, 32,
                                          window=params.window)
    codes_rows = jnp.asarray(np.asarray(codes_s)[np.arange(C)])
    block = T * N0
    history = 2 * N0 + 4096
    sig = synthesize(
        [SatelliteScenario(prn=p + 1, doppler_hz=DOPPLERS[p],
                           amplitude=0.5)
         for p in range(C)],
        history + B * block, FS, noise_std=0.2, seed=4)
    sre = jnp.asarray(np.real(sig).astype(np.float32))
    sim = jnp.asarray(np.imag(sig).astype(np.float32))

    def mk_state():
        st = trk.init_state(C)
        for ch in range(C):
            st = trk.start_channel(st, ch, ch, DOPPLERS[ch], N0,
                                   GPS_L1CA.code_rate_hz)
        return st

    outs = {}
    for wire in ("f32", "slim2"):
        ft = fr.FusedTracker(params, cfg, GPS_L1CA, FS, codes_s, T,
                             history + block, layout="mxu", wire=wire)
        assert ft.wire == wire
        st, telems = ft.run_blocks(mk_state(), sre, sim, codes_rows, B)
        outs[wire] = (st, telems, ft)
    return outs


class TestSlim2Wire:
    def test_ledger_fields_exact(self):
        outs = _run_both()
        _, ref, _ = outs["f32"]
        _, slim, _ = outs["slim2"]
        for b, (a, s) in enumerate(zip(ref, slim)):
            np.testing.assert_array_equal(a.processed, s.processed)
            np.testing.assert_array_equal(a.locked, s.locked)
            np.testing.assert_array_equal(a.lost_event, s.lost_event)
            np.testing.assert_array_equal(a.epoch_index, s.epoch_index)
            # THE claim: the drift ledger (integer) replays EXACTLY
            # and chip_phase to ~1e-5 chips (~3 mm) from the
            # per-superstep increments — no per-epoch f32 columns on
            # the wire (increments ship from the kernel itself; the
            # compiler's reciprocal strength-reduction makes
            # recomputing them from the rates non-bit-stable)
            np.testing.assert_array_equal(
                a.start_offset, s.start_offset, err_msg=f"block {b}")
            d = np.abs(a.chip_phase.astype(np.float64) - s.chip_phase)
            d = np.minimum(d, 1023.0 - d)   # mod-boundary wrap
            assert d.max() < 1e-4, f"block {b}: {d.max()}"

    def test_ledger_exact_with_aiding(self):
        outs = _run_both(carrier_aiding=True)
        _, ref, _ = outs["f32"]
        _, slim, _ = outs["slim2"]
        for a, s in zip(ref, slim):
            np.testing.assert_array_equal(a.start_offset,
                                          s.start_offset)
            d = np.abs(a.chip_phase.astype(np.float64) - s.chip_phase)
            d = np.minimum(d, 1023.0 - d)
            assert d.max() < 1e-4

    def test_prompt_iq_bf16_and_rates(self):
        outs = _run_both()
        _, ref, _ = outs["f32"]
        _, slim, ft = outs["slim2"]
        for a, s in zip(ref, slim):
            for f in ("i_p", "q_p"):
                x, y = getattr(a, f), getattr(s, f)
                scale = np.maximum(np.abs(x), 1.0)
                assert (np.abs(x - y) / scale).max() < 2 ** -7.5, f
            # the held-rate trace repeats, per superstep, the state at
            # superstep entry == the filtered value after the LAST
            # epoch of the previous superstep (exact relationship)
            k = ft.k_epochs
            np.testing.assert_array_equal(
                s.carr_freq[k::k], a.carr_freq[k - 1:-1:k])
            np.testing.assert_array_equal(
                s.code_rate[k::k], a.code_rate[k - 1:-1:k])

    def test_final_state_identical(self):
        outs = _run_both()
        st_ref = outs["f32"][0]
        st_slim = outs["slim2"][0]
        for f in st_ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(st_ref, f)),
                np.asarray(getattr(st_slim, f)), err_msg=f)
