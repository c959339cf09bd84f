"""Synthetic GNSS signal generation (host-side NumPy fixture + oracle).

Generalization of the reference's test helper
(reference: src/tracking/do_tracking.rs:434-462): per sample i,
  carrier_phase = phi0 + 2*pi*f*i/fs
  chip = code[floor(cp0 + chip_rate/fs * i) mod L]
  sample = chip * exp(j * carrier_phase)
extended to multi-satellite scenes, nav-data modulation, BOC subcarriers,
additive noise, and int8 real-IF capture emulation (the bundled-capture
format described in reference src/test_data/GPS_recordings/config.txt).

float64 phase math on host — this is the ground-truth oracle the device
pipeline is validated against.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .constellation import GPS_L1CA, SignalSpec


@dataclasses.dataclass
class SatelliteScenario:
    """One simulated satellite signal component."""

    prn: int
    doppler_hz: float = 0.0
    code_phase_chips: float = 0.0     # code phase at sample 0
    carrier_phase_rad: float = 0.0    # carrier phase at sample 0
    amplitude: float = 1.0
    nav_bits: Optional[np.ndarray] = None  # +/-1 per bit period
    signal: SignalSpec = GPS_L1CA
    # chip-rate offset (code Doppler); physical scenes use
    # doppler_hz * code_rate / carrier_freq
    code_rate_offset_hz: float = 0.0

    def with_code_doppler(self) -> "SatelliteScenario":
        """Return a copy whose code rate is Doppler-scaled consistently
        with the carrier (real-satellite kinematics)."""
        return dataclasses.replace(
            self,
            code_rate_offset_hz=self.doppler_hz
            * self.signal.code_rate_hz / self.signal.carrier_freq_hz,
        )


def _unit_carrier(phi0_rad: float, w_rad_per_sample: float,
                  start_sample: int, n: int,
                  chunk: int = 8192) -> np.ndarray:
    """``exp(j*(phi0 + w*(start_sample + k)))`` for k in [0, n) as
    complex64, via chunked outer-product factorization: exact float64
    ``exp`` only at one anchor per ``chunk`` samples, times a shared
    in-chunk ramp. Phase error < ~1e-6 rad (one complex64 product of two
    f64-rounded unit phasors) — the naive per-sample complex128 ``exp``
    this replaces was ~100 ns/sample and dominated scene rendering.
    """
    m = -(-n // chunk)
    # float64 anchors: w * start can reach ~1e5 rad; reduce mod 2*pi in
    # exact integer-cycle arithmetic before exp
    ks = start_sample + chunk * np.arange(m, dtype=np.float64)
    cyc = (phi0_rad / (2.0 * np.pi)) + (w_rad_per_sample
                                        / (2.0 * np.pi)) * ks
    anchors = np.exp(2j * np.pi * (cyc - np.floor(cyc))).astype(
        np.complex64)
    r = np.arange(chunk, dtype=np.float64)
    ramp = np.exp(1j * (w_rad_per_sample * r)).astype(np.complex64)
    return (anchors[:, None] * ramp[None, :]).reshape(-1)[:n]


def synthesize(
    sats: Sequence[SatelliteScenario],
    n_samples: int,
    fs_hz: float,
    f_if_hz: float = 0.0,
    noise_std: float = 0.0,
    seed: int = 0,
    start_sample: int = 0,
) -> np.ndarray:
    """Render a complex64 baseband(+IF) sample stream for a scene.

    The carrier of each satellite sits at ``f_if + doppler``; passing
    ``f_if=0`` reproduces the reference test-generator setup
    (do_tracking.rs:464-570 uses pure-baseband synthetic signals).
    ``start_sample`` offsets the scene so long streams can be rendered in
    chunks with exact phase continuity.
    """
    i = np.arange(start_sample, start_sample + n_samples, dtype=np.float64)
    out = np.zeros(n_samples, dtype=np.complex64)
    for sat in sats:
        spec = sat.signal
        rate = spec.code_rate_hz + sat.code_rate_offset_hz
        chip_phase = sat.code_phase_chips + rate / fs_hz * i
        chip_idx = np.floor(chip_phase).astype(np.int64)
        code = spec.code_table()[sat.prn - 1]
        chips = code[chip_idx % spec.code_length_chips].astype(np.float32)
        if spec.boc_cycles_per_chip:
            half = np.floor(
                chip_phase * 2 * spec.boc_cycles_per_chip
            ).astype(np.int64) & 1
            chips *= (1.0 - 2.0 * half).astype(np.float32)
        if spec.secondary_code is not None:
            sec = spec.secondary_code
            sec_idx = (
                chip_idx // spec.code_length_chips
            ) % len(sec)
            chips *= sec[sec_idx].astype(np.float32)
        if sat.nav_bits is not None:
            codes_elapsed = chip_idx // spec.code_length_chips
            bit_idx = (codes_elapsed // spec.symbols_per_bit) % len(sat.nav_bits)
            chips *= sat.nav_bits[bit_idx].astype(np.float32)
        f = f_if_hz + sat.doppler_hz
        carrier = _unit_carrier(
            sat.carrier_phase_rad, 2.0 * np.pi * f / fs_hz,
            start_sample, n_samples)
        out += (sat.amplitude * chips) * carrier
    if noise_std > 0.0:
        rng = np.random.default_rng(seed)
        out += noise_std * (
            rng.standard_normal(n_samples) + 1j * rng.standard_normal(n_samples)
        ) / np.sqrt(2.0)
    return out.astype(np.complex64)


def synthesize_real_if_int8(
    sats: Sequence[SatelliteScenario],
    n_samples: int,
    fs_hz: float,
    f_if_hz: float,
    noise_std: float = 0.0,
    scale: float = 20.0,
    seed: int = 0,
) -> np.ndarray:
    """Render an int8 *real* IF capture (bundled-capture wire format).

    Mirrors how the reference's tests ingest gioveAandB_short.bin: raw
    int8 bytes read as real-valued samples at IF
    (reference do_acquisition.rs:420-424).
    """
    cx = synthesize(sats, n_samples, fs_hz, f_if_hz, noise_std, seed)
    real = np.real(cx) * scale
    return np.clip(np.round(real), -127, 127).astype(np.int8)
