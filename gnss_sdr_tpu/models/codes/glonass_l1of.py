"""GLONASS L1OF ranging code (FDMA).

Extended surface beyond the reference (which implements GPS L1 C/A only;
its README claims GLONASS, reference README.md:2). All GLONASS FDMA
satellites share a single 511-chip m-sequence; satellites are separated by
carrier frequency channel k: f = 1602 MHz + k * 562.5 kHz
(GLONASS ICD L1/L2, public).

Generator: 9-stage LFSR, feedback x^9 + x^5 + 1, output stage 7,
all-ones seed, period 511.
"""
from __future__ import annotations

import functools

import numpy as np

CODE_LENGTH = 511


@functools.lru_cache(maxsize=None)
def generate_code(prn: int = 0) -> np.ndarray:
    """511-chip L1OF code as int8 in {-1, +1}.

    ``prn`` is accepted for interface uniformity with other constellations
    but ignored — FDMA satellites share one code.
    """
    state = np.ones(9, dtype=np.uint8)
    out = np.empty(CODE_LENGTH, dtype=np.uint8)
    for i in range(CODE_LENGTH):
        out[i] = state[6]  # output tap: stage 7
        fb = state[8] ^ state[4]  # x^9 + x^5 + 1
        state[1:] = state[:-1]
        state[0] = fb
    return (2 * out.astype(np.int8) - 1)


@functools.lru_cache(maxsize=None)
def code_table(n_prn: int = 1) -> np.ndarray:
    """``[n_prn, 511]`` table (identical rows; kept for API uniformity)."""
    return np.tile(generate_code()[None, :], (n_prn, 1))


def sample_code(prn: int, code_rate_hz: float, fs_hz: float) -> np.ndarray:
    n = int(round(fs_hz / (code_rate_hz / CODE_LENGTH)))
    idx = np.floor(np.arange(n, dtype=np.float64) * code_rate_hz / fs_hz)
    idx = idx.astype(np.int64) % CODE_LENGTH
    return generate_code(prn)[idx]
