"""BeiDou B1I ranging code.

Extended surface beyond the reference (which implements GPS L1 C/A only;
its README claims BeiDou, reference README.md:2).

Generator (BDS-SIS-ICD B1I, public): two 11-stage LFSRs seeded
0101010101 0 (stage 1 first = 01010101010), run for 2046 chips
(the natural 2047-chip Gold sequence is truncated by one chip):
  G1: feedback 1 + x + x^7 + x^8 + x^9 + x^10 + x^11, output stage 11.
  G2: feedback 1 + x + x^2 + x^3 + x^4 + x^5 + x^8 + x^9 + x^11,
      output = XOR of a per-PRN pair of phase taps.
chip = G1 XOR G2_taps, mapped to +/-1.

The per-PRN phase-tap pairs below follow the published B1I assignment for
PRNs 1-37. Structural properties (length, balance, bounded
cross-correlation) are enforced by tests/test_codes.py.
"""
from __future__ import annotations

import functools

import numpy as np

CODE_LENGTH = 2046

# Per-PRN G2 phase-selector tap pairs (1-indexed stages), BDS ICD table.
PHASE_TAPS = (
    (1, 3), (1, 4), (1, 5), (1, 6), (1, 8), (1, 9), (1, 10), (1, 11),
    (2, 7), (3, 4), (3, 5), (3, 6), (3, 8), (3, 9), (3, 10), (3, 11),
    (4, 5), (4, 6), (4, 8), (4, 9), (4, 10), (4, 11), (5, 6), (5, 8),
    (5, 9), (5, 10), (5, 11), (6, 8), (6, 9), (6, 10), (6, 11), (8, 9),
    (8, 10), (8, 11), (9, 10), (9, 11), (10, 11),
)

_SEED = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0], dtype=np.uint8)


def _run_g1() -> np.ndarray:
    state = _SEED.copy()
    out = np.empty(CODE_LENGTH, dtype=np.uint8)
    for i in range(CODE_LENGTH):
        out[i] = state[10]
        fb = state[0] ^ state[6] ^ state[7] ^ state[8] ^ state[9] ^ state[10]
        state[1:] = state[:-1]
        state[0] = fb
    return out


def _run_g2(taps: tuple[int, int]) -> np.ndarray:
    state = _SEED.copy()
    out = np.empty(CODE_LENGTH, dtype=np.uint8)
    a, b = taps[0] - 1, taps[1] - 1
    for i in range(CODE_LENGTH):
        out[i] = state[a] ^ state[b]
        fb = (state[0] ^ state[1] ^ state[2] ^ state[3] ^ state[4]
              ^ state[7] ^ state[8] ^ state[10])
        state[1:] = state[:-1]
        state[0] = fb
    return out


@functools.lru_cache(maxsize=None)
def generate_code(prn: int) -> np.ndarray:
    """2046-chip B1I code for PRN 1..37 as int8 in {-1, +1}."""
    if not 1 <= prn <= len(PHASE_TAPS):
        raise ValueError(f"invalid BeiDou PRN: {prn}")
    g1 = _run_g1()
    g2 = _run_g2(PHASE_TAPS[prn - 1])
    return (2 * (g1 ^ g2).astype(np.int8) - 1)


@functools.lru_cache(maxsize=None)
def code_table(n_prn: int = 37) -> np.ndarray:
    return np.stack([generate_code(p) for p in range(1, n_prn + 1)])


def sample_code(prn: int, code_rate_hz: float, fs_hz: float) -> np.ndarray:
    n = int(round(fs_hz / (code_rate_hz / CODE_LENGTH)))
    idx = np.floor(np.arange(n, dtype=np.float64) * code_rate_hz / fs_hz)
    idx = idx.astype(np.int64) % CODE_LENGTH
    return generate_code(prn)[idx]
