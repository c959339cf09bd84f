"""Constellation / signal registry.

The reference hardcodes GPS L1 C/A throughout (e.g. acquisition pulls GPS
constants directly, reference src/acquisition/do_acquisition.rs:2-4). Here
every signal is described by one frozen ``SignalSpec`` so acquisition,
tracking, and synthesis are constellation-generic — the axis along which
this framework exceeds the reference (BASELINE.md config ladder 3-4).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from .. import constants as C
from .codes import beidou_b1i, galileo_e1, glonass_l1of, gps_l1ca


@dataclasses.dataclass(frozen=True)
class SignalSpec:
    """Static description of one GNSS signal component."""

    name: str
    carrier_freq_hz: float
    code_rate_hz: float
    code_length_chips: int
    code_period_ms: int
    n_prn: int
    # code_table() -> [n_prn, code_length] int8 in {-1,+1} (primary code,
    # chip domain — BOC subcarrier is applied at sample time).
    code_table: Callable[[], np.ndarray]
    # sample_code(prn, code_rate, fs) -> [n] int8 replica at fs
    sample_code: Callable[[int, float, float], np.ndarray]
    # BOC(1,1) subcarrier cycles per chip (0 = BPSK)
    boc_cycles_per_chip: int = 0
    secondary_code: Optional[np.ndarray] = None
    # symbol (data bit) period in code periods
    symbols_per_bit: int = 20

    @property
    def code_period_s(self) -> float:
        return self.code_length_chips / self.code_rate_hz

    def samples_per_code(self, fs_hz: float) -> int:
        return int(round(fs_hz * self.code_period_s))


GPS_L1CA = SignalSpec(
    name="gps_l1ca",
    carrier_freq_hz=C.GPS_L1_FREQ_HZ,
    code_rate_hz=C.GPS_L1_CA_CODE_RATE_CHIPS_PER_S,
    code_length_chips=C.GPS_L1_CA_CODE_LENGTH_CHIPS,
    code_period_ms=C.GPS_L1_CA_CODE_PERIOD_MS,
    n_prn=C.GPS_NUM_PRN,
    code_table=gps_l1ca.code_table,
    sample_code=gps_l1ca.sample_code,
    symbols_per_bit=C.GPS_CA_BIT_PERIOD_MS,
)

GALILEO_E1B = SignalSpec(
    name="galileo_e1b",
    carrier_freq_hz=C.GAL_E1_FREQ_HZ,
    code_rate_hz=C.GAL_E1_CODE_RATE_CHIPS_PER_S,
    code_length_chips=C.GAL_E1_CODE_LENGTH_CHIPS,
    code_period_ms=C.GAL_E1_CODE_PERIOD_MS,
    n_prn=C.GAL_NUM_PRN,
    code_table=lambda n=C.GAL_NUM_PRN: galileo_e1.code_table(n, "E1B"),
    sample_code=lambda p, r, f: galileo_e1.sample_code(p, r, f, "E1B"),
    boc_cycles_per_chip=1,
    symbols_per_bit=1,  # 250 sym/s, one symbol per 4 ms code
)

GALILEO_E1C = SignalSpec(
    name="galileo_e1c",
    carrier_freq_hz=C.GAL_E1_FREQ_HZ,
    code_rate_hz=C.GAL_E1_CODE_RATE_CHIPS_PER_S,
    code_length_chips=C.GAL_E1_CODE_LENGTH_CHIPS,
    code_period_ms=C.GAL_E1_CODE_PERIOD_MS,
    n_prn=C.GAL_NUM_PRN,
    code_table=lambda n=C.GAL_NUM_PRN: galileo_e1.code_table(n, "E1C"),
    sample_code=lambda p, r, f: galileo_e1.sample_code(p, r, f, "E1C"),
    boc_cycles_per_chip=1,
    secondary_code=galileo_e1.E1C_SECONDARY,
    symbols_per_bit=1,
)

BEIDOU_B1I = SignalSpec(
    name="beidou_b1i",
    carrier_freq_hz=C.BDS_B1I_FREQ_HZ,
    code_rate_hz=C.BDS_B1I_CODE_RATE_CHIPS_PER_S,
    code_length_chips=C.BDS_B1I_CODE_LENGTH_CHIPS,
    code_period_ms=C.BDS_B1I_CODE_PERIOD_MS,
    n_prn=C.BDS_NUM_PRN,
    code_table=beidou_b1i.code_table,
    sample_code=beidou_b1i.sample_code,
    secondary_code=np.array(
        [2 * b - 1 for b in C.BDS_NH_CODE], dtype=np.int8
    ),
    symbols_per_bit=20,
)

GLONASS_L1OF = SignalSpec(
    name="glonass_l1of",
    carrier_freq_hz=C.GLO_L1_BASE_FREQ_HZ,  # channel k shifts handled via IF
    code_rate_hz=C.GLO_L1_CODE_RATE_CHIPS_PER_S,
    code_length_chips=C.GLO_L1_CODE_LENGTH_CHIPS,
    code_period_ms=C.GLO_L1_CODE_PERIOD_MS,
    n_prn=14,  # FDMA channels, not PRNs; one shared code
    code_table=lambda n=14: glonass_l1of.code_table(n),
    sample_code=glonass_l1of.sample_code,
    # the on-air modulation unit is the 10 ms bi-binary half-symbol
    # (50 bit/s data x meander -> 100 Hz levels, nav/glonass_nav.py
    # encode_bit_stream); time-mark symbols are 10 ms too
    symbols_per_bit=10,
)

REGISTRY: dict[str, SignalSpec] = {
    s.name: s
    for s in (GPS_L1CA, GALILEO_E1B, GALILEO_E1C, BEIDOU_B1I, GLONASS_L1OF)
}


def get_signal(name: str) -> SignalSpec:
    try:
        return REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown signal {name!r}; available: {sorted(REGISTRY)}"
        ) from None
