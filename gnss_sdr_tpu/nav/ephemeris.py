"""GPS broadcast ephemeris: dataclass + LNAV subframe 1-3 extraction.

Capability parity with the reference's legacy ephemeris surface
(reference: src/rinex.rs:52-213 orbit structs; the reference never
implemented subframe->ephemeris extraction — its decoder stops at TOW,
decoding.rs:241-253). Field layout per IS-GPS-200 section 20.3.3;
scale factors are the ICD's powers of two; angles arrive in semicircles
and are stored in radians.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .bits import Subframe, bits_to_int, bits_to_uint

PI = 3.1415926535898  # GPS ICD value of pi (semicircle conversion)


@dataclasses.dataclass
class Ephemeris:
    prn: int = 0
    #: constellation time/orbit convention: "gps" | "galileo" | "beidou"
    #: (Keplerian broadcast models; GLONASS uses GlonassEphemeris)
    system: str = "gps"
    # clock (subframe 1)
    week: int = 0
    ura: int = 0
    health: int = 0
    iodc: int = 0
    t_gd: float = 0.0
    t_oc: float = 0.0
    a_f2: float = 0.0
    a_f1: float = 0.0
    a_f0: float = 0.0
    # orbit (subframes 2-3)
    iode: int = 0
    c_rs: float = 0.0
    delta_n: float = 0.0     # rad/s
    m0: float = 0.0          # rad
    c_uc: float = 0.0
    e: float = 0.0
    c_us: float = 0.0
    sqrt_a: float = 0.0
    t_oe: float = 0.0
    c_ic: float = 0.0
    omega0: float = 0.0      # rad
    c_is: float = 0.0
    i0: float = 0.0          # rad
    c_rc: float = 0.0
    omega: float = 0.0       # rad
    omega_dot: float = 0.0   # rad/s
    idot: float = 0.0        # rad/s

    def is_complete(self) -> bool:
        return self.sqrt_a > 0.0 and self.t_oe >= 0.0 and self.iode == self.iodc % 256


def _u(data: np.ndarray, parts: list[tuple[int, int, int]]) -> int:
    """Unsigned field from (word 1-10, first bit 1-24, nbits) pieces,
    MSB piece first."""
    bits = np.concatenate(
        [data[w - 1][b - 1:b - 1 + n] for (w, b, n) in parts]
    )
    return bits_to_uint(bits)


def _s(data: np.ndarray, parts: list[tuple[int, int, int]]) -> int:
    bits = np.concatenate(
        [data[w - 1][b - 1:b - 1 + n] for (w, b, n) in parts]
    )
    return bits_to_int(bits)


def apply_subframe(eph: Ephemeris, sf: Subframe) -> Ephemeris:
    """Merge one parity-verified subframe into the ephemeris."""
    d = sf.data
    if sf.subframe_id == 1:
        eph.week = _u(d, [(3, 1, 10)])
        eph.ura = _u(d, [(3, 13, 4)])
        eph.health = _u(d, [(3, 17, 6)])
        eph.iodc = _u(d, [(3, 23, 2), (8, 1, 8)])
        eph.t_gd = _s(d, [(7, 17, 8)]) * 2.0**-31
        eph.t_oc = _u(d, [(8, 9, 16)]) * 16.0
        eph.a_f2 = _s(d, [(9, 1, 8)]) * 2.0**-55
        eph.a_f1 = _s(d, [(9, 9, 16)]) * 2.0**-43
        eph.a_f0 = _s(d, [(10, 1, 22)]) * 2.0**-31
    elif sf.subframe_id == 2:
        eph.iode = _u(d, [(3, 1, 8)])
        eph.c_rs = _s(d, [(3, 9, 16)]) * 2.0**-5
        eph.delta_n = _s(d, [(4, 1, 16)]) * 2.0**-43 * PI
        eph.m0 = _s(d, [(4, 17, 8), (5, 1, 24)]) * 2.0**-31 * PI
        eph.c_uc = _s(d, [(6, 1, 16)]) * 2.0**-29
        eph.e = _u(d, [(6, 17, 8), (7, 1, 24)]) * 2.0**-33
        eph.c_us = _s(d, [(8, 1, 16)]) * 2.0**-29
        eph.sqrt_a = _u(d, [(8, 17, 8), (9, 1, 24)]) * 2.0**-19
        eph.t_oe = _u(d, [(10, 1, 16)]) * 16.0
    elif sf.subframe_id == 3:
        eph.c_ic = _s(d, [(3, 1, 16)]) * 2.0**-29
        eph.omega0 = _s(d, [(3, 17, 8), (4, 1, 24)]) * 2.0**-31 * PI
        eph.c_is = _s(d, [(5, 1, 16)]) * 2.0**-29
        eph.i0 = _s(d, [(5, 17, 8), (6, 1, 24)]) * 2.0**-31 * PI
        eph.c_rc = _s(d, [(7, 1, 16)]) * 2.0**-5
        eph.omega = _s(d, [(7, 17, 8), (8, 1, 24)]) * 2.0**-31 * PI
        eph.omega_dot = _s(d, [(9, 1, 24)]) * 2.0**-43 * PI
        eph.iode = _u(d, [(10, 1, 8)])
        eph.idot = _s(d, [(10, 9, 14)]) * 2.0**-43 * PI
    return eph


# ---------------------------------------------------------------------------
# Encoder side (test oracle): ephemeris -> subframe data words
# ---------------------------------------------------------------------------

def _put(data: np.ndarray, parts: list[tuple[int, int, int]], value: int) -> None:
    total = sum(n for _, _, n in parts)
    value &= (1 << total) - 1
    bits = [(value >> (total - 1 - i)) & 1 for i in range(total)]
    k = 0
    for (w, b, n) in parts:
        data[w - 1][b - 1:b - 1 + n] = bits[k:k + n]
        k += n


def encode_words(eph: Ephemeris, subframe_id: int) -> np.ndarray:
    """Source data bits for words 3..10 of a subframe (inverse of
    apply_subframe; used by tests and the scene simulator)."""
    d = np.zeros((10, 24), dtype=np.uint8)

    def r(x, scale):
        return int(round(x / scale))

    if subframe_id == 1:
        _put(d, [(3, 1, 10)], eph.week)
        _put(d, [(3, 13, 4)], eph.ura)
        _put(d, [(3, 17, 6)], eph.health)
        _put(d, [(3, 23, 2), (8, 1, 8)], eph.iodc)
        _put(d, [(7, 17, 8)], r(eph.t_gd, 2.0**-31))
        _put(d, [(8, 9, 16)], r(eph.t_oc, 16.0))
        _put(d, [(9, 1, 8)], r(eph.a_f2, 2.0**-55))
        _put(d, [(9, 9, 16)], r(eph.a_f1, 2.0**-43))
        _put(d, [(10, 1, 22)], r(eph.a_f0, 2.0**-31))
    elif subframe_id == 2:
        _put(d, [(3, 1, 8)], eph.iode)
        _put(d, [(3, 9, 16)], r(eph.c_rs, 2.0**-5))
        _put(d, [(4, 1, 16)], r(eph.delta_n, 2.0**-43 * PI))
        _put(d, [(4, 17, 8), (5, 1, 24)], r(eph.m0, 2.0**-31 * PI))
        _put(d, [(6, 1, 16)], r(eph.c_uc, 2.0**-29))
        _put(d, [(6, 17, 8), (7, 1, 24)], r(eph.e, 2.0**-33))
        _put(d, [(8, 1, 16)], r(eph.c_us, 2.0**-29))
        _put(d, [(8, 17, 8), (9, 1, 24)], r(eph.sqrt_a, 2.0**-19))
        _put(d, [(10, 1, 16)], r(eph.t_oe, 16.0))
    elif subframe_id == 3:
        _put(d, [(3, 1, 16)], r(eph.c_ic, 2.0**-29))
        _put(d, [(3, 17, 8), (4, 1, 24)], r(eph.omega0, 2.0**-31 * PI))
        _put(d, [(5, 1, 16)], r(eph.c_is, 2.0**-29))
        _put(d, [(5, 17, 8), (6, 1, 24)], r(eph.i0, 2.0**-31 * PI))
        _put(d, [(7, 1, 16)], r(eph.c_rc, 2.0**-5))
        _put(d, [(7, 17, 8), (8, 1, 24)], r(eph.omega, 2.0**-31 * PI))
        _put(d, [(9, 1, 24)], r(eph.omega_dot, 2.0**-43 * PI))
        _put(d, [(10, 1, 8)], eph.iode)
        _put(d, [(10, 9, 14)], r(eph.idot, 2.0**-43 * PI))
    return d[2:]


class EphemerisAssembler:
    """Collects subframes per PRN until a CONSISTENT 1+2+3 set exists.

    Consistency means the issue-of-data stamps agree (IODE of subframes
    2 and 3 equal, and equal to the 8 LSBs of subframe 1's IODC,
    IS-GPS-200 20.3.4.4) — otherwise a data-set cutover between
    subframes could merge parameters from two ephemeris issues.
    """

    def __init__(self):
        self._eph: dict[int, Ephemeris] = {}
        # per PRN: subframe_id -> issue stamp seen with it
        self._issues: dict[int, dict[int, int]] = {}

    def feed(self, prn: int, sf: Subframe) -> Optional[Ephemeris]:
        eph = self._eph.setdefault(prn, Ephemeris(prn=prn))
        if sf.subframe_id not in (1, 2, 3):
            return None
        apply_subframe(eph, sf)
        d = sf.data
        if sf.subframe_id == 1:
            issue = _u(d, [(3, 23, 2), (8, 1, 8)]) & 0xFF
        elif sf.subframe_id == 2:
            issue = _u(d, [(3, 1, 8)])
        else:
            issue = _u(d, [(10, 1, 8)])
        issues = self._issues.setdefault(prn, {})
        issues[sf.subframe_id] = issue
        if set(issues) >= {1, 2, 3} and len(set(issues.values())) == 1:
            return eph
        return None
