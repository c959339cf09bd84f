"""Satellite position/velocity/clock from broadcast ephemeris.

Capability parity with the reference's legacy Kepler solver
(reference: src/satellite.rs:20-93 — which does not compile upstream:
wrong field names and undefined constants, SURVEY.md section 1 L6).
Algorithm per IS-GPS-200 20.3.3.4.3, vectorized over satellites with
NumPy (host math; tiny), including analytic velocity and the
relativistic clock correction.
"""
from __future__ import annotations

import numpy as np

from .. import constants as C
from .ephemeris import Ephemeris


def _wrap_week(t: np.ndarray) -> np.ndarray:
    """Account for end-of-week crossovers: wrap into [-302400, 302400]."""
    t = np.where(t > 302400.0, t - 604800.0, t)
    t = np.where(t < -302400.0, t + 604800.0, t)
    return t


def satellite_clock_correction(eph: Ephemeris, t_sv: float) -> float:
    """SV clock offset (s) at transmit time, incl. relativistic term and
    group delay (for L1 users: subtract T_GD)."""
    dt = float(_wrap_week(np.asarray(t_sv - eph.t_oc)))
    # eccentric anomaly for the relativistic term
    a = eph.sqrt_a**2
    n = np.sqrt(C.GM_EARTH_M3_S2 / a**3) + eph.delta_n
    tk = float(_wrap_week(np.asarray(t_sv - eph.t_oe)))
    mk = eph.m0 + n * tk
    ek = _kepler(mk, eph.e)
    dtr = C.F_RELATIVISTIC * eph.e * eph.sqrt_a * np.sin(ek)
    return (
        eph.a_f0 + eph.a_f1 * dt + eph.a_f2 * dt * dt + dtr - eph.t_gd
    )


def _kepler(mk, e, iters: int = 10):
    """Solve E - e sin E = M by Newton iteration (reference used 10
    fixed-point iterations, satellite.rs:40-47)."""
    ek = mk
    for _ in range(iters):
        ek = ek - (ek - e * np.sin(ek) - mk) / (1.0 - e * np.cos(ek))
    return ek


def satellite_position(
    eph: Ephemeris, t: float
) -> tuple[np.ndarray, np.ndarray, float]:
    """ECEF position [m], velocity [m/s], and clock correction [s] at
    GPS system time ``t`` (seconds of week, transmit time)."""
    a = eph.sqrt_a**2
    n0 = np.sqrt(C.GM_EARTH_M3_S2 / a**3)
    tk = float(_wrap_week(np.asarray(t - eph.t_oe)))
    n = n0 + eph.delta_n
    mk = eph.m0 + n * tk
    ek = _kepler(mk, eph.e)

    sin_ek, cos_ek = np.sin(ek), np.cos(ek)
    # true anomaly
    nu = np.arctan2(np.sqrt(1.0 - eph.e**2) * sin_ek, cos_ek - eph.e)
    phi = nu + eph.omega

    sin2p, cos2p = np.sin(2.0 * phi), np.cos(2.0 * phi)
    du = eph.c_us * sin2p + eph.c_uc * cos2p
    dr = eph.c_rs * sin2p + eph.c_rc * cos2p
    di = eph.c_is * sin2p + eph.c_ic * cos2p

    u = phi + du
    r = a * (1.0 - eph.e * cos_ek) + dr
    i = eph.i0 + di + eph.idot * tk

    x_orb = r * np.cos(u)
    y_orb = r * np.sin(u)

    omega_k = (
        eph.omega0
        + (eph.omega_dot - C.OMEGA_E_DOT_RAD_S) * tk
        - C.OMEGA_E_DOT_RAD_S * eph.t_oe
    )
    sin_o, cos_o = np.sin(omega_k), np.cos(omega_k)
    sin_i, cos_i = np.sin(i), np.cos(i)

    pos = np.array([
        x_orb * cos_o - y_orb * cos_i * sin_o,
        x_orb * sin_o + y_orb * cos_i * cos_o,
        y_orb * sin_i,
    ])

    # ---- analytic velocity (standard differentiation of the above)
    ek_dot = n / (1.0 - eph.e * cos_ek)
    phi_dot = np.sqrt(1.0 - eph.e**2) / (1.0 - eph.e * cos_ek) * ek_dot
    u_dot = phi_dot * (1.0 + 2.0 * (eph.c_us * cos2p - eph.c_uc * sin2p))
    r_dot = a * eph.e * sin_ek * ek_dot + 2.0 * phi_dot * (
        eph.c_rs * cos2p - eph.c_rc * sin2p
    )
    i_dot = eph.idot + 2.0 * phi_dot * (
        eph.c_is * cos2p - eph.c_ic * sin2p
    )
    omega_k_dot = eph.omega_dot - C.OMEGA_E_DOT_RAD_S

    x_orb_dot = r_dot * np.cos(u) - r * np.sin(u) * u_dot
    y_orb_dot = r_dot * np.sin(u) + r * np.cos(u) * u_dot

    vel = np.array([
        (x_orb_dot - y_orb * cos_i * omega_k_dot) * cos_o
        - (x_orb * omega_k_dot + y_orb_dot * cos_i - y_orb * sin_i * i_dot)
        * sin_o,
        (x_orb_dot - y_orb * cos_i * omega_k_dot) * sin_o
        + (x_orb * omega_k_dot + y_orb_dot * cos_i - y_orb * sin_i * i_dot)
        * cos_o,
        y_orb_dot * sin_i + y_orb * cos_i * i_dot,
    ])

    clock = satellite_clock_correction(eph, t)
    return pos, vel, clock
