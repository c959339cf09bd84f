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


def _gm_omega(system: str) -> tuple[float, float]:
    """(GM, earth-rotation rate) for a Keplerian broadcast system."""
    if system == "galileo":
        return C.GAL_GM_M3_S2, C.GAL_OMEGA_E_DOT_RAD_S
    if system == "beidou":
        return C.BDS_GM_M3_S2, C.BDS_OMEGA_E_DOT_RAD_S
    return C.GM_EARTH_M3_S2, C.OMEGA_E_DOT_RAD_S


def satellite_clock_correction(eph: Ephemeris, t_sv: float) -> float:
    """SV clock offset (s) at transmit time, incl. relativistic term and
    group delay (for L1 users: subtract T_GD)."""
    gm, _ = _gm_omega(getattr(eph, "system", "gps"))
    dt = float(_wrap_week(np.asarray(t_sv - eph.t_oc)))
    # eccentric anomaly for the relativistic term
    a = eph.sqrt_a**2
    n = np.sqrt(gm / a**3) + eph.delta_n
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
    system time ``t`` (seconds of week, transmit time). Dispatches on
    ``eph.system``: Keplerian broadcast models (GPS/Galileo/BeiDou, with
    each ICD's GM and earth-rate) or the GLONASS PZ-90 integrator."""
    if getattr(eph, "system", "gps") == "glonass":
        return glonass_satellite_position(eph, t)
    gm, omega_e = _gm_omega(getattr(eph, "system", "gps"))
    a = eph.sqrt_a**2
    n0 = np.sqrt(gm / a**3)
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
        + (eph.omega_dot - omega_e) * tk
        - omega_e * eph.t_oe
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
    omega_k_dot = eph.omega_dot - omega_e

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


# ---------------------------------------------------------------------------
# GLONASS: PZ-90 state-vector propagation (ICD 5.1 appendix J.1)
# ---------------------------------------------------------------------------

def _glonass_accel(state: np.ndarray, acc_ls: np.ndarray) -> np.ndarray:
    """ECEF equations of motion: central force + J2 + frame rotation
    (Coriolis/centrifugal) + broadcast luni-solar acceleration."""
    x, y, z, vx, vy, vz = state
    r2 = x * x + y * y + z * z
    r = np.sqrt(r2)
    gm_r3 = C.GLO_GM_M3_S2 / (r2 * r)
    j2c = 1.5 * C.GLO_J2 * C.GLO_GM_M3_S2 * C.GLO_A_E_M**2 / (r2 * r2 * r)
    z2_r2 = z * z / r2
    w = C.GLO_OMEGA_E_DOT_RAD_S
    ax = (-gm_r3 * x - j2c * x * (1.0 - 5.0 * z2_r2)
          + w * w * x + 2.0 * w * vy + acc_ls[0])
    ay = (-gm_r3 * y - j2c * y * (1.0 - 5.0 * z2_r2)
          + w * w * y - 2.0 * w * vx + acc_ls[1])
    az = (-gm_r3 * z - j2c * z * (3.0 - 5.0 * z2_r2) + acc_ls[2])
    return np.array([vx, vy, vz, ax, ay, az])


def glonass_satellite_position(
    geph, t_day_s: float, max_step_s: float = 60.0
) -> tuple[np.ndarray, np.ndarray, float]:
    """PZ-90 ECEF position/velocity/clock at day time ``t_day_s``.

    RK4 integration of the broadcast state from t_b (valid +/-15 min).
    PZ-90.11 is aligned with ITRF at the cm level, so positions mix
    directly with WGS-84/GTRF solutions at this receiver's accuracy.
    """
    dt = float(t_day_s - geph.t_b_s)
    state = np.concatenate([
        np.asarray(geph.pos_m, np.float64),
        np.asarray(geph.vel_m_s, np.float64),
    ])
    acc = np.asarray(geph.acc_m_s2, np.float64)
    n_steps = max(1, int(np.ceil(abs(dt) / max_step_s)))
    h = dt / n_steps
    for _ in range(n_steps):
        k1 = _glonass_accel(state, acc)
        k2 = _glonass_accel(state + 0.5 * h * k1, acc)
        k3 = _glonass_accel(state + 0.5 * h * k2, acc)
        k4 = _glonass_accel(state + h * k3, acc)
        state = state + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    clock = geph.clock_correction(t_day_s)
    return state[:3], state[3:], clock
