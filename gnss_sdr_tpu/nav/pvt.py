"""Position/velocity/time solution from pseudoranges.

Beyond-reference capability: the reference's legacy pipeline ends at
satellite positions (SURVEY.md section 1 L6 — view-only, no solver).
This implements the standard iterated least-squares single-point
solution with Earth-rotation (Sagnac) correction and satellite clock
corrections, plus geodetic conversion for reporting.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .. import constants as C
from .ephemeris import Ephemeris
from .orbits import satellite_position


@dataclasses.dataclass
class PvtSolution:
    position_ecef_m: np.ndarray      # [3]
    clock_bias_m: float              # receiver clock bias * c (1st system)
    residuals_m: np.ndarray          # [n_sat]
    gdop: float
    n_iterations: int
    latitude_deg: float
    longitude_deg: float
    height_m: float
    #: per-constellation receiver clock bias * c; multi-system solves
    #: estimate one bias per system (inter-system bias absorbs the
    #: GGTO/BDT/GLONASST offsets, so no a-priori offset model is needed)
    clock_bias_by_system_m: dict = dataclasses.field(default_factory=dict)


def _rot_z(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def ecef_to_geodetic(pos: np.ndarray) -> tuple[float, float, float]:
    """WGS-84 ECEF -> (lat deg, lon deg, height m), Bowring's method."""
    a, f = 6378137.0, 1.0 / 298.257223563
    b = a * (1 - f)
    e2 = f * (2 - f)
    x, y, z = pos
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    if p < 1e-9:
        lat = np.sign(z) * np.pi / 2
        return float(np.degrees(lat)), float(np.degrees(lon)), float(abs(z) - b)
    theta = np.arctan2(z * a, p * b)
    ep2 = (a * a - b * b) / (b * b)
    lat = np.arctan2(
        z + ep2 * b * np.sin(theta) ** 3,
        p - e2 * a * np.cos(theta) ** 3,
    )
    n = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    h = p / np.cos(lat) - n
    return float(np.degrees(lat)), float(np.degrees(lon)), float(h)


def solve_pvt(
    pseudoranges_m: Sequence[float],
    ephemerides: Sequence[Ephemeris],
    transmit_times_s: Sequence[float],
    initial_position: Optional[np.ndarray] = None,
    max_iterations: int = 10,
    tol_m: float = 1e-4,
) -> Optional[PvtSolution]:
    """Iterated least squares over [x, y, z, c*dt_rx].

    ``transmit_times_s``: GPS seconds-of-week at which each satellite
    transmitted the measured code epoch (from decoded TOW + code phase).
    """
    n = len(pseudoranges_m)
    if n < 4:
        return None
    pr = np.asarray(pseudoranges_m, dtype=np.float64)
    cc = C.SPEED_OF_LIGHT_M_S

    # per-constellation clock columns: mixing systems adds one receiver
    # clock unknown per system (absorbs GPS-GST/BDT/GLONASST offsets)
    systems = [getattr(e, "system", "gps") for e in ephemerides]
    sys_list = list(dict.fromkeys(systems))       # stable order
    sys_idx = np.array([sys_list.index(s) for s in systems])
    n_sys = len(sys_list)
    n_unk = 3 + n_sys
    if n < n_unk:
        return None

    sat_pos = np.zeros((n, 3))
    sat_clk = np.zeros(n)
    for k in range(n):
        pos, _, clk = satellite_position(ephemerides[k], transmit_times_s[k])
        sat_pos[k] = pos
        sat_clk[k] = clk

    def model(x):
        rho = np.zeros(n)
        h = np.zeros((n, n_unk))
        for k in range(n):
            # Sagnac: rotate satellite into the ECEF frame at reception
            tof = np.linalg.norm(sat_pos[k] - x[:3]) / cc
            p_rot = _rot_z(C.OMEGA_E_DOT_RAD_S * tof) @ sat_pos[k]
            d = p_rot - x[:3]
            r = np.linalg.norm(d)
            rho[k] = r + x[3 + sys_idx[k]] - cc * sat_clk[k]
            h[k, :3] = -d / r
            h[k, 3 + sys_idx[k]] = 1.0
        return rho, h

    x = np.zeros(n_unk)
    if initial_position is not None:
        x[:3] = initial_position
    it = 0
    for it in range(1, max_iterations + 1):
        rho, h = model(x)
        dz = pr - rho
        dx, *_ = np.linalg.lstsq(h, dz, rcond=None)
        x += dx
        if np.linalg.norm(dx[:3]) < tol_m:
            break

    # residuals/GDOP of the FINAL iterate, not the pre-update one
    rho, h = model(x)
    residuals = pr - rho
    try:
        cov = np.linalg.inv(h.T @ h)
        gdop = float(np.sqrt(np.trace(cov)))
    except np.linalg.LinAlgError:
        gdop = float("inf")
    lat, lon, hgt = ecef_to_geodetic(x[:3])
    return PvtSolution(
        position_ecef_m=x[:3].copy(),
        clock_bias_m=float(x[3]),
        residuals_m=residuals,
        gdop=gdop,
        n_iterations=it,
        latitude_deg=lat,
        longitude_deg=lon,
        height_m=hgt,
        clock_bias_by_system_m={
            s: float(x[3 + j]) for j, s in enumerate(sys_list)
        },
    )


def pseudoranges_from_tracking(
    tow_s: dict[int, float],
    code_phase_s: dict[int, float],
    reception_offset_s: float = 0.068,
) -> tuple[list[int], list[float], list[float]]:
    """Form pseudoranges from per-PRN transmit times (decoded TOW +
    elapsed code periods + code phase) using the common-reception-time
    convention: all channels are sampled at the same receiver epoch, the
    receiver clock sets an arbitrary common bias (estimated by PVT).

    ``tow_s``: per PRN, the GPS time of the tracked code-period boundary.
    ``code_phase_s``: per PRN, sub-period refinement (0 if at boundary).
    Returns (prns, pseudoranges_m, transmit_times_s).
    """
    prns = sorted(tow_s)
    tx = {p: tow_s[p] + code_phase_s.get(p, 0.0) for p in prns}
    t_ref = max(tx.values()) + reception_offset_s
    pr = [
        (t_ref - tx[p]) * C.SPEED_OF_LIGHT_M_S for p in prns
    ]
    return prns, pr, [tx[p] for p in prns]


def solve_velocity(
    doppler_hz: Sequence[float],
    ephemerides: Sequence[Ephemeris],
    transmit_times_s: Sequence[float],
    receiver_position: np.ndarray,
    carrier_freq_hz: float = 1_575_420_000.0,
) -> Optional[tuple[np.ndarray, float]]:
    """Receiver velocity + clock drift from carrier Doppler observables.

    Beyond-reference capability (completes the V in PVT). Model per
    satellite: -lambda * doppler = (v_sat - v_rx) . los + c * drift_dot,
    where los is the unit satellite->receiver line of sight. Returns
    (velocity_ecef_m_s [3], clock_drift_s_s) or None with <4 satellites.
    """
    n = len(doppler_hz)
    if n < 4:
        return None
    lam = C.SPEED_OF_LIGHT_M_S / carrier_freq_hz
    h = np.zeros((n, 4))
    z = np.zeros(n)
    for k in range(n):
        pos, vel, _ = satellite_position(ephemerides[k], transmit_times_s[k])
        los = receiver_position - pos
        los = los / np.linalg.norm(los)
        # measured range rate from Doppler (positive doppler = closing)
        rr_meas = -doppler_hz[k] * lam
        # rr = (v_rx - v_sat) . los + c*drift
        z[k] = rr_meas - np.dot(-vel, los)
        h[k, :3] = los
        h[k, 3] = 1.0
    sol, *_ = np.linalg.lstsq(h, z, rcond=None)
    return sol[:3], float(sol[3] / C.SPEED_OF_LIGHT_M_S)
