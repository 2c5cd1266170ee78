"""Misc tools: motor-command conversion, mission metrics, result logging.

Covers the reference's ``Tools`` (thrust -> prop speed,
/root/reference/src/utils/tools.cpp) and the Python ``tools.py`` helpers
(waypoint arrays, mission state errors, pickle logs,
/root/reference/bindings/python/eagle_mpc/utils/tools.py).
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import numpy as np

from ..config.specs import PlatformParams
from ..dynamics import lie


def thrust_to_speed(thrust, platform: PlatformParams):
    """Rotor thrust [N] -> prop angular speed [rad/s]: w = sqrt(T / cf)
    (reference Tools::thrustToSpeed)."""
    return np.sqrt(np.maximum(np.asarray(thrust, dtype=float), 0.0) / platform.cf)


def thrust_to_speed_normalized(thrust, platform: PlatformParams):
    """Thrust -> normalized [-1, 1] motor command over the platform's prop
    speed range (PX4-style; reference Tools::thrustToSpeedNormalized)."""
    w = thrust_to_speed(thrust, platform)
    lo, hi = platform.min_prop_speed, platform.max_prop_speed
    return (2.0 * w - (hi + lo)) / (hi - lo)


def state_error(x, x_ref, nq: int):
    """(pos err, rot err, vlin err, vang err) norms between two states."""
    e_pos = np.linalg.norm(np.asarray(x[:3]) - np.asarray(x_ref[:3]))
    R = np.asarray(lie.quat_to_rot(np.asarray(x[3:7])))
    Rr = np.asarray(lie.quat_to_rot(np.asarray(x_ref[3:7])))
    e_rot = np.linalg.norm(np.asarray(lie.log3(Rr.T @ R)))
    v = np.asarray(x[nq:])
    vr = np.asarray(x_ref[nq:])
    e_vlin = np.linalg.norm(v[:3] - vr[:3])
    e_vang = np.linalg.norm(v[3:6] - vr[3:6])
    return np.array([e_pos, e_rot, e_vlin, e_vang])


def mission_errors(xs, refs, nq: int):
    """Per-knot 4-row error array vs a reference state sequence
    (computeMissionStateError analog, vectorized over the trajectory)."""
    return np.stack([state_error(x, r, nq) for x, r in zip(xs, refs)], axis=1)


def save_logfile(filename: str, xs, us, us_squash=None, dt: float = 0.0,
                 costs=None, iters=None, forces=None, extras: Optional[dict] = None):
    """Persist a solve/closed-loop log (reference saveLogfile; pickle for
    compatibility — arrays convert cleanly)."""
    data = {
        "xs": np.asarray(xs), "us": np.asarray(us),
        "us_squash": None if us_squash is None else np.asarray(us_squash),
        "dt": dt,
        "costs": None if costs is None else np.asarray(costs),
        "iters": None if iters is None else np.asarray(iters),
        "forces": None if forces is None else np.asarray(forces),
    }
    if extras:
        data.update(extras)
    with open(filename, "wb") as f:
        pickle.dump(data, f)


def load_logfile(filename: str) -> dict:
    with open(filename, "rb") as f:
        return pickle.load(f)
