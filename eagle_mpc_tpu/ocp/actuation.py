"""Actuation and control squashing.

TPU-native equivalents of ``crocoddyl::ActuationModelMultiCopterBase``,
``SquashingModelSmoothSat`` and ``ActuationSquashingModel`` as instantiated by
the reference (/root/reference/src/trajectory.cpp:47-52). Pure functions:
the solver composes them; the squash smoothness is a runtime parameter so the
SbFDDP homotopy never retraces.
"""

from __future__ import annotations

import jax.numpy as jnp


def actuation_tau(tau_f, u):
    """Map controls to generalized forces.

    u = [rotor thrusts (n_rotors), arm joint torques (nj)];
    tau = [tau_f @ u_rotors (6-D base wrench, local frame); joint torques].
    The base is underactuated for flat-rotor platforms (no lateral force
    rows) and fully actuated for tilted-rotor ones (rank-6 tau_f).
    """
    n_rotors = tau_f.shape[1]
    base = tau_f @ u[..., :n_rotors]
    return jnp.concatenate([base, u[..., n_rotors:]], axis=-1)


def smooth_sat(s, lb, ub, smooth):
    """Smooth saturation u = squash(s): differentiable box clamp.

        d = smooth * (ub - lb);  a = d^2
        u = 0.5 * (sqrt(a + (s-lb)^2) - sqrt(a + (s-ub)^2) + lb + ub)

    Limits: s -> -inf gives lb, s -> +inf gives ub; ``smooth`` controls the
    corner radius and is annealed by the SbFDDP homotopy
    (/root/reference/src/sbfddp.cpp:462, smooth_init=0.1, x0.5 per stage).
    """
    d = smooth * (ub - lb)
    a = d * d
    return 0.5 * (
        jnp.sqrt(a + (s - lb) ** 2) - jnp.sqrt(a + (s - ub) ** 2) + lb + ub
    )


def barrier_quad_weights(s_lb, s_ub, smooth):
    """Weights of the SbFDDP squash-barrier cost: 1 / (smooth*(ub-lb))^2
    (/root/reference/src/sbfddp.cpp:22-24,466-468)."""
    d = smooth * (s_ub - s_lb)
    return 1.0 / (d * d)
