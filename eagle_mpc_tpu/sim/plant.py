"""Aerial plant simulator: the reference's ``AerialSimulator``
(/root/reference/bindings/python/eagle_mpc/utils/simulator.py) as a pure
jittable step — RK4 integration of the same multibody dynamics at a finer
dt, driven by SQUASHED controls (no squashing model in the plant).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import specs as cspecs
from ..dynamics import rbd
from ..dynamics.model import RobotModel
from ..dynamics.state import State
from ..ocp import actuation as act


@dataclasses.dataclass(frozen=True)
class AerialSimulator:
    """RK4 plant. ``step(x, u)`` is pure; scan it for a rollout."""

    model: RobotModel
    tau_f: tuple                  # nested tuples (hashable)
    dt: float                     # seconds

    @classmethod
    def from_platform(cls, model: RobotModel, platform: cspecs.PlatformParams,
                      dt_ms: float) -> "AerialSimulator":
        return cls(model=model, tau_f=tuple(map(tuple, platform.tau_f)),
                   dt=dt_ms / 1000.0)

    @property
    def state(self) -> State:
        return State(self.model.nq, self.model.nv)

    def _accel(self, x, u):
        st = self.state
        tau_f = jnp.asarray(np.asarray(self.tau_f), dtype=x.dtype)
        tau = act.actuation_tau(tau_f, u)
        return rbd.fwd_dynamics(self.model, x[: st.nq], x[st.nq :], tau)

    def step(self, x, u):
        """One RK4 step on the state manifold (crocoddyl
        IntegratedActionModelRK4 formula, matching the reference plant)."""
        st = self.state
        dt = self.dt

        def k(xi):
            return jnp.concatenate([xi[st.nq :], self._accel(xi, u)])

        k0 = k(x)
        k1 = k(st.integrate(x, k0 * (dt / 2)))
        k2 = k(st.integrate(x, k1 * (dt / 2)))
        k3 = k(st.integrate(x, k2 * dt))
        dx = (k0 + 2 * k1 + 2 * k2 + k3) * (dt / 6)
        return st.integrate(x, dx)

    def rollout(self, x0, us):
        """Scan ``step`` over a control sequence; returns states (N+1, nx)."""

        def f(x, u):
            xn = self.step(x, u)
            return xn, xn

        _, xs = jax.lax.scan(f, x0, us)
        return jnp.concatenate([x0[None], xs], axis=0)
