"""State manifold SE(3) x R^n: the TPU-native ``crocoddyl::StateMultibody``.

State layout (pinocchio free-flyer convention, reference usage at
/root/reference/src/trajectory.cpp:47):

    x = [ p (3), quat (x,y,z,w) (4), q_joints (nj) | v_lin, omega, qdot ]
         `------------- q (nq) -------------------'  `------ v (nv) ----'

- Base linear/angular velocities are expressed in the BODY (local) frame.
- ``diff``/``integrate`` use the coupled SE(3) log/exp for the base (matching
  ``pinocchio::difference``/``integrate`` for a free-flyer joint), so the
  solver's tangent space is the same as the reference's.

All functions are pure, dtype-polymorphic, batchable and autodiff-safe; they
are used both directly and through ``jax.jacfwd`` to obtain the manifold
Jacobians the DDP-family solvers need.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import lie


class State(NamedTuple):
    """Static descriptor of the state manifold (hashable; closed over by jit)."""

    nq: int
    nv: int

    @property
    def nx(self) -> int:
        return self.nq + self.nv

    @property
    def ndx(self) -> int:
        return 2 * self.nv

    @property
    def nj(self) -> int:
        return self.nq - 7

    # -- constructors -------------------------------------------------------
    def zero(self, dtype=jnp.float64) -> jnp.ndarray:
        x = np.zeros(self.nx)
        x[6] = 1.0  # identity quaternion (w component)
        return jnp.asarray(x, dtype=dtype)

    def rand(self, rng: np.random.Generator, dtype=jnp.float64) -> jnp.ndarray:
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        x = rng.normal(size=self.nx)
        x[3:7] = q
        return jnp.asarray(x, dtype=dtype)

    # -- manifold ops -------------------------------------------------------
    def integrate(self, x, dx):
        """x (+) dx with dx = [xi_base (6), dq_joints, dv (nv)]."""
        p, quat = x[..., :3], x[..., 3:7]
        qj = x[..., 7 : self.nq]
        v = x[..., self.nq :]
        ep, eq = lie.exp6(dx[..., :6])
        p2, q2 = lie.se3_mul(p, quat, ep, eq)
        return jnp.concatenate(
            [p2, q2, qj + dx[..., 6 : self.nv], v + dx[..., self.nv :]], axis=-1
        )

    def diff(self, x0, x1):
        """x1 (-) x0 in the tangent at x0 (pinocchio ``difference`` order)."""
        p0, q0 = x0[..., :3], x0[..., 3:7]
        p1, q1 = x1[..., :3], x1[..., 3:7]
        ip, iq = lie.se3_inv(p0, q0)
        dp, dq = lie.se3_mul(ip, iq, p1, q1)
        xi = lie.log6(dp, dq)
        return jnp.concatenate(
            [
                xi,
                x1[..., 7 : self.nq] - x0[..., 7 : self.nq],
                x1[..., self.nq :] - x0[..., self.nq :],
            ],
            axis=-1,
        )

    def interpolate_config(self, q0, q1, alpha):
        """Configuration-space interpolation, ``pinocchio::interpolate``
        equivalent (used by the MPC reference-trajectory samplers, see
        /root/reference/src/mpc-controllers/carrot-mpc.cpp:393-395):
        free-flyer joints follow the SE(3) geodesic, others are linear."""
        p, quat = lie.se3_interpolate(
            q0[..., :3], q0[..., 3:7], q1[..., :3], q1[..., 3:7], alpha
        )
        qj = q0[..., 7:] + alpha * (q1[..., 7:] - q0[..., 7:])
        return jnp.concatenate([p, quat, qj], axis=-1)

    def normalize(self, x):
        """Renormalize the quaternion block (drift control in long rollouts)."""
        return x.at[..., 3:7].set(lie.quat_normalize(x[..., 3:7]))
