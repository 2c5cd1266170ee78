"""Spatial (6-D) vector algebra for rigid-body dynamics.

Conventions (matching Pinocchio, the dynamics engine the reference stack
delegates to — see SURVEY.md §2b):

- Spatial motion vectors are ``[linear; angular]`` (linear part FIRST).
- Spatial force vectors are ``[force; torque]``.
- All quantities of a body are expressed in that body's LOCAL frame.

Poses are (p, R) pairs: translation 3-vector and 3x3 rotation matrix; the
pose of frame B relative to frame A maps B-coordinates into A-coordinates.

Everything is pure jnp and batch-friendly (leading axes broadcast).
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import hat  # re-export for convenience


def rpy_to_rot(rpy):
    """URDF extrinsic X-Y-Z (roll pitch yaw) -> rotation matrix Rz Ry Rx."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    R = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return R.reshape(rpy.shape[:-1] + (3, 3))


def pose_mul(p1, R1, p2, R2):
    """Compose poses: M1 * M2."""
    return p1 + jnp.einsum("...ij,...j->...i", R1, p2), R1 @ R2


def pose_inv(p, R):
    Rt = jnp.swapaxes(R, -1, -2)
    return -jnp.einsum("...ij,...j->...i", Rt, p), Rt


def motion_to_parent(p, R, m):
    """Map a motion vector expressed in child frame C to parent frame P,
    where (p, R) is the pose of C in P: v_P = R v_C + p x (R w_C)."""
    v, w = m[..., :3], m[..., 3:]
    Rw = jnp.einsum("...ij,...j->...i", R, w)
    Rv = jnp.einsum("...ij,...j->...i", R, v)
    return jnp.concatenate([Rv + jnp.cross(p, Rw), Rw], axis=-1)


def motion_to_child(p, R, m):
    """Map a motion vector expressed in parent frame P to child frame C."""
    v, w = m[..., :3], m[..., 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    wc = jnp.einsum("...ij,...j->...i", Rt, w)
    vc = jnp.einsum("...ij,...j->...i", Rt, v - jnp.cross(p, w))
    return jnp.concatenate([vc, wc], axis=-1)


def force_to_parent(p, R, f):
    """Map a force vector expressed in child frame C to parent frame P:
    f_P = R f_C ; tau_P = R tau_C + p x (R f_C)."""
    fo, tau = f[..., :3], f[..., 3:]
    Rf = jnp.einsum("...ij,...j->...i", R, fo)
    Rt_ = jnp.einsum("...ij,...j->...i", R, tau)
    return jnp.concatenate([Rf, Rt_ + jnp.cross(p, Rf)], axis=-1)


def force_to_child(p, R, f):
    """Map a force vector expressed in parent frame P to child frame C."""
    fo, tau = f[..., :3], f[..., 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    fc = jnp.einsum("...ij,...j->...i", Rt, fo)
    tc = jnp.einsum("...ij,...j->...i", Rt, tau - jnp.cross(p, fo))
    return jnp.concatenate([fc, tc], axis=-1)


def motion_cross(m1, m2):
    """Spatial cross product of two motions (Lie bracket ad_{m1} m2)."""
    v1, w1 = m1[..., :3], m1[..., 3:]
    v2, w2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, v2) + jnp.cross(v1, w2), jnp.cross(w1, w2)], axis=-1
    )


def motion_cross_force(m, f):
    """Dual cross product ad*_{m} f acting on a force vector."""
    v, w = m[..., :3], m[..., 3:]
    fo, tau = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fo), jnp.cross(w, tau) + jnp.cross(v, fo)], axis=-1
    )


def spatial_inertia(mass, com, inertia_c):
    """Build the 6x6 spatial inertia (linear-first convention).

    mass: scalar; com: 3-vector (body frame); inertia_c: 3x3 rotational
    inertia about the COM, expressed in the body frame.

        [ m I3      m hat(c)^T ]
        [ m hat(c)  I_c - m hat(c) hat(c) ]
    """
    mass = jnp.asarray(mass)
    c = jnp.asarray(com)
    Ic = jnp.asarray(inertia_c)
    C = hat(c)
    top = jnp.concatenate([mass * jnp.eye(3, dtype=C.dtype), mass * C.T], axis=-1)
    bot = jnp.concatenate([mass * C, Ic - mass * (C @ C)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_to_parent(p, R, I6):
    """Express a spatial inertia given in child frame C in parent frame P.

    I_P = Ad_{M^{-1}}^T I_C Ad_{M^{-1}} where motion Ad maps P -> C; built
    explicitly from the transform pair for clarity (cost is negligible at
    trace time; these are 6x6 constants per joint).
    """
    # X maps motion P->C. Columns: transform basis vectors.
    eye = jnp.eye(6, dtype=R.dtype)
    X = jnp.stack([motion_to_child(p, R, eye[i]) for i in range(6)], axis=-1)
    return X.T @ I6 @ X
