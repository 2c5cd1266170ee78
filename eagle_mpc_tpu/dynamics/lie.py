"""Lie-group primitives: quaternions, SO(3) and SE(3) exp/log maps.

TPU-native building blocks for the state manifold of a floating-base robot.
Conventions follow Pinocchio (the dynamics library used by the reference
eagle-mpc stack, see /root/reference/src/trajectory.cpp:29-31):

- Quaternions are stored ``(x, y, z, w)`` (Pinocchio / YAML order, see e.g.
  /root/reference/yaml/iris/trajectories/hover.yaml "orientation" comments).
- The free-flyer tangent is a *local* (body-frame) twist ``[v, w]`` with the
  linear part first.
- ``exp6`` / ``log6`` are the full SE(3) exponential/logarithm (translation
  and rotation coupled), matching ``pinocchio::integrate`` /
  ``pinocchio::difference`` for a free-flyer joint.

All functions are pure jnp, dtype-polymorphic (f32 on TPU, f64 on the CPU
validation path) and autodiff-safe at the identity (Taylor-guarded branches
use the "double where" trick so gradients stay finite at theta ~ 0).
"""

from __future__ import annotations

import jax.numpy as jnp

# Threshold below which Taylor expansions replace the closed forms. Generous
# enough for f32: theta^2 < 1e-8 keeps the dropped terms below f32 epsilon.
_EPS2 = 1e-8


def _safe_nonzero(x):
    """Return x where |x| is large enough, else 1.0 (avoids NaN gradients)."""
    return jnp.where(x < _EPS2, jnp.ones_like(x), x)


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    """Hamilton product; rotation composition R(q1 * q2) = R(q1) @ R(q2)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (body -> world if q is base pose)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_rot(q):
    """Quaternion -> 3x3 rotation matrix (unit q assumed)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(R):
    """3x3 rotation matrix -> quaternion (x, y, z, w); branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, one per dominant diagonal term.
    def cand(a, b, c, d, s):
        # s = 4 * q_k^2 (guaranteed > 0 on its branch); returns unnormalized q
        return jnp.stack([a, b, c, d], axis=-1) / jnp.sqrt(_safe_nonzero(s))[..., None]

    s_w = 1.0 + tr
    q_w = cand(m21 - m12, m02 - m20, m10 - m01, s_w, s_w)
    s_x = 1.0 + m00 - m11 - m22
    q_x = cand(s_x, m01 + m10, m02 + m20, m21 - m12, s_x)
    s_y = 1.0 - m00 + m11 - m22
    q_y = cand(m01 + m10, s_y, m12 + m21, m02 - m20, s_y)
    s_z = 1.0 - m00 - m11 + m22
    q_z = cand(m02 + m20, m12 + m21, s_z, m10 - m01, s_z)

    scores = jnp.stack([s_w, s_x, s_y, s_z], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :] * 0.5
    return quat_normalize(q)


def quat_exp(w):
    """Exponential map R^3 -> unit quaternion (rotation vector w)."""
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)
    t = jnp.sqrt(_safe_nonzero(t2))
    small = t2 < _EPS2
    # sin(t/2)/t and cos(t/2), Taylor-guarded
    sinc_half = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(0.5 * t) / t)
    cos_half = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(0.5 * t))
    return jnp.concatenate([w * sinc_half, cos_half], axis=-1)


def quat_log(q):
    """Logarithm map unit quaternion -> rotation vector (matches log3)."""
    qv = q[..., :3]
    qw = q[..., 3]
    # Force the shortest path (qw >= 0).
    sign = jnp.where(qw >= 0, 1.0, -1.0)
    qv = qv * sign[..., None]
    qw = qw * sign
    n2 = jnp.sum(qv * qv, axis=-1)
    n = jnp.sqrt(_safe_nonzero(n2))
    angle = 2.0 * jnp.arctan2(n, qw)
    # w = angle * qv / n, guarded: for small n, angle/n -> 2/qw (Taylor)
    qw_safe = jnp.maximum(qw, 0.5)
    small_scale = 2.0 / qw_safe * (1.0 - n2 / (3.0 * qw_safe * qw_safe))
    scale = jnp.where(n2 < _EPS2, small_scale, angle / n)
    return qv * scale[..., None]


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(w):
    """R^3 -> so(3) skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1
    ).reshape(w.shape[:-1] + (3, 3))


def exp3(w):
    """Rotation vector -> rotation matrix (Rodrigues, Taylor-guarded)."""
    t2 = jnp.sum(w * w, axis=-1)
    t2s = _safe_nonzero(t2)
    t = jnp.sqrt(t2s)
    small = t2 < _EPS2
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)          # sin t / t
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)  # (1-cos t)/t^2
    W = hat(w)
    I = jnp.eye(3, dtype=w.dtype)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def log3(R):
    """Rotation matrix -> rotation vector (via quaternion, autodiff-safe)."""
    return quat_log(rot_to_quat(R))


# ---------------------------------------------------------------------------
# SE(3): poses as (p: 3-vector, q: quaternion)
# ---------------------------------------------------------------------------

def _v_coeffs(w, dtype):
    """Coefficients of V(w) = I + b*W + c*W^2 with W = hat(w)."""
    t2 = jnp.sum(w * w, axis=-1)
    t2s = _safe_nonzero(t2)
    t = jnp.sqrt(t2s)
    small = t2 < _EPS2
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (t2s * t))
    return b, c


def exp6(xi):
    """SE(3) exponential of a twist xi = [v, w] -> (p, quat).

    p = V(w) v with V = I + (1-cos t)/t^2 W + (t - sin t)/t^3 W^2.
    """
    v = xi[..., :3]
    w = xi[..., 3:]
    b, c = _v_coeffs(w, xi.dtype)
    W = hat(w)
    I = jnp.eye(3, dtype=xi.dtype)
    V = I + b[..., None, None] * W + c[..., None, None] * (W @ W)
    p = jnp.einsum("...ij,...j->...i", V, v)
    return p, quat_exp(w)


def log6(p, q):
    """SE(3) logarithm of (p, quat) -> twist [v, w]; inverse of exp6."""
    w = quat_log(q)
    t2 = jnp.sum(w * w, axis=-1)
    t2s = _safe_nonzero(t2)
    t = jnp.sqrt(t2s)
    small = t2 < _EPS2
    # V^{-1} = I - W/2 + d * W^2 with d = (1 - t*cos(t/2)/(2 sin(t/2))) / t^2
    half = 0.5 * t
    d = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(jnp.where(small, jnp.ones_like(half), half))) / t2s,
    )
    W = hat(w)
    I = jnp.eye(3, dtype=p.dtype)
    Vinv = I - 0.5 * W + d[..., None, None] * (W @ W)
    v = jnp.einsum("...ij,...j->...i", Vinv, p)
    return jnp.concatenate([v, w], axis=-1)


def se3_mul(p1, q1, p2, q2):
    """Compose two poses: M1 * M2."""
    return p1 + quat_rotate(q1, p2), quat_normalize(quat_mul(q1, q2))


def se3_inv(p, q):
    qi = quat_conj(q)
    return -quat_rotate(qi, p), qi


def se3_interpolate(p0, q0, p1, q1, alpha):
    """Geodesic interpolation M0 * exp6(alpha * log6(M0^-1 M1)).

    Matches ``pinocchio::interpolate`` for a free-flyer joint
    (/root/reference/src/mpc-controllers/carrot-mpc.cpp:393-395).
    """
    pi, qi = se3_inv(p0, q0)
    dp, dq = se3_mul(pi, qi, p1, q1)
    xi = log6(dp, dq)
    ep, eq = exp6(alpha * xi)
    return se3_mul(p0, q0, ep, eq)
