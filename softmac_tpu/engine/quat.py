"""Quaternion and rotation utilities (batched, pure jnp).

Semantics follow the reference's Taichi helpers
(``softmac/engine/primitive/primitive_utils.py:8-47`` and the rotation
conversions in ``softmac/engine/rigid_simulator.py:274-353``), re-derived as
vectorized JAX functions. Quaternions are ``(w, x, y, z)``. All functions
broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q.  q: (..., 4), v: (..., 3)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*r, renormalized (the reference normalizes to avoid
    drift, ``primitive_utils.py:27``)."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    out = jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )
    return out / jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + _EPS)


def w2quat(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (rotation vector) to quaternion, safe at zero angle."""
    theta = jnp.sqrt(jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True) + _EPS)
    v = (axis_angle / theta) * jnp.sin(theta / 2.0)
    w = jnp.cos(theta / 2.0)
    return jnp.concatenate([w, v], axis=-1)


exp2quat = w2quat


def quat2w(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion to rotation vector (log map).

    The epsilon inside the sqrt keeps both the value and the GRADIENT smooth
    at the identity (scale -> 2 naturally as sin_half -> sqrt(eps); a
    where-based guard would leak NaN through the untaken branch)."""
    q = qnormalize(q)
    sin_half = jnp.sqrt(
        jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True) + 1e-24)
    half = jnp.arctan2(sin_half, q[..., :1])
    return q[..., 1:] * (2.0 * half / sin_half)


quat2exp = quat2w


def inv_trans(pos: jnp.ndarray, position: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """World point -> body-local frame (reference ``primitive_utils.py:43-46``)."""
    inv_quat = qnormalize(qconj(rotation))
    return qrot(inv_quat, pos - position)


def quat2mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion to rotation matrix, (..., 3, 3)."""
    q = qnormalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat2quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix to quaternion, branch-free (Shepperd's method via
    jnp.where so it is differentiable and batch-safe)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate solutions, pick the numerically best
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)

    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    c1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)

    s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
    c2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)

    s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
    c3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, c0, jnp.where(cond1, c1, jnp.where(cond2, c2, c3)))
    return qnormalize(q)


def rpy2mat(rpy) -> jnp.ndarray:
    """URDF roll-pitch-yaw (fixed XYZ) to rotation matrix."""
    r, p, y = rpy
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    rz = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    ry = jnp.array([[cp, 0, sp], [0, 1.0, 0], [-sp, 0, cp]])
    rx = jnp.array([[1.0, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return rz @ ry @ rx
