"""Struct-of-arrays 3-vector / 3x3-matrix math for TPU.

Why: per-particle tensors shaped (N, 3) / (N, 3, 3) put tiny dims in the TPU
tile's minor (sublane x lane) positions, so every materialization pads 3 -> 128
lanes (42x) and every ``.at[...].set`` becomes a multi-MB dynamic-update-slice
(measured ~0.5 ms each — the dominant cost of a naive substep). Here vectors
are tuples ``(x, y, z)`` and matrices tuples-of-tuples of (N,) arrays: all ops
are elementwise on lane-aligned 1-D arrays, which XLA fuses into a handful of
VPU kernels with zero padding waste.

Convention: a "vec" is ``(a0, a1, a2)``; a "mat" is ``((a00,a01,a02), ...)``
rows-first. Entries may be jnp arrays of any (broadcast-compatible) shape or
python scalars.
"""
from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------- builders
def vec(a, b, c):
    return (a, b, c)


def mat_rows(r0, r1, r2):
    return (r0, r1, r2)


def identity():
    return ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))


def zeros_vec():
    return (0.0, 0.0, 0.0)


def from_vec_array(a):
    """(3, N) array (or (N,3) with axis=-1... caller slices) -> vec tuple."""
    return (a[0], a[1], a[2])


def to_vec_array(v):
    return jnp.stack(jnp.broadcast_arrays(*v))


def from_mat_array(m):
    """(3, 3, N) array -> mat tuple."""
    return tuple(tuple(m[i, j] for j in range(3)) for i in range(3))


def to_mat_array(m):
    flat = jnp.broadcast_arrays(*[m[i][j] for i in range(3) for j in range(3)])
    return jnp.stack(flat).reshape((3, 3) + flat[0].shape)


# ---------------------------------------------------------------- vector ops
def vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def vscale(a, s):
    return tuple(x * s for x in a)


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def norm(a, eps=0.0):
    return jnp.sqrt(dot(a, a) + eps)


def vwhere(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


# ---------------------------------------------------------------- matrix ops
def mmul(A, B):
    return tuple(
        tuple(
            A[i][0] * B[0][j] + A[i][1] * B[1][j] + A[i][2] * B[2][j]
            for j in range(3)
        )
        for i in range(3)
    )


def mvec(A, v):
    return tuple(A[i][0] * v[0] + A[i][1] * v[1] + A[i][2] * v[2] for i in range(3))


def mt(A):
    return tuple(tuple(A[j][i] for j in range(3)) for i in range(3))


def madd(A, B):
    return tuple(tuple(A[i][j] + B[i][j] for j in range(3)) for i in range(3))


def msub(A, B):
    return tuple(tuple(A[i][j] - B[i][j] for j in range(3)) for i in range(3))


def mscale(A, s):
    return tuple(tuple(A[i][j] * s for j in range(3)) for i in range(3))


def madd_diag(A, s):
    """A + s * I."""
    return tuple(
        tuple(A[i][j] + (s if i == j else 0.0) for j in range(3)) for i in range(3)
    )


def outer(a, b):
    return tuple(tuple(a[i] * b[j] for j in range(3)) for i in range(3))


def det(A):
    return (
        A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1])
        - A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0])
        + A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0])
    )


def mwhere(c, A, B):
    return tuple(
        tuple(jnp.where(c, A[i][j], B[i][j]) for j in range(3)) for i in range(3)
    )


def col(A, j):
    return (A[0][j], A[1][j], A[2][j])


def from_cols(c0, c1, c2):
    return tuple((c0[i], c1[i], c2[i]) for i in range(3))


def diag_mat(d):
    return ((d[0], 0.0, 0.0), (0.0, d[1], 0.0), (0.0, 0.0, d[2]))


# ---------------------------------------------------------------- quaternion
def qrot(q, v):
    """Rotate vec v by quaternion tuple q=(w,x,y,z) of arrays/scalars."""
    qv = (q[1], q[2], q[3])
    uv = cross(qv, v)
    uuv = cross(qv, uv)
    return tuple(v[i] + 2.0 * (q[0] * uv[i] + uuv[i]) for i in range(3))


def qconj(q):
    return (q[0], -q[1], -q[2], -q[3])


def qnorm(q, eps=1e-12):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3] + eps)
    return tuple(x / n for x in q)
