"""Batched rotation representation conversions, pure JAX.

All functions map over arbitrary leading batch dimensions and are safe at the
axis-angle origin (no NaN gradients at theta=0), which matters because the
fitting loop initialises most pose parameters at exactly zero.

Functional equivalents of the reference's conversion zoo
(/root/reference/utils/geometry.py:60-114,331-493 and smplx's batch_rodrigues),
re-derived from the standard quaternion formulas rather than ported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def rodrigues(aa: jax.Array) -> jax.Array:
    """Axis-angle vectors ``[..., 3]`` to rotation matrices ``[..., 3, 3]``.

    Goes through the unit quaternion, like the reference
    (utils/geometry.py:60-75) and smplx, so tiny-angle behaviour and gradients
    at zero match: ``q = [cos(t/2), sin(t/2) * axis]``.
    """
    angle = jnp.linalg.norm(aa + _EPS, axis=-1, keepdims=True)
    half = angle * 0.5
    axis = aa / angle
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Quaternions ``[..., 4]`` (w, x, y, z) to rotation matrices ``[..., 3, 3]``.

    The quaternion is normalised first, so non-unit inputs are fine.
    """
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(_EPS)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)

    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """Continuous 6D rotation representation ``[..., 6]`` to ``[..., 3, 3]``.

    Zhou et al. CVPR'19 Gram-Schmidt construction (used by the HMR head;
    reference utils/geometry.py:100-114).  The 6 numbers are the first two
    columns of the matrix, column-major like the reference's ``view(-1,3,2)``.
    """
    x = x.reshape(x.shape[:-1] + (3, 2))
    a1 = x[..., 0]
    a2 = x[..., 1]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(_EPS)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(_EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(m: jax.Array) -> jax.Array:
    """Rotation matrices ``[..., 3, 3]`` to the 6D representation ``[..., 6]``."""
    return m[..., :, :2].reshape(m.shape[:-2] + (6,))


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrices ``[..., 3, 3]`` to unit quaternions ``[..., 4]`` (w,x,y,z).

    Branchless Shepperd-style extraction: computes all four candidate
    quaternions and selects the numerically best per element with
    ``jnp.where`` (traceable, vmappable — unlike the reference's masked torch
    version at utils/geometry.py:403-480).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four un-normalised candidates, each a positive multiple of the true
    # quaternion when its pivot is the largest: e.g. with pivot w,
    # 4w[w,x,y,z] = [1+tr, m21-m12, m02-m20, m10-m01] (4w^2 = 1+tr, no sqrt).
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1
    )
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1
    )

    # Pivot choice: trace if positive-ish, else the largest diagonal element.
    cond_tr = (tr > 0.0)[..., None]
    cond_0 = ((m00 > m11) & (m00 > m22))[..., None]
    cond_1 = (m11 > m22)[..., None]

    q = jnp.where(cond_tr, q0, jnp.where(cond_0, q1, jnp.where(cond_1, q2, q3)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    # Canonicalise sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_aa(quat: jax.Array) -> jax.Array:
    """Unit quaternions ``[..., 4]`` (w,x,y,z) to axis-angle ``[..., 3]``."""
    w = jnp.clip(quat[..., 0], -1.0, 1.0)
    xyz = quat[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    # As angle -> 0, aa -> 2 * xyz (first-order), which the safe divide gives.
    scale = jnp.where(sin_half > _EPS, angle / sin_half.clip(_EPS), 2.0)
    return xyz * scale


def rotmat_to_aa(m: jax.Array) -> jax.Array:
    """Rotation matrices ``[..., 3, 3]`` to axis-angle ``[..., 3]``.

    Replaces the reference's rotmat->quat->aa chain with its NaN workaround
    (utils/geometry.py:483-493) by a formulation that is finite everywhere.
    """
    return quat_to_aa(rotmat_to_quat(m))


def rotmat_to_aa_np(m):
    """Host (numpy) mirror of :func:`rotmat_to_aa`, same formulas in f32.

    Exists so host-side *setup* code (per-frame HMR/mean-pose inits in the
    app run loops) never pays an eager device round trip for a [24, 3, 3]
    conversion — over the remote-TPU tunnel each eager op is a ~ms
    dispatch, and the chain here is dozens of ops.  Parity with the jax
    version is pinned by test to float32 rounding.
    """
    import numpy as np

    m = np.asarray(m, np.float32)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    q0 = np.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = np.stack(
        [m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1
    )
    q2 = np.stack(
        [m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1
    )
    q3 = np.stack(
        [m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1
    )
    cond_tr = (tr > 0.0)[..., None]
    cond_0 = ((m00 > m11) & (m00 > m22))[..., None]
    cond_1 = (m11 > m22)[..., None]
    q = np.where(cond_tr, q0, np.where(cond_0, q1, np.where(cond_1, q2, q3)))
    q = (q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), _EPS, None)
         ).astype(np.float32)
    q = q * np.where(q[..., :1] < 0, -1.0, 1.0).astype(np.float32)
    w = np.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = np.linalg.norm(xyz, axis=-1, keepdims=True).astype(np.float32)
    angle = (2.0 * np.arctan2(sin_half[..., 0], w))[..., None]
    scale = np.where(
        sin_half > _EPS, angle / np.clip(sin_half, _EPS, None), 2.0
    ).astype(np.float32)
    return (xyz * scale).astype(np.float32)
