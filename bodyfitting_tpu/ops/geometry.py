"""Camera/keypoint geometry estimation utilities.

JAX equivalents of the reference's utils/geometry.py extras: the weighted
least-squares translation estimator (geometry.py:183-246) — fully batched,
no per-example Python loop — and the crop<->global camera translation
transfers (geometry.py:496-530).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bodyfitting_tpu.constants import FOCAL_LENGTH, IMG_RES


def estimate_translation_single(
    S: jax.Array,
    joints_2d: jax.Array,
    joints_conf: jax.Array,
    focal_length: float = FOCAL_LENGTH,
    img_size: float = IMG_RES,
) -> jax.Array:
    """Weighted LS camera translation for one set of joints.

    Solves ``min_t sum_k w_k || project(S_k + t) - x_k ||^2`` linearised the
    same way as the reference (geometry.py:183-220): unknowns (tx, ty, tz)
    with rows ``f*tx + (cx - u_k)*tz = (u_k - cx) Z_k - f X_k`` etc.

    S ``[K, 3]``, joints_2d ``[K, 2]``, joints_conf ``[K]`` -> ``[3]``.
    """
    K = S.shape[0]
    f = jnp.full((K, 2), focal_length, S.dtype)
    center = jnp.full((K, 2), img_size / 2.0, S.dtype)

    Z = jnp.repeat(S[:, 2:3], 2, axis=1).reshape(-1)     # [2K]
    XY = S[:, :2].reshape(-1)
    O = center.reshape(-1)
    F = f.reshape(-1)
    x = joints_2d.reshape(-1)
    w = jnp.repeat(jnp.sqrt(jnp.maximum(joints_conf, 0.0)), 2)

    ex = jnp.tile(jnp.asarray([1.0, 0.0], S.dtype), K)
    ey = jnp.tile(jnp.asarray([0.0, 1.0], S.dtype), K)
    Q = jnp.stack([F * ex, F * ey, O - x], axis=1)        # [2K, 3]
    c = (x - O) * Z - F * XY

    Qw = Q * w[:, None]
    cw = c * w
    A = Qw.T @ Qw
    b = Qw.T @ cw
    return jnp.linalg.solve(A + 1e-8 * jnp.eye(3, dtype=S.dtype), b)


def estimate_translation(
    S: jax.Array,
    joints_2d_conf: jax.Array,
    focal_length: float = FOCAL_LENGTH,
    img_size: float = IMG_RES,
    use_gt_joints_only: bool = True,
) -> jax.Array:
    """Batched translation estimation (reference geometry.py:222-246).

    S ``[B, J, 3]``; joints_2d_conf ``[B, J, 3]`` (u, v, conf).  With
    ``use_gt_joints_only`` (the reference default) only SPIN joints 25:
    are used.
    """
    if use_gt_joints_only:
        S = S[:, 25:]
        joints_2d_conf = joints_2d_conf[:, 25:]
    return jax.vmap(
        lambda s, j: estimate_translation_single(
            s, j[:, :2], j[:, 2], focal_length, img_size
        )
    )(S, joints_2d_conf)


def crop_to_global_translation(
    cam_t: jax.Array,
    zoom_scale: float,
    crop_center: jax.Array,
    crop_scale: float,
    K: jax.Array,
    virtual_focal: float = FOCAL_LENGTH,
) -> jax.Array:
    """HMR crop-frame camera translation -> full-image frame
    (reference get_global_camera_translation, geometry.py:496-505)."""
    cx, cy, fx = K[0, 2], K[1, 2], K[0, 0]
    scale = 1.0 / virtual_focal / crop_scale / 200.0 * IMG_RES
    shift = jnp.stack([
        (crop_center[0] - cx) * scale, (crop_center[1] - cy) * scale,
        jnp.zeros(()),
    ])
    out = cam_t + shift * cam_t[2]
    return out * jnp.stack(
        [jnp.ones(()), jnp.ones(()), fx * scale]
    ) * zoom_scale


def global_to_crop_translation(
    cam_t_global: jax.Array,
    zoom_scale: float,
    crop_center: jax.Array,
    crop_scale: float,
    K: jax.Array,
    virtual_focal: float = FOCAL_LENGTH,
) -> jax.Array:
    """Inverse of :func:`crop_to_global_translation`
    (reference geometry.py:521-530)."""
    cx, cy, fx = K[0, 2], K[1, 2], K[0, 0]
    scale = 1.0 / virtual_focal / crop_scale / 200.0 * IMG_RES
    out = cam_t_global / jnp.stack(
        [jnp.ones(()), jnp.ones(()), fx * scale]
    ) / zoom_scale
    shift = jnp.stack([
        (crop_center[0] - cx) * scale, (crop_center[1] - cy) * scale,
        jnp.zeros(()),
    ])
    return out - shift * out[2]
