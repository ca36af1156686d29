"""Batched pinhole camera ops.

Functional, fully-batched equivalents of the reference's camera math
(/root/reference/smplify/loss.py:22-43 `perspective_projection`,
apps/genebody_fitting.py:134-138 crop-time intrinsics adjustment).
Where the reference loops over views in Python, these functions take a view
axis and are `vmap`/`jit` friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def world_to_camera(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply a rigid world→camera transform.

    points: ``[..., N, 3]``, R: ``[..., 3, 3]``, t: ``[..., 3]``.
    """
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def perspective_projection(
    points: jax.Array, R: jax.Array, t: jax.Array, K: jax.Array
) -> jax.Array:
    """Project 3D world points to pixel coordinates.

    Matches the reference pipeline (loss.py:22-43): ``K @ (R x + t)`` followed
    by the perspective divide; returns ``[..., N, 2]`` pixel coords.

    Args:
      points: ``[..., N, 3]`` world-space points.
      R: ``[..., 3, 3]`` world→camera rotation.
      t: ``[..., 3]`` world→camera translation.
      K: ``[..., 3, 3]`` intrinsics.
    """
    cam = world_to_camera(points, R, t)
    proj = jnp.einsum("...ij,...nj->...ni", K, cam)
    return proj[..., :2] / proj[..., 2:3]


def invert_rigid(T: jax.Array) -> jax.Array:
    """Invert ``[..., 4, 4]`` rigid transforms analytically (R^T, -R^T t).

    The reference calls a general ``torch.inverse`` on c2w matrices
    (smplify.py:135); the closed form is cheaper and exactly orthogonal.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(t_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def adjust_intrinsics_for_crop(
    K: jax.Array,
    top: jax.Array,
    left: jax.Array,
    bottom: jax.Array,
    right: jax.Array,
    out_size: int,
) -> jax.Array:
    """Adjust intrinsics for a crop ``[top:bottom, left:right]`` resized to
    ``out_size`` squared (reference apps/genebody_fitting.py:134-138).

    Works on scalars or batched crop boxes.
    """
    K = jnp.asarray(K, dtype=jnp.float32)
    sx = out_size / (right - left)
    sy = out_size / (bottom - top)
    K = K.at[..., 0, 2].add(-left)
    K = K.at[..., 1, 2].add(-top)
    K = K.at[..., 0, :].multiply(sx[..., None] if jnp.ndim(sx) else sx)
    K = K.at[..., 1, :].multiply(sy[..., None] if jnp.ndim(sy) else sy)
    return K


def look_at_extrinsics(eye: jax.Array, center: jax.Array, up: jax.Array) -> jax.Array:
    """Build ``[..., 4, 4]`` world→camera extrinsics for a camera at ``eye``
    looking at ``center`` (OpenCV convention: +z forward, +y down).

    Used to generate ring cameras around a scan, replacing
    /root/reference/utils/renderer.py:7-25.
    """
    fwd = center - eye
    fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True).clip(1e-8)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True).clip(1e-8)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=-2)  # rows
    t = -jnp.einsum("...ij,...j->...i", R, eye)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def ring_cameras(
    num_views: int,
    center: jax.Array,
    radius: float,
    height: float = 0.0,
    up: tuple = (0.0, 1.0, 0.0),
) -> jax.Array:
    """``[num_views, 4, 4]`` world→camera extrinsics on a ring around
    ``center`` (replaces utils/renderer.py:7-25 `gen_cam_views`)."""
    angles = jnp.linspace(0.0, 2.0 * jnp.pi, num_views, endpoint=False)
    eyes = jnp.stack(
        [
            center[0] + radius * jnp.sin(angles),
            center[1] + height + jnp.zeros_like(angles),
            center[2] + radius * jnp.cos(angles),
        ],
        axis=-1,
    )
    up_v = jnp.broadcast_to(jnp.asarray(up), eyes.shape)
    return look_at_extrinsics(eyes, jnp.broadcast_to(center, eyes.shape), up_v)
