"""Precomputed distance volumes for fast point-to-mesh queries.

TPU-first acceleration of the scan-fitting losses: the target scan is
*static* for the whole fit, so instead of an O(Q x F) nearest-point sweep
every Adam iteration (the reference re-runs its CUDA grid search per
iteration, smplify/smplify.py:206,239), we precompute — once per scan —

  * a trilinear **unsigned distance volume** and
  * a **nearest-face-index volume**

on a padded uniform grid with the existing blocked nearest-point sweep.
Each fitting iteration then costs O(Q) gathers + lerps.  The gradient of
the interpolated distance w.r.t. the query point approximates the
normalized direction to the surface — exactly the gradient the reference's
``||p - closest.detach()||`` construction produces — and the nearest-face
volume supplies the face normals for the SMPL+D normal loss.

Accuracy is bounded by the cell size (resolution 64-128 gives sub-1% of
the bounding-box diagonal); the exact sweep remains available via
``FitConfig(mesh_loss_impl='exact')``.
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp

from bodyfitting_tpu.ops.nearest import nearest_point_on_mesh


@dataclasses.dataclass(frozen=True)
class DistanceVolume:
    dist: jax.Array        # [R, R, R] unsigned distances
    face_idx: jax.Array    # [R, R, R] int32 nearest face per cell center
    origin: jax.Array      # [3] world position of cell (0,0,0) center
    spacing: jax.Array     # scalar cell size

    @property
    def resolution(self) -> int:
        return self.dist.shape[0]


jax.tree_util.register_dataclass(
    DistanceVolume,
    data_fields=["dist", "face_idx", "origin", "spacing"],
    meta_fields=[],
)


def build_distance_volume(
    verts: jax.Array,
    faces: jax.Array,
    resolution: int = 96,
    padding: float = 0.15,
    face_block: int = 1024,
    point_chunk: int = 65536,
) -> DistanceVolume:
    """One-time exact sweep over all grid cell centers.

    ``padding`` extends the grid beyond the mesh AABB by that fraction of
    the largest extent, so early-iteration query points off the surface
    still land inside the volume.  Points outside the padded grid are
    handled at query time: the interpolated distance at the clamped
    location plus the (world-space) distance from the point to that
    location, so values keep growing and gradients keep pointing inward
    arbitrarily far outside (inside the grid the extra term is
    identically zero).
    """
    vmin = verts.min(axis=0)
    vmax = verts.max(axis=0)
    extent = jnp.max(vmax - vmin)
    pad = extent * padding
    lo = vmin - pad
    hi = vmax + pad
    spacing = jnp.max(hi - lo) / (resolution - 1)
    axes = [lo[i] + spacing * jnp.arange(resolution) for i in range(3)]
    grid = jnp.stack(
        jnp.meshgrid(*axes, indexing="ij"), axis=-1
    ).reshape(-1, 3)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from bodyfitting_tpu.ops.pallas_kernels import (
            build_nearest_index,
            nearest_d2_idx,
        )

        tri = verts[faces]
        index = build_nearest_index(tri)

    dists = []
    fids = []
    for start in range(0, grid.shape[0], point_chunk):
        chunk = grid[start:start + point_chunk]
        if on_tpu:
            d2, fid = nearest_d2_idx(
                chunk, tri, face_block=face_block, index=index
            )
        else:
            _, fid, d2 = nearest_point_on_mesh(
                chunk, verts, faces, face_block=face_block
            )
        dists.append(jnp.sqrt(d2))
        fids.append(fid)
    R = resolution
    return DistanceVolume(
        dist=jnp.concatenate(dists).reshape(R, R, R),
        face_idx=jnp.concatenate(fids).reshape(R, R, R),
        origin=lo,
        spacing=spacing,
    )


def query_distance(volume: DistanceVolume, points: jax.Array) -> jax.Array:
    """Trilinear unsigned distance at ``points [Q, 3]`` (differentiable).

    Separable one-hot form: hinge weights ``max(0, 1-|i-g|)`` per axis
    reproduce the 8 trilinear taps exactly, and the x-axis contraction is
    a ``[Q, R] @ [R, R^2]`` matmul on the MXU.  XLA lowers the naive
    8-tap volume gather to a per-element TPU path that measured **44x
    slower** (105.8 -> 2.4 ms/iter fwd+bwd at Q=10475, R=96 —
    BENCH_NOTES.md).  HIGHEST matmul precision keeps values f32-exact
    (max diff 2e-7 vs the gather form, pinned by test); the extra cost
    over DEFAULT (~0.7 ms) is worth exactness for an optimization target.
    """
    R = volume.resolution
    g_raw = (points - volume.origin) / volume.spacing
    g = jnp.clip(g_raw, 0.0, R - 1 - 1e-5)
    # out-of-volume residual: ||p - clamp(p)|| in world units.  Zero (with
    # zero gradient) inside; outside it restores the inward pull that the
    # clip otherwise kills (d(clip)/dp == 0 past the bounds).
    outside = jnp.sqrt(
        jnp.sum(jnp.square(g_raw - g), axis=-1) + 1e-20
    ) * volume.spacing
    ir = jnp.arange(R, dtype=points.dtype)[None, :]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ir - g[:, 0][:, None]))  # [Q, R]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ir - g[:, 1][:, None]))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(ir - g[:, 2][:, None]))
    vol_flat = volume.dist.reshape(R, R * R)
    vx = jax.lax.dot_general(
        wx, vol_flat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, R, R)                                          # [Q, R, R]
    vy = jnp.sum(vx * wy[:, :, None], axis=1)                    # [Q, R]
    return jnp.sum(vy * wz, axis=-1) + outside


def _query_distance_gather(
    volume: DistanceVolume, points: jax.Array
) -> jax.Array:
    """Reference 8-tap gather trilinear query (slow on TPU; kept as the
    oracle for :func:`query_distance` parity tests)."""
    R = volume.resolution
    g_raw = (points - volume.origin) / volume.spacing
    g = jnp.clip(g_raw, 0.0, R - 1 - 1e-5)
    outside = jnp.sqrt(
        jnp.sum(jnp.square(g_raw - g), axis=-1) + 1e-20
    ) * volume.spacing
    g0 = jnp.floor(g)
    w = g - g0
    i0 = g0.astype(jnp.int32)

    def tap(dx, dy, dz):
        idx = jnp.minimum(i0 + jnp.array([dx, dy, dz]), R - 1)
        return volume.dist[idx[:, 0], idx[:, 1], idx[:, 2]]

    wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
    return (
        tap(0, 0, 0) * (1 - wx) * (1 - wy) * (1 - wz)
        + tap(1, 0, 0) * wx * (1 - wy) * (1 - wz)
        + tap(0, 1, 0) * (1 - wx) * wy * (1 - wz)
        + tap(0, 0, 1) * (1 - wx) * (1 - wy) * wz
        + tap(1, 1, 0) * wx * wy * (1 - wz)
        + tap(1, 0, 1) * wx * (1 - wy) * wz
        + tap(0, 1, 1) * (1 - wx) * wy * wz
        + tap(1, 1, 1) * wx * wy * wz
    ) + outside


def query_nearest_face(volume: DistanceVolume,
                       points: jax.Array) -> jax.Array:
    """Nearest-face index from the cell containing each point (rounded).

    Same separable one-hot trick as :func:`query_distance`, with exact
    0/1 weights (one cell per point): the face indices ride through an
    f32 matmul losslessly (face counts < 2^24), avoiding the slow TPU
    per-element volume gather in the displacement-stage hot loop.
    """
    R = volume.resolution
    g = (points - volume.origin) / volume.spacing
    i = jnp.clip(jnp.round(g), 0, R - 1)
    ir = jnp.arange(R, dtype=points.dtype)[None, :]
    wx = (ir == i[:, 0][:, None]).astype(points.dtype)           # [Q, R]
    wy = (ir == i[:, 1][:, None]).astype(points.dtype)
    wz = (ir == i[:, 2][:, None]).astype(points.dtype)
    vol_flat = volume.face_idx.astype(points.dtype).reshape(R, R * R)
    vx = jax.lax.dot_general(
        wx, vol_flat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, R, R)
    vy = jnp.sum(vx * wy[:, :, None], axis=1)
    return jnp.round(jnp.sum(vy * wz, axis=-1)).astype(jnp.int32)


def point_cloud_loss_sdf(points: jax.Array,
                         volume: DistanceVolume) -> jax.Array:
    """Frobenius point-to-surface term via the distance volume.

    Matches the reference semantics (loss.py:233-242: a single L2 norm of
    the stacked residual magnitudes): ``sqrt(sum_i d_i^2)``.
    """
    d = query_distance(volume, points.reshape(-1, 3))
    return jnp.sqrt(jnp.sum(d * d) + 1e-20)


def normal_loss_sdf(
    points: jax.Array,
    point_normals: jax.Array,
    volume: DistanceVolume,
    scan_face_normals: jax.Array,
) -> jax.Array:
    """Normal agreement term with the nearest face from the volume."""
    fid = query_nearest_face(volume, points.reshape(-1, 3))
    closest_fn = scan_face_normals[fid]
    return jnp.mean(
        1.0 - jnp.sum(closest_fn * point_normals.reshape(-1, 3), axis=-1)
    )
