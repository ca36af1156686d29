"""Differentiable mesh rasterization, TPU-native.

Replaces the reference's vendored neural_renderer CUDA rasterizer
(/root/reference/thirdparty/neural_renderer/neural_renderer/cuda/
rasterize_cuda_kernel.cu).  The CUDA version is a per-pixel brute-force
z-buffer (kernel lines 70-169) with NMR's approximate edge-sweep backward
(245-504).  The TPU re-design:

  * **forward**: the z-buffer is a *minimum reduction over face chunks* —
    a dense, static-shape ``lax.scan`` whose step processes all pixels x a
    face block on the VPU.  Winning barycentrics are recomputed only for
    the winning face (a gather), not stored per face.
  * **gradients**: the fitting pipelines only ever differentiate renders
    w.r.t. *textures* (texture fitting, texture_fitting.py:257-276 — mesh
    vertices are constants there), so the face assignment is
    non-differentiable while barycentric texture sampling is fully
    differentiable — exactly the gradients the reference actually uses.
  * **soft silhouette**: instead of NMR's scatter-heavy edge-gradient
    backward (which XLA cannot tile), silhouettes use SoftRas-style
    probabilistic coverage (Liu et al. ICCV'19): per-face sigmoid of
    signed squared distance, aggregated as a product accumulated in log
    space over face chunks — associative, fully differentiable w.r.t.
    vertices, and maps to dense VPU work.

Convention: pixel centers at integer+0.5; faces visible from both sides
(the reference renders with duplicated back faces — renderer.py:176-178);
depth is the perspective-correct camera-space z.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-9
_FAR = 1e9


class RasterOut(NamedTuple):
    face_idx: jax.Array    # [H, W] int32, -1 for background
    bary: jax.Array        # [H, W, 3] perspective-correct barycentrics
    depth: jax.Array       # [H, W] camera z (FAR for background)


def project_faces(
    verts: jax.Array, faces: jax.Array, w2c: jax.Array, K: jax.Array
):
    """World vertices -> per-face screen coords + camera depths.

    Returns ``(face_px [F, 3, 2], face_z [F, 3])``.
    """
    R, t = w2c[:3, :3], w2c[:3, 3]
    cam = verts @ R.T + t
    z = cam[:, 2]
    proj = cam @ K.T
    px = proj[:, :2] / jnp.maximum(proj[:, 2:3], _EPS)
    return px[faces], z[faces]


def _edge(a, b, p):
    """2D edge function: cross(b - a, p - a)."""
    return (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])


@functools.partial(jax.jit, static_argnames=("image_size", "face_block"))
def rasterize(
    face_px: jax.Array,
    face_z: jax.Array,
    image_size: int,
    face_block: int = 256,
) -> RasterOut:
    """Hard z-buffer rasterization of projected triangles.

    Args:
      face_px: ``[F, 3, 2]`` screen-space vertex coords (pixels).
      face_z: ``[F, 3]`` camera-space depths.
      image_size: output H == W.
      face_block: faces per scan step (transient is ``[H*W, face_block]``).
    """
    from bodyfitting_tpu.ops.blocking import pad_to_blocks

    H = W = image_size
    fpx = pad_to_blocks(face_px, face_block, -_FAR)
    fz = pad_to_blocks(face_z, face_block, _FAR)

    ys = (jnp.arange(H, dtype=face_px.dtype) + 0.5)[:, None]
    xs = (jnp.arange(W, dtype=face_px.dtype) + 0.5)[None, :]
    pix = jnp.stack(
        [jnp.broadcast_to(xs, (H, W)), jnp.broadcast_to(ys, (H, W))], -1
    ).reshape(-1, 1, 2)                                    # [P, 1, 2]

    def body(carry, inp):
        best_z, best_f = carry
        blk, px3, z3 = inp                                  # [FB,3,2],[FB,3]
        a, b, c = px3[:, 0], px3[:, 1], px3[:, 2]
        e0 = _edge(b[None], c[None], pix)                   # [P, FB]
        e1 = _edge(c[None], a[None], pix)
        e2 = _edge(a[None], b[None], pix)
        area = _edge(a, b, c)[None]                         # [1, FB]
        inside = (
            ((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
            | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        ) & (jnp.abs(area) > _EPS)
        denom = jnp.where(jnp.abs(area) > _EPS, area, 1.0)
        w0, w1, w2 = e0 / denom, e1 / denom, e2 / denom
        zs = z3[None]                                       # [1, FB, 3]
        front = (zs > _EPS).all(-1)                         # [1, FB]
        inv_z = (
            w0 / jnp.maximum(zs[..., 0], _EPS)
            + w1 / jnp.maximum(zs[..., 1], _EPS)
            + w2 / jnp.maximum(zs[..., 2], _EPS)
        )
        depth = 1.0 / jnp.maximum(inv_z, 1.0 / _FAR)
        depth = jnp.where(inside & front, depth, _FAR)      # [P, FB]
        arg = jnp.argmin(depth, axis=1)
        dmin = jnp.take_along_axis(depth, arg[:, None], 1)[:, 0]
        better = dmin < best_z
        best_f = jnp.where(
            better, blk * face_block + arg.astype(jnp.int32), best_f
        )
        best_z = jnp.where(better, dmin, best_z)
        return (best_z, best_f), None

    P = H * W
    init = (jnp.full((P,), _FAR, face_px.dtype), jnp.full((P,), -1, jnp.int32))
    (zbuf, fidx), _ = jax.lax.scan(
        body, init, (jnp.arange(fpx.shape[0], dtype=jnp.int32), fpx, fz)
    )

    # Recompute perspective-correct barycentrics for the winning faces only.
    safe_idx = jnp.maximum(fidx, 0)
    tri = face_px.reshape(-1, 3, 2)[safe_idx]               # [P, 3, 2]
    z3 = face_z.reshape(-1, 3)[safe_idx]
    p = pix[:, 0, :]
    e0 = _edge(tri[:, 1], tri[:, 2], p)
    e1 = _edge(tri[:, 2], tri[:, 0], p)
    e2 = _edge(tri[:, 0], tri[:, 1], p)
    area = _edge(tri[:, 0], tri[:, 1], tri[:, 2])
    denom = jnp.where(jnp.abs(area) > _EPS, area, 1.0)
    sb = jnp.stack([e0, e1, e2], -1) / denom[:, None]       # screen bary
    w = sb / jnp.maximum(z3, _EPS)
    pc = w / jnp.maximum(w.sum(-1, keepdims=True), _EPS)    # persp-correct
    valid = (fidx >= 0)[:, None]
    bary = jnp.where(valid, pc, 0.0)

    return RasterOut(
        face_idx=fidx.reshape(H, W),
        bary=bary.reshape(H, W, 3),
        depth=zbuf.reshape(H, W),
    )


def render_attributes(
    raster: RasterOut, face_attrs: jax.Array, background=0.0
) -> jax.Array:
    """Interpolate per-face-vertex attributes over the raster.

    ``face_attrs [F, 3, C]`` -> image ``[H, W, C]``.  Differentiable w.r.t.
    the attributes (the face assignment is a constant).
    """
    H, W = raster.face_idx.shape
    idx = jnp.maximum(raster.face_idx.reshape(-1), 0)
    attrs = face_attrs[idx]                                 # [P, 3, C]
    vals = jnp.einsum("pvc,pv->pc", attrs, raster.bary.reshape(-1, 3))
    fg = (raster.face_idx.reshape(-1) >= 0)[:, None]
    out = jnp.where(fg, vals, background)
    return out.reshape(H, W, -1)


def render_silhouette(raster: RasterOut) -> jax.Array:
    """Hard binary coverage map ``[H, W]`` (like nr.render_silhouettes)."""
    return (raster.face_idx >= 0).astype(jnp.float32)


def render_depth(raster: RasterOut, background: float = 0.0) -> jax.Array:
    """Depth map with background filled (like nr.render_depth)."""
    return jnp.where(raster.face_idx >= 0, raster.depth, background)


# ---------------------------------------------------------------------------
# UV-image texturing (replaces NMR's per-face texture cubes with a modern
# UV atlas + bilinear sampling — same capability, simpler and differentiable)
# ---------------------------------------------------------------------------


def interpolate_uvs(raster: RasterOut, face_uvs: jax.Array) -> jax.Array:
    """Per-pixel interpolated UV coords ``[H, W, 2]`` (0 where background)."""
    H, W = raster.face_idx.shape
    idx = jnp.maximum(raster.face_idx.reshape(-1), 0)
    uvs = jnp.einsum(
        "pvc,pv->pc", face_uvs[idx], raster.bary.reshape(-1, 3)
    )
    return uvs.reshape(H, W, 2)


def bilinear_sample_uv(texture: jax.Array, uvs: jax.Array) -> jax.Array:
    """Bilinear texture lookup at UVs ``[..., 2]`` (OBJ convention: v up).

    Differentiable w.r.t. both the texture and the UVs.  Taps index the
    row-flattened texture with a single linearised axis: XLA lowers the
    2D advanced-indexing form to a slower per-element path on TPU
    (12.1 -> 8.1 ms per 512^2 sample at 1024^2, same bits).
    """
    Th, Tw = texture.shape[:2]
    tex_flat = texture.reshape(Th * Tw, -1)
    flat = uvs.reshape(-1, 2)
    x = flat[:, 0] * (Tw - 1)
    y = (1.0 - flat[:, 1]) * (Th - 1)
    x0 = jnp.clip(jnp.floor(x), 0, Tw - 1)
    y0 = jnp.clip(jnp.floor(y), 0, Th - 1)
    x1 = jnp.clip(x0 + 1, 0, Tw - 1)
    y1 = jnp.clip(y0 + 1, 0, Th - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[:, None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[:, None]

    def tap(xi, yi):
        return tex_flat[yi.astype(jnp.int32) * Tw + xi.astype(jnp.int32)]

    val = (
        tap(x0, y0) * (1 - wx) * (1 - wy)
        + tap(x1, y0) * wx * (1 - wy)
        + tap(x0, y1) * (1 - wx) * wy
        + tap(x1, y1) * wx * wy
    )
    return val.reshape(uvs.shape[:-1] + (texture.shape[-1],))


def sample_texture_uvmap(
    uv_map: jax.Array, fg: jax.Array, texture: jax.Array, background=0.0
) -> jax.Array:
    """Render from a precomputed per-pixel UV map + coverage mask."""
    val = bilinear_sample_uv(texture, uv_map)
    return jnp.where(fg[..., None], val, background)


def sample_texture(
    raster: RasterOut,
    face_uvs: jax.Array,
    texture: jax.Array,
    background=0.0,
) -> jax.Array:
    """Render by sampling a UV texture image.

    Args:
      face_uvs: ``[F, 3, 2]`` per-face-vertex UVs in [0, 1] (v up).
      texture: ``[Th, Tw, C]`` texture image.
    Differentiable w.r.t. ``texture`` (bilinear) and ``face_uvs``.
    """
    uv_map = interpolate_uvs(raster, face_uvs)
    return sample_texture_uvmap(
        uv_map, raster.face_idx >= 0, texture, background
    )


# ---------------------------------------------------------------------------
# Soft (differentiable-in-vertices) silhouette
# ---------------------------------------------------------------------------


def _point_segment_d2(p, a, b):
    """Squared distance point->segment, broadcastable."""
    ab = b - a
    t = jnp.sum((p - a) * ab, -1) / jnp.maximum(
        jnp.sum(ab * ab, -1), _EPS
    )
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    proj = a + t * ab
    return jnp.sum((p - proj) ** 2, -1)


@functools.partial(
    jax.jit, static_argnames=("image_size", "face_block", "sigma", "znear")
)
def soft_silhouette(
    face_px: jax.Array,
    image_size: int,
    sigma: float = 1e-4,
    face_block: int = 128,
    face_z: jax.Array | None = None,
    znear: float = 1e-6,
) -> jax.Array:
    """SoftRas-style probabilistic coverage ``[H, W]`` in [0, 1).

    ``prob_f(p) = sigmoid(sign_f(p) * d2(p, f) / sigma)`` with distances in
    normalised [0,1] image units; aggregated as
    ``1 - prod_f (1 - prob_f)`` accumulated in log space over face chunks —
    fully differentiable w.r.t. ``face_px``.

    Pass ``face_z`` (``[F, 3]`` camera-space depths, e.g. from
    :func:`project_faces`) whenever geometry can reach the camera plane:
    the perspective divide clamps z at ~0, so a behind-camera vertex
    projects to huge coordinates and its face would otherwise smear
    spurious coverage across the image.  Faces with any vertex at
    ``z <= znear`` are dropped, mirroring the hard rasterizer's ``front``
    test (a face straddling the near plane is culled whole).
    """
    from bodyfitting_tpu.ops.blocking import pad_to_blocks

    H = W = image_size
    if face_z is None:
        face_z = jnp.ones(face_px.shape[:2], face_px.dtype)
    fpx = pad_to_blocks(face_px, face_block, -_FAR) / image_size
    front = (pad_to_blocks(face_z, face_block, _FAR) > znear).all(-1)

    ys = (jnp.arange(H, dtype=face_px.dtype) + 0.5)[:, None] / image_size
    xs = (jnp.arange(W, dtype=face_px.dtype) + 0.5)[None, :] / image_size
    pix = jnp.stack(
        [jnp.broadcast_to(xs, (H, W)), jnp.broadcast_to(ys, (H, W))], -1
    ).reshape(-1, 1, 2)

    def body(log_bg, xs_blk):
        px3, front_blk = xs_blk
        a, b, c = px3[:, 0], px3[:, 1], px3[:, 2]
        e0 = _edge(b[None], c[None], pix)
        e1 = _edge(c[None], a[None], pix)
        e2 = _edge(a[None], b[None], pix)
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
            (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        )
        # degenerate (e.g. padded) and behind-camera faces: no coverage
        valid = ((jnp.abs(_edge(a, b, c)) > _EPS) & front_blk)[None]
        d2 = jnp.minimum(
            _point_segment_d2(pix, a[None], b[None]),
            jnp.minimum(
                _point_segment_d2(pix, b[None], c[None]),
                _point_segment_d2(pix, c[None], a[None]),
            ),
        )
        sign = jnp.where(inside, 1.0, -1.0)
        s = sign * d2 / sigma
        # log(1 - sigmoid(s)) == -softplus(s): exact and finite-gradient
        contrib = jnp.where(valid, -jax.nn.softplus(s), 0.0)
        return log_bg + jnp.sum(contrib, axis=1), None

    log_bg, _ = jax.lax.scan(
        body, jnp.zeros((H * W,), face_px.dtype), (fpx, front)
    )
    return (1.0 - jnp.exp(log_bg)).reshape(H, W)
