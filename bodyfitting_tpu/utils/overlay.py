"""Debug overlay rendering: fitted mesh composited over camera images.

Equivalent of the reference's neural_renderer-based debug overlays
(utils/io_utils.py:287-371 ``render_smpl``/``render_smpl_eval``): renders
the fitted SMPL with flat diffuse shading through the TPU rasterizer and
alpha-blends it over the input view for visual QA.
"""

from __future__ import annotations

import numpy as np

import jax

import jax.numpy as jnp


def render_mesh_overlay(
    image: np.ndarray,
    verts,
    faces,
    w2c,
    K,
    color=(0.65, 0.74, 0.86),
    alpha: float = 0.8,
    light_dir=(0.0, 0.0, 1.0),
    ambient: float = 0.45,
):
    """Shade the mesh (lambertian, camera-space light) and blend over the
    image.  Returns uint8 [H, W, 3]."""
    from bodyfitting_tpu.ops import rasterize as rz
    from bodyfitting_tpu.losses.mesh import compute_face_normals

    H, W = image.shape[:2]
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    w2c = jnp.asarray(w2c, jnp.float32)
    K = jnp.asarray(K, jnp.float32)

    px, fz = rz.project_faces(verts, faces, w2c, K)
    # the rasterizer is square; render max(H, W)^2 and crop — pixel
    # coordinates are absolute, so [:H, :W] is exactly the image window
    raster = rz.rasterize(px, fz, max(H, W))
    raster = jax.tree.map(lambda m: m[:H, :W], raster)

    # per-face lambertian intensity in camera space
    fn = compute_face_normals(verts, faces)
    fn_cam = fn @ w2c[:3, :3].T
    fn_cam = fn_cam / jnp.maximum(
        jnp.linalg.norm(fn_cam, axis=-1, keepdims=True), 1e-12
    )
    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)
    diffuse = jnp.abs(fn_cam @ light)          # double-sided shading
    intensity = jnp.clip(ambient + (1 - ambient) * diffuse, 0.0, 1.0)

    shade = intensity[jnp.maximum(raster.face_idx, 0)]
    mesh_rgb = shade[..., None] * jnp.asarray(color)

    img = jnp.asarray(image, jnp.float32) / 255.0
    fg = (raster.face_idx >= 0)[..., None]
    out = jnp.where(fg, alpha * mesh_rgb + (1 - alpha) * img, img)
    return np.asarray(jnp.clip(out * 255.0, 0, 255)).astype(np.uint8)


def render_fit_overlays(
    images,
    result: dict,
    faces,
    c2ws,
    Ks,
    skip: int = 12,
):
    """Batch version for a fitted frame: every ``skip``-th view
    (reference body_fitting.py:100-107 cadence).  Returns list of
    (view_index, overlay image)."""
    out = []
    for i in range(0, len(images), skip):
        w2c = np.linalg.inv(np.asarray(c2ws[i]))
        out.append((
            i,
            render_mesh_overlay(
                images[i], result["vertices"], faces, w2c, Ks[i]
            ),
        ))
    return out
