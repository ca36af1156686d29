"""Self-contained UV atlas generation.

The reference ships licensed SMPL/SMPL-X UV templates
(``/root/reference/smpl_uv/{smpl_uv,smplx_uv}.obj``, SURVEY.md §2.1 "UV
assets") that this repo deliberately does not vendor.  This module makes
the texture-fitting pipeline fully functional without them: it generates
a valid per-face chart atlas for ANY triangle mesh — every face gets its
own margin-separated triangular chart packed two-per-cell into a square
grid, so no two faces ever share a texel.

Shape preservation is deliberately not attempted: the optimisation in
``fitting/texture.py`` samples the atlas through the rendered UV map, so
per-face charts are exactly as expressive as the reference renderer's
per-face texture cubes (neural_renderer load_textures, SURVEY §2.2 N10);
only texel allocation differs.  For best results give high-face-count
meshes a larger ``tex_img_size`` (SMPL-X's 20908 faces at 1024^2 get
~10 px cells).
"""

from __future__ import annotations

import math

import numpy as np


def per_face_atlas(
    num_faces: int, margin_frac: float = 0.125
) -> tuple[np.ndarray, np.ndarray]:
    """Pack ``num_faces`` triangular charts into the unit UV square.

    Two faces per grid cell (lower-left / upper-right right triangles),
    inset so charts never touch — not even across the cell diagonal.

    Args:
      num_faces: number of triangles to allocate charts for.
      margin_frac: inset as a fraction of the cell side (split between
        the cell border and the diagonal gap).

    Returns:
      ``(uvs [3*num_faces, 2] float32 in (0, 1), face_uvs [num_faces, 3]
      int32)`` with ``face_uvs[f] = (3f, 3f+1, 3f+2)``.
    """
    if num_faces <= 0:
        raise ValueError("num_faces must be positive")
    cells = int(math.ceil(math.sqrt(math.ceil(num_faces / 2))))
    c = 1.0 / cells
    m = margin_frac * c
    idx = np.arange(num_faces)
    cell_id = idx // 2
    cx = (cell_id % cells).astype(np.float32) * c
    cy = (cell_id // cells).astype(np.float32) * c
    lower = (idx % 2) == 0
    # lower-left triangle: right angle at (m, m); legs end 2m short of the
    # far corners so the diagonal stays >m away from the upper chart
    lo = np.stack(
        [
            np.stack([cx + m, cy + m], -1),
            np.stack([cx + c - 2 * m, cy + m], -1),
            np.stack([cx + m, cy + c - 2 * m], -1),
        ],
        axis=1,
    )
    # upper-right triangle: right angle at (c-m, c-m)
    hi = np.stack(
        [
            np.stack([cx + c - m, cy + c - m], -1),
            np.stack([cx + 2 * m, cy + c - m], -1),
            np.stack([cx + c - m, cy + 2 * m], -1),
        ],
        axis=1,
    )
    uvs = np.where(lower[:, None, None], lo, hi).astype(np.float32)
    face_uvs = np.arange(3 * num_faces, dtype=np.int32).reshape(
        num_faces, 3
    )
    return uvs.reshape(3 * num_faces, 2), face_uvs


def make_uv_template(
    verts: np.ndarray,
    faces: np.ndarray,
    path: str | None = None,
    margin_frac: float = 0.125,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate (and optionally save as an OBJ template) a per-face atlas
    for a mesh — a drop-in stand-in for the reference's licensed
    ``smpl_uv.obj`` (texture_fitting.py:84-117 consumes only its vt/f
    lines).

    Returns ``(uvs, face_uvs)``; writes ``path`` when given.
    """
    faces = np.asarray(faces)
    uvs, face_uvs = per_face_atlas(len(faces), margin_frac)
    if path is not None:
        from bodyfitting_tpu.io import save_obj_uv

        save_obj_uv(path, np.asarray(verts), faces, uvs, face_uvs)
    return uvs, face_uvs
