"""Wavefront OBJ mesh IO.

Covers what the reference pipelines read/write (utils/io_utils.py:185-192,
430-548 and smplify/texture_fitting.py:14-59): triangle/quad faces,
UVs (vt + f v/vt indices), normals, optional MTL diffuse-texture lookup,
and the simple ``save_obj`` format (``v %.4f``, 1-based ``f``) the outputs
use.  Host-side numpy only — never inside jit.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ObjMesh:
    verts: np.ndarray                       # [V, 3] float32
    faces: np.ndarray                       # [F, 3] int32
    uvs: Optional[np.ndarray] = None        # [T, 2] float32 (vt entries)
    face_uvs: Optional[np.ndarray] = None   # [F, 3] int32 into uvs
    normals: Optional[np.ndarray] = None    # [N, 3]
    face_normals: Optional[np.ndarray] = None  # [F, 3] int32 into normals
    texture: Optional[np.ndarray] = None    # [H, W, 3] float32 in [0, 1]
    mtl_name: Optional[str] = None


def _load_mtl_texture(mtl_path: str):
    """Diffuse (map_Kd) texture image from an MTL file, RGB float [0,1]."""
    if not os.path.exists(mtl_path):
        return None
    tex_file = None
    with open(mtl_path) as f:
        for line in f:
            parts = line.split()
            if parts and parts[0] == "map_Kd":
                tex_file = parts[-1]
    if tex_file is None:
        return None
    import cv2

    img = cv2.imread(
        os.path.join(os.path.dirname(mtl_path), tex_file), cv2.IMREAD_COLOR
    )
    if img is None:
        return None
    return img[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB


def _resolve_index(tok: str, count: int) -> int:
    i = int(tok)
    return i - 1 if i > 0 else count + i


def load_obj(path: str, load_texture: bool = False,
             use_native: bool = True) -> ObjMesh:
    """Parse an OBJ file (quads triangulated fan-style, like the reference).

    Uses the native C++ parser (io/native.py) when available — scans are
    multi-million-line files — with a transparent pure-Python fallback.
    """
    if use_native:
        from bodyfitting_tpu.io.native import parse_obj_native

        parsed = parse_obj_native(path)   # None -> pure-Python fallback
        if parsed is not None:
            verts, uvs, normals, faces, face_uvs, face_normals, mtl = parsed
            texture = None
            if load_texture and mtl is not None:
                texture = _load_mtl_texture(
                    os.path.join(os.path.dirname(path), mtl)
                )
            return ObjMesh(
                verts=verts if verts is not None else np.zeros((0, 3),
                                                               np.float32),
                faces=faces if faces is not None else np.zeros(
                    (0, 3), np.int32
                ),
                uvs=uvs, face_uvs=face_uvs, normals=normals,
                face_normals=face_normals, texture=texture, mtl_name=mtl,
            )
    verts, uvs, normals = [], [], []
    faces, face_uvs, face_normals = [], [], []
    mtl_file = None

    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif tag == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif tag == "mtllib":
                mtl_file = parts[1]
            elif tag == "f":
                corner = [p.split("/") for p in parts[1:]]
                # triangulate polygons as a fan
                for k in range(1, len(corner) - 1):
                    tri = [corner[0], corner[k], corner[k + 1]]
                    faces.append(
                        [_resolve_index(c[0], len(verts)) for c in tri]
                    )
                    # keep per-face ALIGNMENT with faces: a face without
                    # vt/vn indices records a -1 row (resolved to None or
                    # a warning at return), never a shorter list whose
                    # rows silently pair with the wrong faces
                    if all(len(c) > 1 and c[1] for c in tri):
                        face_uvs.append(
                            [_resolve_index(c[1], len(uvs)) for c in tri]
                        )
                    else:
                        face_uvs.append([-1, -1, -1])
                    if all(len(c) > 2 and c[2] for c in tri):
                        face_normals.append(
                            [_resolve_index(c[2], len(normals)) for c in tri]
                        )
                    else:
                        face_normals.append([-1, -1, -1])

    texture = None
    mtl_name = None
    if load_texture and mtl_file is not None:
        mtl_path = os.path.join(os.path.dirname(path), mtl_file)
        if os.path.exists(mtl_path):
            mtl_name = mtl_file
            texture = _load_mtl_texture(mtl_path)

    return ObjMesh(
        verts=np.asarray(verts, np.float32),
        faces=np.asarray(faces, np.int32).reshape(-1, 3),
        uvs=np.asarray(uvs, np.float32) if uvs else None,
        face_uvs=_validate_face_attr(face_uvs, "vt", path),
        normals=np.asarray(normals, np.float32) if normals else None,
        face_normals=_validate_face_attr(face_normals, "vn", path),
        texture=texture,
        mtl_name=mtl_name,
    )


def _validate_face_attr(rows, kind: str, path: str):
    """faces-aligned attr index array, or None when absent/partial.

    Partial coverage (only some faces carry vt/vn) cannot be represented
    downstream (-1 would wrap to index -1 in numpy fancy indexing), so it
    degrades to None with a warning instead of silently mispairing.
    """
    if not rows:
        return None
    arr = np.asarray(rows, np.int32)
    bad = arr < 0
    if bad.all():
        return None
    if bad.any():
        import warnings

        warnings.warn(
            f"{path}: {int(bad.any(1).sum())}/{len(arr)} faces lack "
            f"{kind} indices; dropping per-face {kind} entirely"
        )
        return None
    return arr


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray,
             use_native: bool = True) -> None:
    """Plain mesh writer, reference format (io_utils.py:185-192).

    Uses the native C++ writer when available (same ``%.4f`` / 1-based
    format, byte-identical — pinned by tests/test_native.py) — the app
    writes one 10k-vert mesh per fitted frame, and the Python per-line
    loop is ~20x slower.
    """
    if use_native:
        from bodyfitting_tpu.io.native import write_obj_native

        if write_obj_native(path, verts, faces):
            return
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write("v %.4f %.4f %.4f\n" % (v[0], v[1], v[2]))
        for face in np.asarray(faces) + 1:
            f.write("f %d %d %d\n" % (face[0], face[1], face[2]))


def save_obj_uv(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    uvs: np.ndarray,
    face_uvs: np.ndarray,
    texture: Optional[np.ndarray] = None,
    mtl_name: str = "material_0",
) -> None:
    """Textured mesh writer: OBJ + MTL + texture image.

    Functional equivalent of the reference's UV-template splicing +
    ``nr.save_obj`` (texture_fitting.py:84-117, 296-301): the texture image
    is written next to the OBJ and referenced via ``map_Kd``.
    """
    base = os.path.splitext(path)[0]
    obj_dir = os.path.dirname(path)
    mtl_path = base + ".mtl"
    tex_path = base + ".png"

    with open(path, "w") as f:
        f.write(f"mtllib {os.path.relpath(mtl_path, obj_dir)}\n")
        for v in np.asarray(verts):
            f.write("v %.4f %.4f %.4f\n" % (v[0], v[1], v[2]))
        for vt in np.asarray(uvs):
            f.write("vt %.6f %.6f\n" % (vt[0], vt[1]))
        f.write(f"usemtl {mtl_name}\n")
        for face, fuv in zip(np.asarray(faces) + 1, np.asarray(face_uvs) + 1):
            f.write(
                "f %d/%d %d/%d %d/%d\n"
                % (face[0], fuv[0], face[1], fuv[1], face[2], fuv[2])
            )

    with open(mtl_path, "w") as f:
        f.write(f"newmtl {mtl_name}\n")
        f.write("Ka 1.000 1.000 1.000\nKd 1.000 1.000 1.000\n")
        f.write("Ks 0.000 0.000 0.000\n")
        if texture is not None:
            f.write(f"map_Kd {os.path.relpath(tex_path, obj_dir)}\n")

    if texture is not None:
        import cv2

        img = np.clip(np.asarray(texture) * 255.0, 0, 255).astype(np.uint8)
        cv2.imwrite(tex_path, img[..., ::-1])  # RGB -> BGR
