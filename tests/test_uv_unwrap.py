"""Per-face UV atlas generation (utils/uv_unwrap.py)."""

import numpy as np
import pytest

from bodyfitting_tpu.utils.uv_unwrap import make_uv_template, per_face_atlas


def _texels_covered(tri, S):
    """Integer texel centres strictly inside a UV triangle (numpy oracle)."""
    px = tri * S  # texel coords
    x0, y0 = np.floor(px.min(0)).astype(int)
    x1, y1 = np.ceil(px.max(0)).astype(int) + 1
    xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
    p = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], -1)
    a, b, c = px
    d = np.cross(b - a, c - a)
    wa = np.cross(b - p, c - p) / d
    wb = np.cross(c - p, a - p) / d
    wc = 1.0 - wa - wb
    inside = (wa >= 0) & (wb >= 0) & (wc >= 0)
    return {(int(x), int(y)) for (x, y) in p[inside] - 0.5}


@pytest.mark.parametrize("num_faces", [1, 2, 7, 64, 233])
def test_atlas_charts_are_disjoint_and_in_bounds(num_faces):
    uvs, face_uvs = per_face_atlas(num_faces)
    assert uvs.shape == (3 * num_faces, 2)
    assert face_uvs.shape == (num_faces, 3)
    assert (uvs > 0).all() and (uvs < 1).all()
    tris = uvs[face_uvs]
    # non-degenerate charts
    area = 0.5 * np.abs(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    )
    assert (area > 0).all()
    # empirical disjointness at a realistic atlas resolution
    S = 512
    claimed = {}
    for f in range(num_faces):
        for texel in _texels_covered(tris[f], S):
            assert texel not in claimed, (
                f"texel {texel} claimed by faces {claimed[texel]} and {f}"
            )
            claimed[texel] = f
    # every chart owns at least one texel (atlas is usable at this S)
    owned = set(claimed.values())
    assert owned == set(range(num_faces))


def test_make_uv_template_roundtrip(tmp_path):
    from bodyfitting_tpu.io import load_obj
    from bodyfitting_tpu.models import body_model as bm

    model = bm.synthetic_model("smpl", num_verts=64)
    faces = np.asarray(model.faces)
    path = str(tmp_path / "smpl_uv.obj")
    uvs, face_uvs = make_uv_template(
        np.asarray(model.v_template), faces, path
    )
    mesh = load_obj(path)
    np.testing.assert_allclose(mesh.uvs, uvs, atol=2e-6)
    np.testing.assert_array_equal(mesh.face_uvs, face_uvs)
    np.testing.assert_array_equal(mesh.faces, faces)


def test_renderpeople_auto_uv(tmp_path):
    """--auto_uv runs texture fitting without any UV template on disk."""
    from scipy.spatial import ConvexHull

    from bodyfitting_tpu.apps import renderpeople
    from bodyfitting_tpu.io import save_obj_uv
    from tests.test_apps import _write_openpose_json

    rng = np.random.default_rng(0)
    scan_dir = tmp_path / "scans" / "subjectA"
    scan_dir.mkdir(parents=True)
    pts = rng.normal(size=(30, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts[:, 1] *= 1.6
    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int32)
    uvs = rng.uniform(size=(len(pts), 2)).astype(np.float32)
    tex = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    save_obj_uv(str(scan_dir / "subjectA.obj"), pts.astype(np.float32),
                faces, uvs, faces.copy(), texture=tex)

    out_dir = tmp_path / "out_rp"
    args = renderpeople.config_parser().parse_args([
        "--target_dir", str(tmp_path / "scans"),
        "--output_dir", str(out_dir),
        "--load_size", "64",
        "--viewnum", "2",
        "--tasks", "openpose", "smplify", "texfit", "output",
        "--num_iters", "4",
        "--tex_iters", "4",
        "--smpl_uv_dir", str(tmp_path / "missing_uv_dir"),
        "--auto_uv",
        "--synthetic_num_verts", "48",
    ])
    runner = renderpeople.Runner(args)
    op_dir = out_dir / "subjectA" / "openpose"
    op_dir.mkdir(parents=True)
    for v in range(2):
        _write_openpose_json(
            str(op_dir / ("%02d_keypoints.json" % v)), rng, 64
        )
    runner.run()
    assert (out_dir / "subjectA" / "texfit" / "smpl.png").exists()
    assert (out_dir / "subjectA" / "texfit" / "smpl+d_textured.obj").exists()
