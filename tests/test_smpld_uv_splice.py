"""SMPL+D + UV-template splice round-trip at real vertex counts.

The reference's ``create_smpld_uv`` splices fitted SMPL+D vertices with the
``smpl_uv.obj`` template's vt/f lines and a grey texture
(/root/reference/smplify/texture_fitting.py:84-117).  The real template has
**6890 vertices but 7576 UV coordinates** (seam vertices are duplicated in
UV space), so faces index v and vt separately.  This pins that mismatch
handling through the whole texfit path: template parse -> splice ->
texture fit -> textured OBJ write -> re-parse.
"""

import os

import numpy as np
import pytest

from bodyfitting_tpu.io import load_obj, save_obj_uv

V, VT, F = 6890, 7576, 13776


@pytest.fixture(scope="module")
def uv_template(tmp_path_factory):
    """A synthetic smpl_uv.obj at the real template's exact counts."""
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("uv") / "smpl_uv.obj"
    verts = rng.normal(scale=0.3, size=(V, 3)).astype(np.float32)
    uvs = rng.uniform(size=(VT, 2)).astype(np.float32)
    # faces over vertices; vt indices cover all 7576 slots: start from the
    # vertex id and remap a seam band to the extra 686 UV slots
    faces = rng.integers(0, V, size=(F, 3)).astype(np.int64)
    face_uvs = faces.copy()
    seam = rng.integers(0, 3, size=F)
    extra = rng.integers(V, VT, size=F)
    face_uvs[np.arange(F), seam] = extra
    with open(path, "w") as f:
        for v in verts:
            f.write("v %.6f %.6f %.6f\n" % tuple(v))
        for vt in uvs:
            f.write("vt %.6f %.6f\n" % tuple(vt))
        for fv, fuv in zip(faces + 1, face_uvs + 1):
            f.write("f %d/%d %d/%d %d/%d\n" % (
                fv[0], fuv[0], fv[1], fuv[1], fv[2], fuv[2]))
    return str(path), verts, uvs, faces, face_uvs


def test_template_parse_counts(uv_template):
    path, verts, uvs, faces, face_uvs = uv_template
    mesh = load_obj(path)
    assert mesh.verts.shape == (V, 3)
    assert mesh.uvs.shape == (VT, 2)
    assert mesh.faces.shape == (F, 3)
    assert mesh.face_uvs.shape == (F, 3)
    np.testing.assert_array_equal(np.asarray(mesh.faces), faces)
    np.testing.assert_array_equal(np.asarray(mesh.face_uvs), face_uvs)
    # the 686 seam-duplicated UV slots really are referenced
    assert np.asarray(mesh.face_uvs).max() == VT - 1


def test_smpld_splice_roundtrip(uv_template, tmp_path):
    """Fitted SMPL+D vertices + template vt/f -> textured OBJ -> re-parse."""
    path, _, uvs, faces, face_uvs = uv_template
    mesh = load_obj(path)
    rng = np.random.default_rng(1)

    # "fitted" SMPL+D vertices: template verts + a displacement field
    fitted = np.asarray(mesh.verts) + rng.normal(
        scale=0.01, size=(V, 3)).astype(np.float32)
    grey = np.full((64, 64, 3), 128.0 / 255.0, np.float32)

    out = tmp_path / "smpl+d_textured.obj"
    save_obj_uv(str(out), fitted, np.asarray(mesh.faces),
                np.asarray(mesh.uvs), np.asarray(mesh.face_uvs),
                texture=grey)
    back = load_obj(str(out), load_texture=True)
    assert back.verts.shape == (V, 3)
    assert back.uvs.shape == (VT, 2)
    np.testing.assert_allclose(np.asarray(back.verts), fitted, atol=1e-3)
    np.testing.assert_allclose(np.asarray(back.uvs), uvs, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(back.face_uvs), face_uvs)
    assert back.texture is not None
    np.testing.assert_allclose(
        np.asarray(back.texture), grey, atol=2.0 / 255.0)
    assert os.path.exists(str(out).replace(".obj", ".mtl"))


def test_texfit_runs_at_real_counts(uv_template):
    """One short texture fit through the spliced mesh at 6890/7576/13776."""
    import jax.numpy as jnp

    from bodyfitting_tpu.fitting import texture as texfit

    path, _, _, _, _ = uv_template
    mesh = load_obj(path)
    rng = np.random.default_rng(2)

    smpl_face_uvs = np.asarray(mesh.uvs)[np.asarray(mesh.face_uvs)]
    assert smpl_face_uvs.shape == (F, 3, 2)

    # tiny scan with its own texture
    sv = rng.normal(scale=0.3, size=(256, 3)).astype(np.float32)
    sf = rng.integers(0, 256, size=(400, 3)).astype(np.int32)
    sfu = rng.uniform(size=(400, 3, 2)).astype(np.float32)
    stex = rng.uniform(size=(32, 32, 3)).astype(np.float32)

    cfg = texfit.TextureFitConfig(
        iter_num=2, tex_img_size=64, render_img_size=64, round_views=2,
        round_view_iters=1,
    )
    tex, losses = texfit.fit_texture(
        np.asarray(mesh.verts), np.asarray(mesh.faces), smpl_face_uvs,
        sv, sf, sfu, stex, cfg,
    )
    assert np.asarray(tex).shape == (64, 64, 3)
    assert np.isfinite(np.asarray(losses)).all()
    coverage = texfit.atlas_coverage_mask(jnp.asarray(smpl_face_uvs), 64)
    assert 0 < float(np.asarray(coverage).mean()) <= 1.0
