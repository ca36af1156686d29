"""Texture-fitting tests: recover a known texture via render L1 descent."""

import numpy as np
import jax.numpy as jnp
import pytest

from bodyfitting_tpu.fitting import texture as tf


def _unit_quad(z=0.0, scale=1.0):
    """Two triangles forming a square in the xy plane, with a full-atlas UV."""
    verts = np.array(
        [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], np.float32
    ) * scale
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    face_uvs = uvs[faces]
    return verts, faces, face_uvs


def test_ring_poses_look_at_center():
    center = np.array([0.5, 1.0, -0.3])
    poses = tf.ring_poses(center, 6, 2.0)
    assert poses.shape == (6, 4, 4)
    for w2c in poses:
        cam_center = (w2c @ np.append(center, 1.0))[:3]
        # center projects on the optical axis at distance 2
        np.testing.assert_allclose(cam_center[:2], 0.0, atol=1e-5)
        np.testing.assert_allclose(cam_center[2], 2.0, atol=1e-5)


def test_texture_recovery():
    """Optimizing a grey texture against renders of a checkered target
    recovers the target in covered regions."""
    verts, faces, face_uvs = _unit_quad()
    S = 16
    target_tex = np.zeros((S, S, 3), np.float32)
    target_tex[: S // 2] = [1.0, 0.2, 0.1]
    target_tex[S // 2:] = [0.1, 0.9, 0.3]

    config = tf.TextureFitConfig(
        tex_img_size=S, render_img_size=32, iter_num=60, lr=5e-2,
        round_views=4, round_view_iters=15, face_block=4,
    )
    tex, losses = tf.fit_texture(
        verts, faces, face_uvs,            # "smpl": same quad
        verts, faces, face_uvs, target_tex,  # "scan": quad w/ target texture
        config,
    )
    # compare full ring cycles (view 0 is edge-on with zero coverage)
    first_cycle = float(jnp.sum(losses[:4]))
    last_cycle = float(jnp.sum(losses[-4:]))
    assert last_cycle < 0.25 * first_cycle
    # central texels (well covered by renders) converge to the target
    got = np.asarray(tex)
    err = np.abs(got[4:12, 4:12] - target_tex[4:12, 4:12]).mean()
    assert err < 0.12, err


def test_render_scan_views_shapes():
    verts, faces, face_uvs = _unit_quad(scale=0.5)
    texr = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    imgs, masks, w2cs, Ks = tf.render_scan_views(
        verts, faces, face_uvs, texr, imgsize=32, viewnum=4, face_block=4
    )
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.uint8
    assert masks.shape == (4, 32, 32)
    # the quad is visible edge-on or frontal in every ring view except
    # when perfectly edge-on; at least half the views see pixels
    assert sum(m.sum() > 0 for m in masks) >= 2


def test_atlas_coverage_and_fill():
    verts, faces, face_uvs = _unit_quad()
    # shrink the UV layout to the left half of the atlas
    half_uvs = face_uvs * np.array([0.5, 1.0], np.float32)
    cov = np.asarray(tf.atlas_coverage_mask(jnp.asarray(half_uvs), 16,
                                            face_block=4))
    assert cov[:, :7].mean() > 0.8      # covered half
    assert cov[:, 10:].sum() == 0       # uncovered half

    tex = np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(np.float32)
    filled = tf.fill_texture_holes(tex, cov)
    assert filled.shape == tex.shape
    inp = tf.inpaint_unseen(tex, cov < 0.5, iterations=50)
    assert np.isfinite(inp).all()


def test_training_pose_schedule_structure():
    cfg = tf.TextureFitConfig(iter_num=30, round_views=6, round_view_iters=2)
    poses = tf.training_pose_schedule(cfg, np.zeros(3), 2.0)
    assert poses.shape == (30, 4, 4)
    # first 12 iterations cycle the 6 round views twice
    np.testing.assert_allclose(poses[0], poses[6], atol=1e-6)
    # random-phase poses differ
    assert np.abs(poses[12] - poses[13]).max() > 1e-3


def test_render_compare(tmp_path):
    verts, faces, face_uvs = _unit_quad(scale=0.5)
    rng = np.random.default_rng(0)
    tex = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    frames = tf.render_compare(
        (verts, faces, face_uvs, tex),
        (verts, faces, face_uvs, tex),
        str(tmp_path), viewnum=3, imgsize=32, face_block=4,
        write_video=False,
    )
    assert len(frames) == 3
    assert frames[0].shape == (32, 64, 3)
    import os

    assert os.path.exists(str(tmp_path / "0000.png"))


def test_bake_displacement_map_constant_field():
    """A constant displacement bakes to that constant on covered texels
    (barycentric interpolation of equal corners is exact)."""
    import jax.numpy as jnp

    from bodyfitting_tpu.fitting import texture as texfit

    # two UV triangles covering the lower-left atlas corner
    uvs = np.array(
        [[0.05, 0.05], [0.6, 0.05], [0.05, 0.6], [0.6, 0.6]], np.float32
    )
    face_uvs_idx = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    disp = np.tile(np.array([[0.5, -0.25, 0.125]], np.float32), (4, 1))

    dis_map, cov = texfit.bake_displacement_map(
        jnp.asarray(uvs[face_uvs_idx]), jnp.asarray(faces),
        jnp.asarray(disp), tex_img_size=64,
    )
    cov = np.asarray(cov) > 0.5
    assert cov.sum() > 100
    dm = np.asarray(dis_map)
    np.testing.assert_allclose(
        dm[cov], np.broadcast_to(disp[0], (cov.sum(), 3)), atol=1e-5
    )
    assert np.abs(dm[~cov]).max() == 0.0

    img = texfit.displacement_map_to8b(dis_map, cov)
    assert img.dtype == np.uint8 and img.shape == (64, 64, 3)
    # RMS-about-zero scaling: a constant field c maps to 0.5 + sign/6
    # (rms == |c|) => ~127 +- 42, mid-range and signed — a std-about-the-
    # mean scale would saturate it to 0/255
    mid = img[cov].reshape(-1, 3).astype(np.int32)
    assert (np.abs(np.abs(mid - 127) - 42) <= 4).all()
    assert (mid[:, 0] > 127).all()      # +0.5 displacement
    assert (mid[:, 1] < 127).all()      # -0.25 displacement


def test_bake_displacement_map_interpolates():
    """A linear-in-uv displacement field is reproduced exactly by
    barycentric interpolation (linear functions are interpolated
    exactly)."""
    import jax.numpy as jnp

    from bodyfitting_tpu.fitting import texture as texfit

    uvs = np.array(
        [[0.1, 0.1], [0.9, 0.1], [0.1, 0.9]], np.float32
    )
    face_uvs_idx = np.array([[0, 1, 2]], np.int32)
    faces = np.array([[0, 1, 2]], np.int32)
    # displacement x-component equals the vertex's u coordinate
    disp = np.stack(
        [uvs[:, 0], np.zeros(3, np.float32), np.zeros(3, np.float32)], 1
    )

    S = 128
    dis_map, cov = texfit.bake_displacement_map(
        jnp.asarray(uvs[face_uvs_idx]), jnp.asarray(faces),
        jnp.asarray(disp), tex_img_size=S,
    )
    cov = np.asarray(cov) > 0.5
    dm = np.asarray(dis_map)
    # covered texel (r, c): u = c / (S-1) by the atlas mapping
    rr, cc = np.nonzero(cov)
    np.testing.assert_allclose(
        dm[rr, cc, 0], cc / (S - 1.0), atol=1.5e-2
    )


def test_look_at_w2c_matches_reference_gl_axes():
    """look_at_w2c must reproduce gen_cam_views(gl=True) axes (reference
    utils/renderer.py:7-25): y-down CV camera, so world-up renders
    image-up (upright people for OpenPose/HMR)."""
    texfit = tf
    w2c = texfit.look_at_w2c(np.array([0.0, 0.0, 3.0]), np.zeros(3))
    R = w2c[:3, :3]
    np.testing.assert_allclose(R[0], [1, 0, 0], atol=1e-12)   # x
    np.testing.assert_allclose(R[1], [0, -1, 0], atol=1e-12)  # y down
    np.testing.assert_allclose(R[2], [0, 0, -1], atol=1e-12)  # z forward
    # a head at world +y projects above the principal point
    K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    head = np.array([0.0, 1.0, 0.0, 1.0])
    cam = w2c @ head
    v = K[1, 1] * cam[1] / cam[2] + K[1, 2]
    assert v < 64
    # every ring pose keeps the person upright
    for w2c in texfit.ring_poses(np.zeros(3), 8, 3.0):
        cam = w2c @ head
        v = K[1, 1] * cam[1] / cam[2] + K[1, 2]
        assert cam[2] > 0 and v < 64
