"""Joints-only model reduction (models.body_model.reduce_for_joints).

The reduction folds J_regressor into the blendshape bases and restricts
vertex arrays to the rows the joints read (selector picks + landmark
triangles), making keypoint-only fit iterations independent of V.  These
tests pin the exactness claims.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
from bodyfitting_tpu.models import body_model as bm


def _random_params(model, seed=5):
    rng = np.random.default_rng(seed)
    p = bm.BodyParams.zeros(model)
    p = dataclasses.replace(
        p,
        betas=jnp.asarray(rng.normal(scale=0.5, size=(model.num_betas,)),
                          jnp.float32),
        global_orient=jnp.asarray([0.2, -0.5, 0.1], jnp.float32),
        body_pose=jnp.asarray(
            rng.normal(scale=0.2, size=(3 * model.num_body_joints,)),
            jnp.float32),
    )
    if model.model_type == "smplx":
        p = dataclasses.replace(
            p,
            expression=jnp.asarray(
                rng.normal(scale=0.3, size=(model.num_expressions,)),
                jnp.float32),
            left_hand_pose=jnp.asarray(
                rng.normal(size=(model.num_hand_pca,)), jnp.float32),
            right_hand_pose=jnp.asarray(
                rng.normal(size=(model.num_hand_pca,)), jnp.float32),
        )
    return p


@pytest.mark.parametrize("model_type", ["smplx", "smplh", "smpl"])
def test_reduced_joints_match_full(model_type):
    model = bm.synthetic_model(
        model_type, num_verts=1500, seed=0, use_face_contour=True
    )
    if model_type == "smpl":
        model = bm.spin_joint_mapper_for_smpl(model)
    red = bm.reduce_for_joints(model)
    assert red.num_verts < model.num_verts
    p = _random_params(model)
    jf = np.asarray(bm.forward(model, p).joints)
    jr = np.asarray(bm.forward(red, p).joints)
    # smpl: SPIN extra rows (>=25) are zeroed in the reduction by design.
    n = 25 if model_type == "smpl" else jf.shape[0]
    np.testing.assert_allclose(jf[:n], jr[:n], atol=5e-6)


def test_reduced_joints_match_under_grad():
    """Gradients through the reduced forward equal the full ones."""
    model = bm.synthetic_model("smplx", num_verts=1024, seed=1,
                               use_face_contour=True)
    red = bm.reduce_for_joints(model)
    p = _random_params(model, seed=9)

    def loss(m):
        return lambda q: jnp.sum(bm.forward(m, q).joints ** 2)

    gf = jax.grad(loss(model))(p)
    gr = jax.grad(loss(red))(p)
    for f in dataclasses.fields(p):
        np.testing.assert_allclose(
            np.asarray(getattr(gf, f.name)), np.asarray(getattr(gr, f.name)),
            rtol=2e-4, atol=2e-4, err_msg=f.name,
        )


def test_fit_with_reduction_matches_without():
    """End-to-end keypoint-only fit: reduction on vs off, same result."""
    from bodyfitting_tpu.ops.camera import perspective_projection, ring_cameras

    model = bm.synthetic_model("smplx", num_verts=1024, seed=0,
                               use_face_contour=True)
    gt = _random_params(model, seed=11)
    gj = np.asarray(bm.forward(model, gt).joints) * 0.3
    n_views = 4
    w2cs = np.asarray(ring_cameras(n_views, jnp.asarray(gj.mean(0)), 3.0))
    K = np.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]], np.float32)
    Ks = np.broadcast_to(K, (n_views, 3, 3)).copy()
    proj = np.asarray(perspective_projection(
        jnp.asarray(gj)[None].repeat(n_views, 0),
        jnp.asarray(w2cs[:, :3, :3]), jnp.asarray(w2cs[:, :3, 3]),
        jnp.asarray(Ks)))
    kps = np.concatenate(
        [proj, np.ones(proj.shape[:-1] + (1,), np.float32)], -1)
    obs = smplify.Observations(
        w2cs=jnp.asarray(w2cs), Ks=jnp.asarray(Ks), keypoints=jnp.asarray(kps),
        view_mask=jnp.ones((n_views,)), constant_scale=jnp.asarray(0.3),
    )
    prior = synthetic_gmm_prior()
    init = smplify.FitParams.init(model)

    results = {}
    for reduce in (False, True):
        config = smplify.FitConfig(num_iters=60, reduce_joints_only=reduce)
        _, result, losses = jax.jit(
            lambda o, i, c=config: smplify.fit(model, c, o, i, prior)
        )(obs, init)
        results[reduce] = (np.asarray(result["vertices"]),
                           np.asarray(losses))

    # Same losses along the trajectory and same final full-model vertices
    # (small float reassociation tolerance from the folded regression).
    np.testing.assert_allclose(
        results[True][1], results[False][1], rtol=2e-4)
    dev = np.abs(results[True][0] - results[False][0]).max()
    assert dev < 5e-5, dev
    # The scan's compiled forward must not touch full-V arrays: the reduced
    # model really is smaller.
    red = bm.reduce_for_joints(model)
    assert red.num_verts < model.num_verts
    assert red.shapedirs.shape[1] == red.num_verts * 3


def test_reduce_for_rows_vertices_match_full():
    """reduce_for_rows keeps the requested vertex rows bit-comparably to
    the full forward (same per-row float ops), and its joints equal the
    joints-only reduction's."""
    model = bm.synthetic_model("smplx", num_verts=1024, seed=0,
                               use_face_contour=True)
    ids = np.arange(0, model.num_verts, 4)
    red, rows = bm.reduce_for_rows(model, ids)
    assert red.num_verts < model.num_verts
    p = _random_params(model, seed=7)
    full = bm.forward(model, p)
    rout = bm.forward(red, p)
    np.testing.assert_allclose(
        np.asarray(rout.vertices)[np.asarray(rows)],
        np.asarray(full.vertices)[ids], atol=5e-6)
    jr = np.asarray(bm.forward(bm.reduce_for_joints(model), p).joints)
    np.testing.assert_allclose(np.asarray(rout.joints), jr, atol=1e-6)


def test_mask_fit_with_merged_reduction_matches_without():
    """Staged mask fit: the merged single-forward reduction follows the
    same trajectory as the unreduced path (losses to float tolerance
    through the gate, converged surfaces equal to chaos tolerance)."""
    from bodyfitting_tpu.losses.silhouette import (
        extract_contours, resample_contours,
    )
    from bodyfitting_tpu.ops.camera import perspective_projection, ring_cameras

    model = bm.synthetic_model("smplx", num_verts=1024, seed=0,
                               use_face_contour=True)
    gt = _random_params(model, seed=11)
    gj = np.asarray(bm.forward(model, gt).joints) * 0.3
    n_views = 4
    w2cs = np.asarray(ring_cameras(n_views, jnp.asarray(gj.mean(0)), 3.0))
    K = np.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]], np.float32)
    Ks = np.broadcast_to(K, (n_views, 3, 3)).copy()
    proj = np.asarray(perspective_projection(
        jnp.asarray(gj)[None].repeat(n_views, 0),
        jnp.asarray(w2cs[:, :3, :3]), jnp.asarray(w2cs[:, :3, 3]),
        jnp.asarray(Ks)))
    kps = np.concatenate(
        [proj, np.ones(proj.shape[:-1] + (1,), np.float32)], -1)

    H = 256
    mask = np.zeros((H, H), np.float32)
    mask[60:200, 90:170] = 1.0
    contours, valid = extract_contours([mask])
    rc, rw = resample_contours(contours, valid, 128)
    obs = smplify.Observations(
        w2cs=jnp.asarray(w2cs), Ks=jnp.asarray(Ks), keypoints=jnp.asarray(kps),
        view_mask=jnp.ones((n_views,)), constant_scale=jnp.asarray(0.3),
        masks=jnp.asarray(mask)[None],
        mask_w2cs=jnp.asarray(w2cs[:1]), mask_Ks=jnp.asarray(Ks[:1]),
        contours=jnp.asarray(rc), contour_valid=jnp.asarray(rw),
    )
    prior = synthetic_gmm_prior()
    init = smplify.FitParams.init(model)

    results = {}
    # mask_point_order='reference' isolates the property under test (the
    # merged reduction itself): the unreduced path sums the mask terms in
    # vertices[::4] order, so the reduced path must too for the
    # trajectories to be comparable.  The 'height' production order (same
    # terms, re-associated sum) is checked separately below.
    for reduce in (False, True):
        config = smplify.FitConfig(
            num_iters=60, imsize=256.0, use_mask=True,
            reduce_joints_only=reduce, mask_point_order="reference",
        )
        _, result, losses = jax.jit(
            lambda o, i, c=config: smplify.fit(model, c, o, i, prior)
        )(obs, init)
        assert np.isfinite(np.asarray(losses)).all()
        results[reduce] = (np.asarray(result["vertices"]),
                           np.asarray(losses))

    # 'height' point order: identical objective (the silhouette terms are
    # sums over points — reordering only re-associates float adds), so
    # the trajectory agrees through the smooth window and the converged
    # surface matches to the same chaos tolerance as the reduction check.
    config_h = smplify.FitConfig(
        num_iters=60, imsize=256.0, use_mask=True,
        reduce_joints_only=True, mask_point_order="height",
    )
    _, result_h, losses_h = jax.jit(
        lambda o, i: smplify.fit(model, config_h, o, i, prior)
    )(obs, init)
    np.testing.assert_allclose(
        np.asarray(losses_h)[:60 // 3 + 10],
        results[True][1][:60 // 3 + 10], rtol=5e-4)
    results["height"] = (np.asarray(result_h["vertices"]),
                         np.asarray(losses_h))

    # pre-gate + early post-gate: same objective to float tolerance
    gate = 60 // 3 + 1
    np.testing.assert_allclose(
        results[True][1][:gate + 10], results[False][1][:gate + 10],
        rtol=5e-4)
    # converged surfaces equal to the f32 chaos tolerance of this horizon
    body = results[False][0]
    size = float(body[:, 1].max() - body[:, 1].min())
    for key in (True, "height"):
        dv = np.linalg.norm(results[key][0] - results[False][0], axis=-1)
        assert dv.mean() < 0.01 * size, (key, dv.mean(), size)
