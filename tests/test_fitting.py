"""End-to-end fitting tests on synthetic data: ground-truth recovery."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.losses import priors
from bodyfitting_tpu.models import body_model as bm
from bodyfitting_tpu.ops.camera import perspective_projection, invert_rigid


def _ring_cameras(n, radius=3.0, imsize=256.0, focal=300.0):
    """n cameras on a ring looking at the origin."""
    w2cs, Ks = [], []
    for i in range(n):
        theta = 2 * np.pi * i / n
        eye = np.array([radius * np.sin(theta), 0.0, radius * np.cos(theta)])
        z = -eye / np.linalg.norm(eye)            # look at origin
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
        w2cs.append(np.linalg.inv(c2w))
        Ks.append(np.array([
            [focal, 0, imsize / 2], [0, focal, imsize / 2], [0, 0, 1.0]
        ]))
    return (
        jnp.asarray(np.stack(w2cs), jnp.float32),
        jnp.asarray(np.stack(Ks), jnp.float32),
    )


def _project_joints(joints, w2cs, Ks):
    return jax.vmap(
        lambda w2c, K: perspective_projection(
            joints[None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
        )[0]
    )(w2cs, Ks)


@pytest.fixture(scope="module")
def smpl_model():
    return bm.spin_joint_mapper_for_smpl(
        bm.synthetic_model("smpl", num_verts=128, seed=7)
    )


def _gt_setup(model, rng, nviews=4, imsize=256.0):
    gt_body = dataclasses.replace(
        bm.BodyParams.zeros(model),
        body_pose=jnp.asarray(rng.normal(size=69) * 0.15, jnp.float32),
        global_orient=jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32),
        betas=jnp.asarray(rng.normal(size=10) * 0.5, jnp.float32),
    )
    gt_out = bm.forward(model, gt_body)
    gt_transl = jnp.array([0.05, -0.02, 0.1])
    gt_scale = 1.15
    constant_scale = jnp.asarray(0.3)
    gt_joints = (gt_out.joints + gt_transl) * gt_scale * constant_scale

    w2cs, Ks = _ring_cameras(nviews, imsize=imsize)
    kp2d = _project_joints(gt_joints[:25], w2cs, Ks)
    keypoints = jnp.concatenate([kp2d, jnp.ones_like(kp2d[..., :1])], -1)
    obs = smplify.Observations(
        w2cs=w2cs, Ks=Ks, keypoints=keypoints,
        view_mask=jnp.ones(nviews), constant_scale=constant_scale,
    )
    return gt_joints, obs


def test_keypoint_fit_recovers_pose(smpl_model, rng):
    model = smpl_model
    gt_joints, obs = _gt_setup(model, rng)
    config = smplify.FitConfig(num_iters=400, imsize=256.0)
    init = smplify.FitParams.init(model)
    zero_prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731

    params, result, losses = jax.jit(
        lambda o, i: smplify.fit(model, config, o, i, zero_prior),
    )(obs, init)

    # loss decreased by orders of magnitude
    assert float(losses[-1]) < 0.05 * float(losses[0])
    # recovered joints reproject onto the GT keypoints within ~2px
    re = _project_joints(result["joints"][:25], obs.w2cs, obs.Ks)
    gt = obs.keypoints[..., :2]
    err = np.abs(np.asarray(re - gt)).mean()
    assert err < 2.0, err


def test_fit_vmaps_over_frames(smpl_model, rng):
    model = smpl_model
    _, obs1 = _gt_setup(model, rng)
    _, obs2 = _gt_setup(model, rng)
    obs = jax.tree.map(lambda a, b: jnp.stack([a, b]), obs1, obs2)
    init = smplify.FitParams.init(model)
    inits = jax.tree.map(lambda x: jnp.stack([x, x]), init)
    config = smplify.FitConfig(num_iters=50, imsize=256.0)
    zero_prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731

    fit_batched = jax.jit(
        jax.vmap(lambda o, i: smplify.fit(model, config, o, i, zero_prior))
    )
    params, result, losses = fit_batched(obs, inits)
    assert losses.shape == (2, 50)
    assert result["vertices"].shape == (2, model.num_verts, 3)
    # both frames improved
    assert (np.asarray(losses[:, -1]) < np.asarray(losses[:, 0])).all()


def test_jaw_frozen_by_default(rng):
    model = bm.synthetic_model("smplx", num_verts=200, seed=11)
    _, obs = _gt_setup_x(model, rng)
    config = smplify.FitConfig(num_iters=20, imsize=256.0)
    init = smplify.FitParams.init(model)
    zero_prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731
    params, _, _ = jax.jit(
        lambda o, i: smplify.fit(model, config, o, i, zero_prior)
    )(obs, init)
    # reference quirk: jaw_pose stays at init (smplify.py:167-173)
    np.testing.assert_allclose(np.asarray(params.body.jaw_pose), 0.0)
    # but eyes/hands did move
    assert np.abs(np.asarray(params.body.left_hand_pose)).max() > 0


def _gt_setup_x(model, rng, nviews=3, imsize=256.0):
    gt_body = dataclasses.replace(
        bm.BodyParams.zeros(model),
        body_pose=jnp.asarray(rng.normal(size=63) * 0.1, jnp.float32),
    )
    gt_out = bm.forward(model, gt_body)
    constant_scale = jnp.asarray(0.3)
    gt_joints = gt_out.joints * constant_scale
    w2cs, Ks = _ring_cameras(nviews, imsize=imsize)
    kp2d = _project_joints(gt_joints, w2cs, Ks)
    keypoints = jnp.concatenate([kp2d, jnp.ones_like(kp2d[..., :1])], -1)
    obs = smplify.Observations(
        w2cs=w2cs, Ks=Ks, keypoints=keypoints,
        view_mask=jnp.ones(nviews), constant_scale=constant_scale,
    )
    return gt_joints, obs


def test_mesh_fit_with_displacement(smpl_model, rng):
    """SMPL+D: fit to a 'scan' (the GT surface), displacement shrinks ICP."""
    model = smpl_model
    gt_joints, obs = _gt_setup(model, rng)
    gt_body = bm.BodyParams.zeros(model)
    scan_out = bm.forward(model, gt_body)
    scan_verts = scan_out.vertices * 0.3
    obs = dataclasses.replace(
        obs,
        scan_verts=scan_verts,
        scan_faces=model.faces,
        scan_height=jnp.asarray(
            float(scan_verts[:, 1].max() - scan_verts[:, 1].min())
        ),
    )
    config = smplify.FitConfig(
        num_iters=60, imsize=256.0, use_mesh=True, displacement=True
    )
    init = smplify.FitParams.init(model)
    zero_prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731
    params, result, losses = jax.jit(
        lambda o, i: smplify.fit(model, config, o, i, zero_prior)
    )(obs, init)
    assert "displacement" in result
    assert result["displacement"].shape == (model.num_verts, 3)
    assert np.isfinite(np.asarray(result["displacement"])).all()
    # displacement stage losses decreased
    disp_losses = np.asarray(losses[config.num_iters:])
    assert disp_losses[-1] < disp_losses[0]


def test_mask_fit_parity_full_vs_resampled_contours(smpl_model, rng):
    """Silhouette fit with arc-length-resampled contours converges to the
    same surface as with every contour pixel (the production default)."""
    from bodyfitting_tpu.losses.silhouette import (
        extract_contours,
        resample_contours,
    )

    model = smpl_model
    _, obs0 = _gt_setup(model, rng, nviews=3)

    # a synthetic person-ish silhouette seen from one mask view
    H = 256
    mask = np.zeros((H, H), np.float32)
    mask[40:220, 90:170] = 1.0
    mask[40:90, 70:190] = 1.0
    contours, valid = extract_contours([mask])
    rc, rw = resample_contours(contours, valid, 128)

    K = jnp.asarray([[200.0, 0, 128], [0, 200.0, 128], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    prior = priors.synthetic_gmm_prior()
    config = smplify.FitConfig(num_iters=90, imsize=256.0, use_mask=True)
    init = smplify.FitParams.init(model)

    results = {}
    for name, (c, v) in {
        "full": (contours, valid), "resampled": (rc, rw)
    }.items():
        obs = dataclasses.replace(
            obs0,
            masks=jnp.asarray(mask)[None],
            mask_w2cs=w2c[None], mask_Ks=K[None],
            contours=jnp.asarray(c), contour_valid=jnp.asarray(v),
        )
        _, result, losses = jax.jit(
            lambda o, i, cf=config: smplify.fit(model, cf, o, i, prior)
        )(obs, init)
        assert np.isfinite(np.asarray(losses)).all()
        results[name] = np.asarray(result["vertices"])

    dv = np.linalg.norm(results["full"] - results["resampled"], axis=-1)
    body_size = float(
        results["full"][:, 1].max() - results["full"][:, 1].min()
    )
    assert dv.mean() < 0.02 * body_size, (dv.mean(), body_size)


def test_expression_frozen_by_default_and_optimizable(rng):
    """Reference parity: expressions are never optimized (smplify.py has no
    expression tensor in opt_params); optimize_expression=True is the
    documented opt-in upgrade and must actually move them."""
    model = bm.synthetic_model("smplx", num_verts=200, seed=12)
    _, obs = _gt_setup_x(model, rng)
    init = smplify.FitParams.init(model)
    zero_prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731

    cfg_off = smplify.FitConfig(num_iters=20, imsize=256.0)
    params_off, _, _ = jax.jit(
        lambda o, i: smplify.fit(model, cfg_off, o, i, zero_prior)
    )(obs, init)
    np.testing.assert_allclose(np.asarray(params_off.body.expression), 0.0)

    cfg_on = smplify.FitConfig(
        num_iters=20, imsize=256.0, optimize_expression=True
    )
    params_on, _, losses = jax.jit(
        lambda o, i: smplify.fit(model, cfg_on, o, i, zero_prior)
    )(obs, init)
    assert np.abs(np.asarray(params_on.body.expression)).max() > 0
    assert np.isfinite(np.asarray(losses)).all()
