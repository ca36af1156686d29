"""Body-model tests: invariants, differential vs loop-based numpy oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.models import body_model as bm
from tests.lbs_reference import lbs_np


@pytest.fixture(scope="module")
def smpl():
    return bm.synthetic_model("smpl", num_verts=128, seed=1)


@pytest.fixture(scope="module")
def smplx():
    return bm.synthetic_model("smplx", num_verts=200, seed=2)


def _rand_params(model, rng, pose_scale=0.4):
    zeros = bm.BodyParams.zeros(model)
    return dataclasses.replace(
        zeros,
        betas=jnp.asarray(rng.normal(size=model.num_betas) * 1.0, jnp.float32),
        global_orient=jnp.asarray(rng.normal(size=3) * pose_scale, jnp.float32),
        body_pose=jnp.asarray(
            rng.normal(size=3 * model.num_body_joints) * pose_scale, jnp.float32
        ),
        expression=jnp.asarray(
            rng.normal(size=model.num_expressions), jnp.float32
        ),
        jaw_pose=jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32),
        left_hand_pose=jnp.asarray(
            rng.normal(size=model.num_hand_pca) * 0.5, jnp.float32
        ),
        right_hand_pose=jnp.asarray(
            rng.normal(size=model.num_hand_pca) * 0.5, jnp.float32
        ),
    )


def test_zero_pose_is_template(smpl):
    out = bm.forward(smpl, bm.BodyParams.zeros(smpl))
    np.testing.assert_allclose(
        np.asarray(out.vertices), np.asarray(smpl.v_template), atol=1e-5
    )


def test_betas_linear_at_zero_pose(smpl, rng):
    betas = jnp.asarray(rng.normal(size=smpl.num_betas), jnp.float32)
    p = dataclasses.replace(bm.BodyParams.zeros(smpl), betas=betas)
    out = bm.forward(smpl, p)
    want = np.asarray(smpl.v_template) + (
        np.asarray(betas) @ np.asarray(smpl.shapedirs)
    ).reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(out.vertices), want, atol=1e-4)


def test_global_orient_is_rigid_about_root(smpl):
    aa = jnp.array([0.3, -0.2, 0.5])
    p = dataclasses.replace(bm.BodyParams.zeros(smpl), global_orient=aa)
    out = bm.forward(smpl, p)
    out0 = bm.forward(smpl, bm.BodyParams.zeros(smpl))
    from bodyfitting_tpu.ops.rotations import rodrigues

    R = np.asarray(rodrigues(aa))
    root = np.asarray(out0.joints_raw[0])
    want = (np.asarray(out0.vertices) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(out.vertices), want, atol=1e-4)


@pytest.mark.parametrize("which", ["smpl", "smplx"])
def test_differential_vs_numpy_oracle(which, smpl, smplx, rng):
    model = smpl if which == "smpl" else smplx
    params = _rand_params(model, rng)
    out = bm.forward(model, params)

    full_pose = np.asarray(out.full_pose, np.float64)
    verts_ref, joints_ref = lbs_np(
        np.asarray(model.v_template, np.float64),
        np.asarray(model.shapedirs, np.float64),
        np.asarray(model.posedirs, np.float64),
        np.asarray(model.J_regressor, np.float64),
        np.asarray(model.lbs_weights, np.float64),
        model.parents,
        np.asarray(params.betas, np.float64),
        full_pose,
        expr_dirs=(
            np.asarray(model.expr_dirs, np.float64)
            if model.expr_dirs is not None else None
        ),
        expression=(
            np.asarray(params.expression, np.float64)
            if model.num_expressions else None
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out.vertices), verts_ref, atol=2e-5, rtol=1e-4
    )
    J = model.num_joints
    np.testing.assert_allclose(
        np.asarray(out.joints_raw[:J]), joints_ref, atol=2e-5, rtol=1e-4
    )


def test_smplx_joint_layout(smplx):
    out = bm.forward(smplx, bm.BodyParams.zeros(smplx))
    # raw: 55 skeleton + 21 selector + 51 static + 17 contour landmarks
    assert out.joints_raw.shape == (144, 3)
    # mapped: 25 body + 21 + 21 hands + 68 face keypoints, OpenPose order
    assert out.joints.shape == (135, 3)
    # body block: mapped joint 0 is the nose vertex (selector extra 0)
    np.testing.assert_allclose(
        np.asarray(out.joints[0]), np.asarray(out.joints_raw[55]), atol=0
    )


def test_smpl_spin_layout(smpl):
    model = bm.spin_joint_mapper_for_smpl(smpl)
    out = bm.forward(model, bm.BodyParams.zeros(model))
    assert out.joints.shape == (49, 3)
    # SPIN joint 0 = 'OP Nose' = raw joint 24 (first selector extra)
    np.testing.assert_allclose(
        np.asarray(out.joints[0]), np.asarray(out.joints_raw[24]), atol=0
    )


def test_contour_landmarks_respond_to_yaw(smplx):
    zeros = bm.BodyParams.zeros(smplx)
    # yaw the root (part of the neck chain) by ~30 degrees
    p_yaw = dataclasses.replace(
        zeros, global_orient=jnp.array([0.0, np.deg2rad(30.0), 0.0])
    )
    out0 = bm.forward(smplx, zeros)
    out1 = bm.forward(smplx, p_yaw)
    c0 = np.asarray(out0.joints_raw[-17:])
    # contour of the yawed body, un-rotated back about the root joint
    from bodyfitting_tpu.ops.rotations import rodrigues

    R = np.asarray(rodrigues(jnp.array([0.0, np.deg2rad(30.0), 0.0])))
    root = np.asarray(out0.joints_raw[0])
    c1 = (np.asarray(out1.joints_raw[-17:]) - root) @ R + root
    # different contour table rows were selected -> not a pure rigid motion
    assert np.abs(c0 - c1).max() > 1e-4


def test_jit_vmap_grad(smplx, rng):
    params = _rand_params(smplx, rng)
    batch = jax.tree.map(lambda x: jnp.stack([x, x * 0.5]), params)

    fwd = jax.jit(jax.vmap(lambda p: bm.forward(smplx, p).vertices))
    verts = fwd(batch)
    assert verts.shape == (2, smplx.num_verts, 3)

    def loss(p):
        return jnp.sum(bm.forward(smplx, p).joints ** 2)

    g = jax.jit(jax.grad(loss))(params)
    flat = jax.tree.leaves(jax.tree.map(np.asarray, g))
    assert all(np.isfinite(x).all() for x in flat)
    assert any(np.abs(x).max() > 0 for x in flat)


def test_hand_pca_moves_hand_joints_only(smplx, rng):
    zeros = bm.BodyParams.zeros(smplx)
    p = dataclasses.replace(
        zeros, left_hand_pose=jnp.asarray(rng.normal(size=smplx.num_hand_pca),
                                          jnp.float32)
    )
    out0 = bm.forward(smplx, zeros)
    out1 = bm.forward(smplx, p)
    skel0 = np.asarray(out0.joints_raw[:55])
    skel1 = np.asarray(out1.joints_raw[:55])
    # left-hand finger joints (25..39) move; body joints (0..21) do not
    assert np.abs(skel1[25:40] - skel0[25:40]).max() > 1e-4
    np.testing.assert_allclose(skel1[:22], skel0[:22], atol=1e-5)


def test_smplh_forward():
    model = bm.synthetic_model("smplh", num_verts=96, seed=12)
    assert model.num_joints == 52 and model.num_body_joints == 21
    out = bm.forward(model, bm.BodyParams.zeros(model))
    # 52 skeleton + 21 selector joints, no landmarks
    assert out.joints_raw.shape == (73, 3)
    assert out.full_pose.shape == (156,)
    # hands driven by PCA coefficients
    p = dataclasses.replace(
        bm.BodyParams.zeros(model),
        right_hand_pose=jnp.ones(model.num_hand_pca) * 0.3,
    )
    out2 = bm.forward(model, p)
    skel0, skel1 = np.asarray(out.joints_raw), np.asarray(out2.joints_raw)
    assert np.abs(skel1[37:52] - skel0[37:52]).max() > 1e-4  # right fingers
    np.testing.assert_allclose(skel1[:22], skel0[:22], atol=1e-5)


def test_smpl_to_openpose_coco19():
    m = bm.smpl_to_openpose("smpl", openpose_format="coco19")
    assert m.shape == (19,) and m[0] == 24
    mx = bm.smpl_to_openpose("smplx", use_face_contour=True,
                             openpose_format="coco19")
    assert mx.shape == (19 + 21 + 21 + 68,)
    assert mx[0] == 55 and mx[19] == 20          # nose, left wrist
    mh = bm.smpl_to_openpose("smplh", openpose_format="coco19")
    assert mh.shape == (19 + 42,) and mh[0] == 52
