"""Extra orchestration paths: smpl->smplx init, kid blend, HMR init."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.fitting import body_fitting as bf
from bodyfitting_tpu.models import body_model as bm


def test_smplx_init_from_smpl_result():
    smplx = bm.synthetic_model("smplx", num_verts=128, seed=2)
    result = {
        "pose": np.linspace(-0.5, 0.5, 69).astype(np.float32),
        "betas": np.arange(10, dtype=np.float32) * 0.1,
        "global_orient": np.array([0.1, 0.2, 0.3], np.float32),
        "global_transl": np.array([0.2, 0.4, 0.6], np.float32),
        "scale": np.array([2.0], np.float32),
    }
    init = bf.smplx_init_from_smpl(smplx, result)
    assert init.body.body_pose.shape == (63,)
    np.testing.assert_allclose(
        np.asarray(init.body.body_pose), result["pose"][:63]
    )
    np.testing.assert_allclose(
        np.asarray(init.body.betas), result["betas"], atol=1e-6
    )
    # transl was stored as transl*scale: seeding undoes the product
    np.testing.assert_allclose(
        np.asarray(init.global_transl * init.body_scale),
        result["global_transl"], atol=1e-6,
    )
    assert float(jnp.abs(init.body.left_hand_pose).max()) == 0.0


def test_kid_shape_dir_blend():
    model = bm.synthetic_model("smpl", num_verts=64, seed=3)
    rng = np.random.default_rng(0)
    kid_dir = rng.normal(scale=0.05, size=(64 * 3,)).astype(np.float32)
    kid_model = dataclasses.replace(
        model,
        kid_shape_dir=jnp.asarray(kid_dir),
        num_betas=model.num_betas + 1,
    )
    p0 = bm.BodyParams.zeros(kid_model)
    assert p0.betas.shape == (11,)
    out0 = bm.forward(kid_model, p0)
    p1 = dataclasses.replace(p0, betas=p0.betas.at[-1].set(1.0))
    out1 = bm.forward(kid_model, p1)
    # the 11th beta blends exactly along the kid direction at zero pose
    np.testing.assert_allclose(
        np.asarray(out1.vertices - out0.vertices),
        kid_dir.reshape(-1, 3), atol=1e-5,
    )


def test_hmr_init_mean_fallback_world_rotation():
    c2w = np.eye(4, dtype=np.float32)
    th = np.pi / 2
    c2w[:3, :3] = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32,
    )
    betas, poses = bf.hmr_init(None, c2w, None)
    assert betas.shape == (10,) and poses.shape == (72,)
    # global orient = c2w rotation (90deg about y) as axis-angle
    np.testing.assert_allclose(
        poses[:3], [0.0, np.pi / 2, 0.0], atol=1e-5
    )
    np.testing.assert_allclose(poses[3:], 0.0, atol=1e-6)
