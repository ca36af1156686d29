"""Temporal sequence fitting: smoother trajectories, consistent shape."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.fitting import sequence as seq
from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.models import body_model as bm
from bodyfitting_tpu.ops.camera import perspective_projection


@pytest.fixture(scope="module")
def seq_setup():
    model = bm.spin_joint_mapper_for_smpl(
        bm.synthetic_model("smpl", num_verts=96, seed=9)
    )
    rng = np.random.default_rng(0)
    n_frames, n_views = 6, 3
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])

    w2cs = []
    for th in np.linspace(0, np.pi, n_views, endpoint=False):
        eye = np.array([3 * np.sin(th), 0, 3 * np.cos(th)])
        z = -eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z); x = x / np.linalg.norm(x)  # noqa: E702
        y = np.cross(z, x)
        c2w = np.eye(4); c2w[:3, :3] = np.stack([x, y, z], 1)  # noqa: E702
        c2w[:3, 3] = eye
        w2cs.append(np.linalg.inv(c2w).astype(np.float32))
    w2cs = jnp.asarray(np.stack(w2cs))
    Ks = jnp.broadcast_to(K, (n_views, 3, 3))

    # a smooth GT motion + noisy keypoints (frame-wise independent noise)
    base_pose = rng.normal(size=69) * 0.1
    direction = rng.normal(size=69) * 0.05
    obs_list, gt_joints = [], []
    for t in range(n_frames):
        gt = dataclasses.replace(
            bm.BodyParams.zeros(model),
            body_pose=jnp.asarray(base_pose + t * direction, jnp.float32),
        )
        joints = bm.forward(model, gt).joints * 0.3
        gt_joints.append(joints)
        kp = jax.vmap(
            lambda w, K_: perspective_projection(
                joints[:25][None], w[None, :3, :3], w[None, :3, 3],
                K_[None],
            )[0]
        )(w2cs, Ks)
        kp = kp + jnp.asarray(
            rng.normal(scale=3.0, size=kp.shape), jnp.float32
        )
        obs_list.append(smplify.Observations(
            w2cs=w2cs, Ks=Ks,
            keypoints=jnp.concatenate(
                [kp, jnp.ones_like(kp[..., :1])], -1
            ),
            view_mask=jnp.ones(n_views),
            constant_scale=jnp.asarray(0.3),
        ))
    obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
    return model, obs, jnp.stack(gt_joints)


def test_temporal_fit_is_smoother(seq_setup):
    model, obs, gt_joints = seq_setup
    config = smplify.FitConfig(num_iters=150, imsize=256.0)
    init = smplify.FitParams.init(model)
    inits = jax.tree.map(lambda x: jnp.stack([x] * 6), init)
    prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731

    # independent per-frame fits
    _, res_ind, _ = jax.jit(jax.vmap(
        lambda o, i: smplify.fit(model, config, o, i, prior)
    ))(obs, inits)
    # joint fit with temporal smoothing
    _, res_seq, losses = jax.jit(
        lambda o, i: seq.fit_sequence(model, config, o, i, prior)
    )(obs, inits)
    assert np.isfinite(np.asarray(losses)).all()

    def jitter(joints):
        v = np.diff(np.asarray(joints), axis=0)
        return float(np.mean(np.linalg.norm(v, axis=-1)))

    jit_ind = jitter(res_ind["joints"])
    jit_seq = jitter(res_seq["joints"])
    gt_vel = jitter(gt_joints)
    # smoothing reduces frame-to-frame jitter towards (not below half of)
    # the true motion magnitude
    assert jit_seq < jit_ind
    assert jit_seq > 0.2 * gt_vel

    # betas consistency: per-frame shape spread shrinks
    spread_ind = float(np.asarray(res_ind["betas"]).std(axis=0).mean())
    spread_seq = float(np.asarray(res_seq["betas"]).std(axis=0).mean())
    assert spread_seq < spread_ind


def test_temporal_loss_zero_for_constant_motionless():
    model = bm.synthetic_model("smpl", num_verts=64, seed=1)
    init = smplify.FitParams.init(model)
    batched = jax.tree.map(lambda x: jnp.stack([x] * 4), init)
    assert float(seq.temporal_loss(batched, seq.TemporalConfig())) == 0.0
