"""Observability + checkpoint/resume tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.fitting import checkpointing as ck
from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.models import body_model as bm
from bodyfitting_tpu.utils.observability import LossTrace, StageTimer


def test_loss_trace_roundtrip(tmp_path):
    path = str(tmp_path / "trace.jsonl")
    tr = LossTrace(path)
    tr.record(0, np.linspace(10, 1, 50), terms={"body_loss": 3.0})
    tr.record(1, np.linspace(8, 2, 50))
    lines = [json.loads(x) for x in open(path)]
    assert len(lines) == 2
    assert lines[0]["loss_first"] == 10 and lines[0]["loss_last"] == 1
    assert lines[0]["terms"]["body_loss"] == 3.0
    csv = tr.to_csv()
    assert os.path.exists(csv)
    assert open(csv).readline().strip() == "frame,iter,loss"


def test_stage_timer():
    st = StageTimer()
    with st.stage("a"):
        pass
    with st.stage("a"):
        pass
    with st.stage("b"):
        pass
    s = st.summary()
    assert s["a"]["calls"] == 2 and s["b"]["calls"] == 1


@pytest.fixture(scope="module")
def fit_setup():
    import dataclasses

    model = bm.spin_joint_mapper_for_smpl(
        bm.synthetic_model("smpl", num_verts=96, seed=3)
    )
    rng = np.random.default_rng(0)
    gt = dataclasses.replace(
        bm.BodyParams.zeros(model),
        body_pose=jnp.asarray(rng.normal(size=69) * 0.1, jnp.float32),
    )
    joints = bm.forward(model, gt).joints * 0.3
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
    w2cs, Ks, kps = [], [], []
    for th in (0.0, np.pi / 2, np.pi):
        eye = np.array([3 * np.sin(th), 0, 3 * np.cos(th)])
        z = -eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z); x = x / np.linalg.norm(x)  # noqa: E702
        y = np.cross(z, x)
        c2w = np.eye(4); c2w[:3, :3] = np.stack([x, y, z], 1)  # noqa: E702
        c2w[:3, 3] = eye
        w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
        from bodyfitting_tpu.ops.camera import perspective_projection

        uv = perspective_projection(
            joints[:25][None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
        )[0]
        w2cs.append(w2c)
        Ks.append(K)
        kps.append(jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], 1))
    obs = smplify.Observations(
        w2cs=jnp.stack(w2cs), Ks=jnp.stack(Ks),
        keypoints=jnp.stack(kps), view_mask=jnp.ones(3),
        constant_scale=jnp.asarray(0.3),
    )
    return model, obs


def test_resumable_fit_matches_plain_fit(fit_setup, tmp_path):
    model, obs = fit_setup
    config = smplify.FitConfig(num_iters=60, imsize=256.0)
    init = smplify.FitParams.init(model)
    prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731

    _, res_plain, losses_plain = jax.jit(
        lambda o, i: smplify.fit(model, config, o, i, prior)
    )(obs, init)
    _, res_chunked, losses_chunked = ck.fit_resumable(
        model, config, obs, init, prior,
        checkpoint_path=str(tmp_path / "fit.ckpt"), chunk_size=17,
    )
    np.testing.assert_allclose(
        np.asarray(losses_chunked), np.asarray(losses_plain), rtol=2e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_chunked["vertices"]),
        np.asarray(res_plain["vertices"]), atol=1e-4,
    )


def test_resume_from_partial_checkpoint(fit_setup, tmp_path):
    model, obs = fit_setup
    config = smplify.FitConfig(num_iters=40, imsize=256.0)
    init = smplify.FitParams.init(model)
    prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731
    path = str(tmp_path / "resume.ckpt")

    # run only the first 20 steps (simulate a crash after 1 chunk)
    half = smplify.FitConfig(num_iters=20, imsize=256.0)
    ck.fit_resumable(model, half, obs, init, prior,
                     checkpoint_path=path, chunk_size=20)

    # resume to the full 40: must equal a straight 40-step run, and the
    # returned trace must cover ALL 40 steps (pre-resume history restored
    # from the sidecar), not just the post-resume chunk
    _, res_resumed, losses_resumed = ck.fit_resumable(
        model, config, obs, init, prior,
        checkpoint_path=path, chunk_size=20,
    )
    assert losses_resumed.shape == (40,)
    _, res_full, losses_full = ck.fit_resumable(
        model, config, obs, init, prior, checkpoint_path=None,
        chunk_size=40,
    )
    np.testing.assert_allclose(
        np.asarray(losses_resumed), np.asarray(losses_full), rtol=2e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_resumed["vertices"]),
        np.asarray(res_full["vertices"]), atol=1e-4,
    )


def test_profiler_trace_writes(tmp_path):
    from bodyfitting_tpu.utils.observability import profiler_trace

    with profiler_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found  # something was captured
