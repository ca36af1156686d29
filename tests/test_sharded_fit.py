"""Sharded sequence fitting over the 8-device mesh matches single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
from bodyfitting_tpu.models import body_model as bm
from bodyfitting_tpu.parallel import sharding as sh


def test_fit_sequence_sharded_matches_local(rng):
    model = bm.synthetic_model("smplx", num_verts=128, seed=8)
    prior = synthetic_gmm_prior()
    config = smplify.FitConfig(num_iters=20, imsize=256.0)

    n_frames, n_views = 8, 4
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    obs = smplify.Observations(
        w2cs=jnp.broadcast_to(w2c, (n_frames, n_views, 4, 4)),
        Ks=jnp.broadcast_to(K, (n_frames, n_views, 3, 3)),
        keypoints=jnp.asarray(
            rng.uniform(50, 200, size=(n_frames, n_views, 135, 3)),
            jnp.float32,
        ),
        view_mask=jnp.ones((n_frames, n_views)),
        constant_scale=jnp.full((n_frames,), 0.3),
    )
    init = jax.tree.map(
        lambda x: jnp.stack([x] * n_frames),
        smplify.FitParams.init(model),
    )

    mesh = sh.make_mesh(4, 2)
    _, res_sharded, losses_sharded = sh.fit_sequence_sharded(
        model, config, obs, init, prior, mesh=mesh
    )

    fit_local = jax.jit(jax.vmap(
        lambda o, i: smplify.fit(model, config, o, i, prior)
    ))
    _, res_local, losses_local = fit_local(obs, init)

    np.testing.assert_allclose(
        np.asarray(losses_sharded), np.asarray(losses_local),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded["vertices"]),
        np.asarray(res_local["vertices"]), atol=1e-4,
    )
    # outputs land sharded over the frames axis
    sharding = res_sharded["vertices"].sharding
    assert len(sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_full_fit_production_shape(rng):
    """60-iteration staged full fit (keypoints -> gate -> +mask +mesh) at
    SMPL-X size, sharded over the 8-device mesh, matches the identical
    single-device run: trajectory through the stage gate and converged
    vertices (round-2 verdict item 6)."""
    from bodyfitting_tpu.parallel.checks import make_production_fit_problem

    model, config, obs, init, prior = make_production_fit_problem(rng)

    mesh = sh.make_mesh(4, 2)
    _, res_sharded, losses_sharded = sh.fit_sequence_sharded(
        model, config, obs, init, prior, mesh=mesh
    )
    losses_sharded = np.asarray(losses_sharded)

    fit_local = jax.jit(jax.vmap(
        lambda o, i: smplify.fit(model, config, o, i, prior)
    ))
    _, res_local, losses_local = fit_local(obs, init)
    losses_local = np.asarray(losses_local)

    gate = config.num_iters // config.stage_gate_den
    assert losses_sharded.shape == (8, config.num_iters)
    # the staged branch actually fires: losses jump when mask+mesh join
    assert (losses_local[:, gate + 1] > 1.5 * losses_local[:, gate]).all()
    np.testing.assert_allclose(
        losses_sharded, losses_local, rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded["vertices"]),
        np.asarray(res_local["vertices"]), atol=1e-4,
    )
    assert len(res_sharded["vertices"].sharding.device_set) == 8
