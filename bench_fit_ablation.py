"""Ablation: where does a headline keypoint-fit iteration spend its time?

Times the 150-frame SMPL-X fit step (the bench.py workload) with terms
knocked out one at a time, all inside one jitted scan per variant with
per-process-salted inputs and host-fetch sync (CLAUDE.md tunnel rules).

Variants:
  full        — the real fit step (keypoint loss + priors + Adam)
  fwd+adam    — model forward + Adam on a trivial loss (no keypoint/priors)
  noviews     — full loss but 1 view instead of 48 (view-scaling cost)
  nopriors    — keypoint loss only (GMM/angle/shape weights zero)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
from bodyfitting_tpu.models import body_model as bm


def make_obs(B, n_views, rng):
    K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    return smplify.Observations(
        w2cs=jnp.broadcast_to(w2c, (B, n_views, 4, 4)),
        Ks=jnp.broadcast_to(K, (B, n_views, 3, 3)),
        keypoints=jnp.asarray(
            rng.uniform(100, 400, size=(B, n_views, 135, 3)), jnp.float32
        ),
        view_mask=jnp.ones((B, n_views)),
        constant_scale=jnp.full((B,), 0.3),
    )


def timed_fit(model, config, obs, inits, prior, iters):
    import dataclasses

    from bench_common import timed_launches

    fit = jax.jit(
        jax.vmap(lambda o, i: smplify.fit(model, config, o, i, prior))
    )

    def run(off):
        o = dataclasses.replace(obs, keypoints=obs.keypoints + off)
        _, _, losses = fit(o, inits)
        float(losses.sum())

    return timed_launches(run).median / iters


def main(B=150, iters=100, only=None):
    rng = np.random.default_rng(0)
    model = bm.synthetic_model("smplx", num_verts=10475, seed=0)
    prior = synthetic_gmm_prior()
    zero_prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731

    init = smplify.FitParams.init(model)
    inits = jax.tree.map(lambda x: jnp.stack([x] * B), init)

    base = dict(num_iters=iters, imsize=512.0)
    variants = [
        ("full 48v", smplify.FitConfig(**base), make_obs(B, 48, rng), prior),
        ("1 view", smplify.FitConfig(**base), make_obs(B, 1, rng), prior),
        ("no priors", smplify.FitConfig(
            **base, pose_prior_weight=0.0, angle_prior_weight=0.0,
            shape_prior_weight=0.0,
        ), make_obs(B, 48, rng), zero_prior),
        ("no reduction", smplify.FitConfig(
            **base, reduce_joints_only=False,
        ), make_obs(B, 48, rng), prior),
    ]
    for name, config, obs, pr in variants:
        if only and only not in name:
            continue
        dt = timed_fit(model, config, obs, inits, pr, iters)
        print(f"{name:>14}: {dt*1e3:8.3f} ms/iter (B={B})", file=sys.stderr)


if __name__ == "__main__":
    # pass a substring to run a single variant (tunnel windows are short):
    #   python bench_fit_ablation.py "1 view"
    main(only=sys.argv[1] if len(sys.argv) > 1 else None)
