"""Batch-scaling of the headline keypoint fit with/without view-chunked
keypoint-loss accumulation (FitConfig.view_chunk, VERDICT r3 item 7)."""
import sys
import numpy as np, jax, jax.numpy as jnp

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
from bodyfitting_tpu.models import body_model as bm
from bench_common import timed_fit_repeats

iters = 600
model = bm.synthetic_model("smplx", num_verts=10475, seed=0)
prior = synthetic_gmm_prior()
rng = np.random.default_rng(0)
K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
w2c = jnp.eye(4).at[2, 3].set(3.0)

for B in (150, 600, 1200):
    obs = smplify.Observations(
        w2cs=jnp.broadcast_to(w2c, (B, 48, 4, 4)),
        Ks=jnp.broadcast_to(K, (B, 48, 3, 3)),
        keypoints=jnp.asarray(
            rng.uniform(100, 400, size=(B, 48, 135, 3)), jnp.float32),
        view_mask=jnp.ones((B, 48)),
        constant_scale=jnp.full((B,), 0.3),
    )
    init = jax.tree.map(
        lambda x: jnp.stack([x] * B), smplify.FitParams.init(model))
    for vc in (0, 16):
        cfg = smplify.FitConfig(num_iters=iters, view_chunk=vc)
        def fit_losses(o, cfg=cfg, init=init):
            return jax.vmap(
                lambda oo, i: smplify.fit(model, cfg, oo, i, prior)[2]
            )(o, init)
        res = timed_fit_repeats(fit_losses, obs, repeats=2, runs=3)
        print(f"B={B:5d} view_chunk={vc:2d}: {res.median:.3f}s/fit-batch "
              f"-> {B / res.median:.1f} fits/s/chip "
              f"(walls {'/'.join(f'{w:.3f}' for w in res.walls)}, "
              f"compile {res.first:.0f}s)", flush=True)
