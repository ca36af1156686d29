"""Ablation: where does a production mask-config (3b) iteration spend
its time?

Config 3b (SMPL-X, 48 keypoint views, 8 GT masks @512^2) is per-frame-
work bound (batch sweep is throughput-flat: 2.06/2.15/2.10 fits/s/chip
at B=8/32/64 — r4), so the lever is cutting per-frame math, and the
first question is WHICH term owns the ~0.76 ms/frame/iter.  Variants
knock the silhouette terms out at trace time (the `terms` knob of
``losses.silhouette.silhouette_loss``), everything else identical:

  full        — icp + stay-inside (production)
  icp_only    — contour-ICP term only
  binary_only — differentiable stay-inside term only
  none        — silhouette loss pinned to 0.0 (keypoint + priors + LBS
                + Adam + branch overhead)

Timing protocol: whole 100-iter fits inside one jitted scan with salted
inputs, fetch-synced (bench_common.timed_fit_repeats) — session-
invariant per CLAUDE.md tunnel rules.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.losses import silhouette
from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
from bodyfitting_tpu.models import body_model as bm


def main(B=32, iters=100, only=None):
    from bench_common import timed_fit_repeats
    from bench_configs import _obs

    rng = np.random.default_rng(0)
    smplx = bm.synthetic_model("smplx", num_verts=10475, seed=0,
                               use_face_contour=True)
    prior = synthetic_gmm_prior()

    obs = _obs(smplx, rng, n_views=48)
    masks = np.zeros((8, 512, 512), np.float32)
    masks[:, 100:400, 180:330] = 255
    contours, valid = silhouette.extract_contours(list(masks))
    rc, rw = silhouette.resample_contours(contours, valid, 512)
    import dataclasses

    crops, origins, _ = silhouette.compute_mask_crops(list(masks))
    obs = dataclasses.replace(
        obs,
        masks=jnp.asarray(masks / 255.0),
        mask_w2cs=obs.w2cs[:8],
        mask_Ks=obs.Ks[:8],
        contours=jnp.asarray(rc),
        contour_valid=jnp.asarray(rw),
        mask_crops=jnp.asarray(crops),
        mask_crop_origins=jnp.asarray(origins),
        mask_view_valid=jnp.ones(8, jnp.float32),
    )
    obs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), obs)
    init = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape),
        smplify.FitParams.init(smplx),
    )
    cfg = smplify.FitConfig(num_iters=iters, use_mask=True)

    real = silhouette.silhouette_loss

    def lbs_only(contours, contour_valid, masks, w2cs, Ks, verts, **kw):
        # control: full-vertex LBS + projection + reductions flow, but a
        # TRIVIAL sampler — isolates the gated branch's vertex machinery
        # (the 'none' variant DCEs get_vertices entirely) from the
        # stay-inside sampler itself
        from bodyfitting_tpu.ops.camera import perspective_projection

        pts3d = verts[::4]

        def per_view(w2c, K):
            proj = perspective_projection(
                pts3d[None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
            )[0]
            return jnp.sum(proj[:, 1] - proj[:, 0] * 1e-3)

        return jnp.sum(jax.vmap(per_view)(w2cs, Ks))

    variants = {
        "none": lambda *a, **k: jnp.zeros(()),
        "lbs_proj_only": lbs_only,
        "icp_only": functools.partial(real, terms=("icp",)),
        "binary_only": functools.partial(real, terms=("binary",)),
        "full": real,
    }
    base = None
    for name, impl in variants.items():
        if only and name not in only:
            continue
        smplify.silhouette_loss = impl
        try:
            def fit_losses(o):
                return jax.vmap(
                    lambda oo, i: smplify.fit(smplx, cfg, oo, i, prior)[2]
                )(o, init)

            res = timed_fit_repeats(fit_losses, obs, repeats=2)
        finally:
            smplify.silhouette_loss = real
        per_iter = res.median / iters
        per_frame = per_iter / B * 1e6
        line = (f"{name:12s}: {res.median * 1e3:7.0f} ms / {iters} iters @ "
                f"B={B} ({per_iter * 1e3:6.2f} ms/iter, "
                f"{per_frame:5.1f} us/frame/iter, compile {res.first:.0f}s)")
        if name == "none":
            base = per_iter
        elif base is not None:
            line += f" [terms add {(per_iter - base) * 1e3:.2f} ms/iter]"
        print(line, flush=True)


if __name__ == "__main__":
    only = sys.argv[1:] or None
    # time "none" first so term deltas print inline
    main(only=only)
