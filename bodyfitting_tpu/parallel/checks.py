"""Production-shape multi-chip validation problems.

Shared by ``__graft_entry__.dryrun_multichip`` (the driver's multi-chip
compile+execute gate) and the slow test suite
(tests/test_sharded_fit.py), so both exercise the same workload: a full
staged SMPL-X fit — keypoints, then mask + mesh past the stage gate — at
real asset size, shardable over a frames x views mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
from bodyfitting_tpu.models import body_model as bm


def make_production_fit_problem(rng=None, num_iters: int = 60,
                                n_frames: int = 8):
    """A full staged fit at PRODUCTION shape: SMPL-X-sized model
    (V=10475), use_mask + use_mesh (SDF), iterations spanning the stage
    gate — the workload the round-2 verdict noted had only ever run at
    toy scale on the mesh.  Returns ``(model, config, obs, init, prior)``
    batched over ``n_frames`` frames.
    """
    from bodyfitting_tpu.models.body_model import sphere_mesh
    from bodyfitting_tpu.ops import sdf
    from bodyfitting_tpu.ops.camera import perspective_projection

    if rng is None:
        rng = np.random.default_rng(0)
    model = bm.synthetic_model("smplx", num_verts=10475, seed=0)
    prior = synthetic_gmm_prior()
    config = smplify.FitConfig(
        num_iters=num_iters, imsize=512.0, use_mask=True, use_mesh=True,
        mesh_loss_impl="sdf",
    )

    n_views, n_mask_views = 4, 2
    H, Pc = 128, 256
    K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)

    # GT-ish keypoints: zero-pose joints projected + per-frame noise
    out0 = bm.forward(model, bm.BodyParams.zeros(model))
    uv = perspective_projection(
        (out0.joints * 0.3)[None], w2c[None, :3, :3], w2c[None, :3, 3],
        K[None],
    )[0]
    kps = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], 1)
    kps = jnp.broadcast_to(kps, (n_frames, n_views) + kps.shape)
    kps = kps + jnp.asarray(
        rng.normal(scale=2.0, size=kps.shape), jnp.float32
    ) * jnp.asarray([1.0, 1.0, 0.0])

    # scan: a sphere-mesh surface at body scale + its SDF volume
    sv, sf = sphere_mesh(2048, np.random.default_rng(3))
    sv = jnp.asarray(sv * 0.25, jnp.float32)
    sf = jnp.asarray(sf, jnp.int32)
    vol = sdf.build_distance_volume(sv, sf, resolution=24)

    masks = np.zeros((n_mask_views, H, H), np.float32)
    masks[:, 28:100, 40:88] = 1.0
    import cv2

    conts, valid = [], []
    for m in masks:
        c = cv2.findContours(
            (m * 255).astype(np.uint8), cv2.RETR_EXTERNAL,
            cv2.CHAIN_APPROX_NONE,
        )[0][0].reshape(-1, 2).astype(np.float32)
        idx = np.linspace(0, len(c), Pc, endpoint=False).astype(int)
        conts.append(c[idx])
        valid.append(np.full(Pc, len(c) / Pc, np.float32))
    Km = jnp.asarray([[120.0, 0, 64], [0, 120.0, 64], [0, 0, 1]])

    batch = lambda x: jnp.broadcast_to(  # noqa: E731
        jnp.asarray(x), (n_frames,) + jnp.asarray(x).shape
    )
    obs = smplify.Observations(
        w2cs=jnp.broadcast_to(w2c, (n_frames, n_views, 4, 4)),
        Ks=jnp.broadcast_to(K, (n_frames, n_views, 3, 3)),
        keypoints=kps,
        view_mask=jnp.ones((n_frames, n_views)),
        constant_scale=jnp.full((n_frames,), 0.3),
        masks=batch(np.stack(masks)),
        mask_w2cs=jnp.broadcast_to(w2c, (n_frames, n_mask_views, 4, 4)),
        mask_Ks=jnp.broadcast_to(Km, (n_frames, n_mask_views, 3, 3)),
        contours=batch(np.stack(conts)),
        contour_valid=batch(np.stack(valid)),
        scan_verts=batch(sv),
        scan_faces=batch(sf),
        scan_height=jnp.full(
            (n_frames,), float(sv[:, 1].max() - sv[:, 1].min())
        ),
        scan_volume=jax.tree.map(batch, vol),
    )
    init = jax.tree.map(
        lambda x: jnp.stack([x] * n_frames), smplify.FitParams.init(model)
    )
    return model, config, obs, init, prior
