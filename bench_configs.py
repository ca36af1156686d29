"""Extended benchmark: all five BASELINE.json workload configs on one chip.

Prints a human-readable table (stderr-free; run ad hoc).  ``bench.py``
remains the driver-facing single-line benchmark.

Configs (BASELINE.json):
  1. single-frame neutral SMPL, 4 views, keypoint + GMM only
  2. SMPL-X with hands + face (batched frames)
  3. silhouette-augmented fit (--use_mask)
  4. SMPL+D fit to a scan (point-cloud + displacement stages)
  5. 150-frame sequence fit + texture optimization
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def _ring(n_views, imsize=512.0, focal=500.0, dist=3.0):
    w2cs, Ks = [], []
    for th in np.linspace(0, 2 * np.pi, n_views, endpoint=False):
        eye = np.array([dist * np.sin(th), 0, dist * np.cos(th)])
        z = -eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([x, y, z], 1)
        c2w[:3, 3] = eye
        w2cs.append(np.linalg.inv(c2w))
        Ks.append([[focal, 0, imsize / 2], [0, focal, imsize / 2],
                   [0, 0, 1]])
    return (jnp.asarray(np.stack(w2cs), jnp.float32),
            jnp.asarray(np.asarray(Ks), jnp.float32))


def _obs(model, rng, n_views=4, n_frames=1, use_mask=False, scan=None):
    import dataclasses

    from bodyfitting_tpu.fitting import smplify

    w2cs, Ks = _ring(n_views)
    K = 135 if model.model_type == "smplx" else 25
    kps = jnp.asarray(
        rng.uniform(100, 400, size=(n_views, K, 3)), jnp.float32
    )
    obs = smplify.Observations(
        w2cs=w2cs, Ks=Ks, keypoints=kps, view_mask=jnp.ones(n_views),
        constant_scale=jnp.asarray(0.3),
    )
    if use_mask:
        from bodyfitting_tpu.losses.silhouette import extract_contours

        masks = np.zeros((2, 512, 512), np.float32)
        masks[:, 100:400, 180:330] = 255
        contours, valid = extract_contours(list(masks), pad_to=4096)
        obs = dataclasses.replace(
            obs,
            masks=jnp.asarray(masks / 255.0),
            mask_w2cs=w2cs[:2], mask_Ks=Ks[:2],
            contours=jnp.asarray(contours),
            contour_valid=jnp.asarray(valid),
        )
    if scan is not None:
        from bodyfitting_tpu.ops.sdf import build_distance_volume

        sv, sf = scan
        obs = dataclasses.replace(
            obs,
            scan_verts=sv, scan_faces=sf,
            scan_height=jnp.asarray(
                float(sv[:, 1].max() - sv[:, 1].min())
            ),
            scan_volume=build_distance_volume(sv, sf, resolution=96),
        )
    if n_frames > 1:
        obs = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_frames,) + x.shape), obs
        )
    return obs


def _time_fit(model, config, obs, init, prior, batched, iters, label):
    import dataclasses

    from bodyfitting_tpu.fitting import smplify

    if batched:
        fit = jax.jit(jax.vmap(
            lambda o, i: smplify.fit(model, config, o, i, prior)
        ))
    else:
        fit = jax.jit(
            lambda o, i: smplify.fit(model, config, o, i, prior)
        )
    from bench_common import timed_launches

    def run(off):
        o = dataclasses.replace(obs, keypoints=obs.keypoints + off)
        _, _, losses = fit(o, init)
        float(losses.sum())

    res = timed_launches(run, warmups=1)
    dt, compile_s = res.median, res.first
    n_frames = obs.keypoints.shape[0] if batched else 1
    print(
        f"{label}: {iters} iters x {n_frames} frames in {dt * 1e3:.0f}ms "
        f"({iters / dt:.0f} it/s/frame, compile {compile_s:.0f}s, "
        f"{n_frames * (iters / dt) / 600:.2f} 600-iter fits/s/chip)"
    )
    return dt


def main():
    import argparse

    from bodyfitting_tpu import constants
    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--only", nargs="*", default=None,
        choices=["1", "2", "3", "4", "5", "5b"],
        help="run only these configs (default: all)",
    )
    cli = ap.parse_args()

    def want(label):
        return cli.only is None or label in cli.only

    rng = np.random.default_rng(0)
    prior = synthetic_gmm_prior()
    iters = 100

    print(f"devices: {jax.devices()}")

    # config 1: neutral SMPL, 4 views, keypoints + GMM
    smpl = bm.spin_joint_mapper_for_smpl(
        bm.synthetic_model("smpl", num_verts=constants.SMPL_NUM_VERTS)
    )
    cfg = smplify.FitConfig(num_iters=iters)
    if want("1"):
        _time_fit(
            smpl, cfg, _obs(smpl, rng), smplify.FitParams.init(smpl),
            prior, False, iters, "config1 smpl 4-view keypoint",
        )

    # config 2: SMPL-X hands+face, batched
    smplx = bm.synthetic_model(
        "smplx", num_verts=constants.SMPLX_NUM_VERTS
    )
    if want("2"):
        B = 64
        obs2 = _obs(smplx, rng, n_frames=B)
        init2 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape),
            smplify.FitParams.init(smplx),
        )
        _time_fit(smplx, cfg, obs2, init2, prior, True, iters,
                  f"config2 smplx batch{B}")

    # config 3: + silhouette
    if want("3"):
        cfg3 = smplify.FitConfig(num_iters=iters, use_mask=True)
        _time_fit(
            smpl, cfg3, _obs(smpl, rng, use_mask=True),
            smplify.FitParams.init(smpl), prior, False, iters,
            "config3 smpl + mask",
        )

    # config 4: SMPL+D scan fit (SDF and exact)
    if want("4"):
        scan_v = jnp.asarray(
            rng.normal(size=(40000, 3)).astype(np.float32) * 0.3
        )
        scan_f = jnp.asarray(
            rng.integers(0, 40000, size=(80000, 3)).astype(np.int32)
        )
        t0 = time.perf_counter()
        obs4 = _obs(smpl, rng, scan=(scan_v, scan_f))
        jax.block_until_ready(obs4.scan_volume.dist)
        print(f"config4 SDF volume build (80k faces, 96^3): "
              f"{time.perf_counter() - t0:.1f}s one-time")
        for impl in ("sdf", "exact"):
            cfg4 = smplify.FitConfig(
                num_iters=iters, use_mesh=True, displacement=True,
                mesh_loss_impl=impl,
            )
            _time_fit(
                smpl, cfg4, obs4, smplify.FitParams.init(smpl), prior,
                False, 2 * iters, f"config4 smpl+d scan ({impl})",
            )

    # config 5: 150-frame sequence fit (temporal coupling)
    if want("5"):
        from bodyfitting_tpu.fitting import sequence as seqmod

        B5 = 150
        obs5 = _obs(smplx, rng, n_frames=B5)
        init5 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B5,) + x.shape),
            smplify.FitParams.init(smplx),
        )
        import dataclasses

        from bench_common import timed_launches

        fit5 = jax.jit(
            lambda o, i: seqmod.fit_sequence(smplx, cfg, o, i, prior)
        )

        def run5(off):
            o = dataclasses.replace(obs5, keypoints=obs5.keypoints + off)
            _, _, losses = fit5(o, init5)
            float(losses.sum())

        res5 = timed_launches(run5, warmups=1)
        print(f"config5 150-frame smplx sequence (temporal): compile+run "
              f"{res5.first:.0f}s")
        dt = res5.median
        print(
            f"config5: {iters} iters x 150 frames in {dt * 1e3:.0f}ms "
            f"({150 * iters / dt / 600:.1f} 600-iter fits/s/chip)"
        )

    # config 5b: UV texture optimization (BASELINE config 5's second half)
    # at reference scale: 1024^2 texture, 512^2 renders, 200 Adam iters,
    # 18-ring + random-sphere schedule (texture_fitting.py:239-276)
    if want("5b"):
        from bodyfitting_tpu.fitting import texture as texfit

        sph = rng.normal(size=(2000, 3))
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        from scipy.spatial import ConvexHull

        hull_f = ConvexHull(sph).simplices.astype(np.int32)
        sv = sph.astype(np.float32)
        uu = 0.5 + np.arctan2(sv[:, 2], sv[:, 0]) / (2 * np.pi)
        vv = 0.5 + np.arcsin(np.clip(sv[:, 1], -1, 1)) / np.pi
        fuv = np.stack(
            [np.stack([uu[hull_f[:, i]], vv[hull_f[:, i]]], -1)
             for i in range(3)], 1,
        ).astype(np.float32)
        scan_tex = rng.uniform(size=(1024, 1024, 3)).astype(np.float32)
        for pre, bucketed, name in (
            (True, True, "precompute+bucketed"),
            (True, False, "precompute+gather"),
            (False, True, "re-raster"),
        ):
            walls, final = [], 0.0
            for salt in (0.0, 0.37):  # fresh texture per launch: the
                # tunnel can cache-serve repeated identical (prog, inputs)
                stex = np.clip(scan_tex + np.float32(salt), 0.0, 1.0)
                t0 = time.perf_counter()
                tex, losses = texfit.fit_texture(
                    sv, hull_f, fuv, sv, hull_f, fuv, stex,
                    texfit.TextureFitConfig(
                        iter_num=200, precompute=pre, bucketed_uv=bucketed,
                    ),
                )
                final = float(losses[-1])  # host fetch IN the timed wall
                walls.append(time.perf_counter() - t0)
            print(f"config5b texfit 200 iters ({name}): {walls[0]:.1f}s "
                  f"incl compile, {walls[1]:.1f}s warm "
                  f"(final L1 {final:.0f})")


if __name__ == "__main__":
    main()
