"""Hardware-utilization accounting: MFU / roofline per flagship program.

For each headline program this compiles the exact jitted computation the
benches run, pulls XLA's own cost model (``compiled.cost_analysis()``:
FLOPs and bytes accessed), times it under the tunnel-safe protocol, and
reports achieved TFLOP/s and HBM GB/s against the chip's peaks — naming
the binding constraint (compute-, bandwidth- or latency/overhead-bound)
per config.  Round-2 verdict item 3: "faster than a weak baseline" is not
"fast"; this quantifies headroom.

TPU v5e (one chip) peaks used:
  - MXU: 197 TFLOP/s bf16 (f32 matmuls run as multi-pass bf16, so f32
    programs top out well below this — MFU is quoted against the bf16
    peak, i.e. conservatively);
  - HBM: 819 GB/s, 16 GB.

Run from the repo root (TPU): ``python bench_mfu.py [--quick]``.
"""

import argparse
import sys

import numpy as np

PEAK_FLOPS = 197e12       # v5e bf16
PEAK_HBM = 819e9          # v5e bytes/s


def cost_of(compiled):
    """(flops, bytes) from XLA's cost model; None if unavailable."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0)
        )
    except Exception as e:  # noqa: BLE001
        print(f"  cost_analysis unavailable: {e}", file=sys.stderr)
        return None, None


def report(name, wall, flops, nbytes, notes=""):
    if flops is None:
        print(f"{name}: wall {wall:.3f}s, cost model unavailable")
        return
    tf = flops / wall / 1e12
    gb = nbytes / wall / 1e9
    mfu = flops / wall / PEAK_FLOPS
    t_flops = flops / PEAK_FLOPS
    t_mem = nbytes / PEAK_HBM
    bound = "compute" if t_flops > t_mem else "bandwidth"
    model_t = max(t_flops, t_mem)
    if model_t < 0.5 * wall:
        bound = (
            f"latency/overhead (roofline says {model_t:.3f}s; "
            f"{bound} at the limit)"
        )
    print(
        f"{name}:\n"
        f"  wall {wall:.3f}s | {flops/1e12:.4g} TFLOP, "
        f"{nbytes/1e9:.2f} GB touched\n"
        f"  achieved {tf:.3g} TFLOP/s ({100*mfu:.2g}% of bf16 peak), "
        f"{gb:.0f} GB/s ({100*nbytes/wall/PEAK_HBM:.1f}% of HBM peak)\n"
        f"  binding constraint: {bound}  {notes}"
    )


def timed(fn, *args, perturb, runs=3):
    """Wall of fn(*args) with per-launch perturbed inputs (tunnel rules)."""
    from bench_common import timed_launches

    def run(off):
        out = fn(*perturb(args, off))
        import jax

        jax.block_until_ready(out)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

    return timed_launches(run, warmups=1, runs=runs).median


def bench_headline(iters, frames, views):
    """North-star keypoint fit: `frames` x `views`, `iters` Adam steps."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm

    model = bm.synthetic_model("smplx", num_verts=10475, seed=0)
    prior = synthetic_gmm_prior()
    config = smplify.FitConfig(num_iters=iters, imsize=512.0)
    rng = np.random.default_rng(0)
    K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    obs = smplify.Observations(
        w2cs=jnp.broadcast_to(w2c, (frames, views, 4, 4)),
        Ks=jnp.broadcast_to(K, (frames, views, 3, 3)),
        keypoints=jnp.asarray(
            rng.uniform(100, 400, size=(frames, views, 135, 3)),
            jnp.float32,
        ),
        view_mask=jnp.ones((frames, views)),
        constant_scale=jnp.full((frames,), 0.3),
    )
    inits = jax.tree.map(
        lambda x: jnp.stack([x] * frames), smplify.FitParams.init(model)
    )
    fit = jax.jit(
        jax.vmap(lambda o, i: smplify.fit(model, config, o, i, prior))
    )
    compiled = fit.lower(obs, inits).compile()
    flops, nbytes = cost_of(compiled)

    def perturb(args, off):
        o, i = args
        return dataclasses.replace(o, keypoints=o.keypoints + off), i

    wall = timed(compiled, obs, inits, perturb=perturb)
    report(
        f"headline keypoint fit ({frames}f x {views}v x {iters} iters)",
        wall, flops, nbytes,
        notes="(joints-only reduction on: V-independent hot loop)",
    )


def bench_staged(iters, frames):
    """Production staged fit: mask + mesh past the gate at SMPL-X size."""
    import dataclasses

    import jax

    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.parallel.checks import make_production_fit_problem

    model, config, obs, init, prior = make_production_fit_problem(
        num_iters=iters, n_frames=frames
    )
    fit = jax.jit(
        jax.vmap(lambda o, i: smplify.fit(model, config, o, i, prior))
    )
    compiled = fit.lower(obs, init).compile()
    flops, nbytes = cost_of(compiled)

    def perturb(args, off):
        o, i = args
        return dataclasses.replace(o, keypoints=o.keypoints + off), i

    wall = timed(compiled, obs, init, perturb=perturb)
    report(
        f"staged mask+mesh fit ({frames}f x {iters} iters, 128^2 masks, "
        f"24^3 SDF)", wall, flops, nbytes,
        notes="(configs 3/4 shape)",
    )


def bench_texfit(iters):
    """Texture fit, re-raster and bucketed one-hot iteration programs."""
    import jax
    import jax.numpy as jnp
    import optax

    from bodyfitting_tpu.fitting import texture as texfit
    from bodyfitting_tpu.ops import uv_sample as uvs

    rng = np.random.default_rng(0)
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
    scan_tex = jnp.asarray(rng.uniform(size=(1024, 1024, 3)), jnp.float32)

    cfg = texfit.TextureFitConfig(iter_num=iters)
    center, _, dist = texfit.scene_bounds(sv)
    poses = jnp.asarray(texfit.training_pose_schedule(cfg, center, dist))
    K = jnp.asarray(texfit.default_K(cfg.render_img_size))
    svj, sfj, suvj = map(jnp.asarray, (sv, hull_f, fuv))
    tx = optax.adam(cfg.lr)
    init_tex = jnp.full((1024, 1024, 3), 0.5)

    # --- re-raster program (the fit_texture default path, inlined so the
    # compiled object is inspectable) ---------------------------------------
    def reraster_loss(t, w2c, scene):
        smpl_v, smpl_f, smpl_uv, scan_t = scene
        scan_img, _ = texfit.render_textured(
            smpl_v, smpl_f, smpl_uv, scan_t, w2c, K, 512, cfg.face_block
        )
        scan_img = jax.lax.stop_gradient(scan_img)
        smpl_img, _ = texfit.render_textured(
            smpl_v, smpl_f, smpl_uv, t, w2c, K, 512, cfg.face_block
        )
        return jnp.sum(jnp.abs(scan_img - smpl_img))

    def run_reraster(tex0, scene, xs):
        opt_state = tx.init(tex0)

        def step(carry, x):
            tex, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda t: reraster_loss(t, x, scene)
            )(tex)
            updates, opt_state = tx.update(grads, opt_state, tex)
            tex = optax.apply_updates(tex, updates)
            return (jnp.clip(tex, 0.0, 1.0), opt_state), loss

        (tex, _), losses = jax.lax.scan(step, (tex0, opt_state), xs)
        return losses

    scene = (svj, sfj, suvj, scan_tex)
    jr = jax.jit(run_reraster)
    compiled = jr.lower(init_tex, scene, poses).compile()
    flops, nbytes = cost_of(compiled)
    wall = timed(
        compiled, init_tex, scene, poses,
        perturb=lambda a, off: (jnp.clip(a[0] + off * 1e-5, 0, 1),)
        + a[1:],
    )
    report(f"texfit re-raster ({iters} iters @512^2/1024^2)", wall, flops,
           nbytes)

    # --- bucketed one-hot Adam program (plans prebuilt) ---------------------
    uniq, pose_index = np.unique(
        np.asarray(poses).reshape(len(poses), -1), axis=0,
        return_inverse=True,
    )
    tex4, _ = texfit.fit_texture(   # warms the maps/plan path
        sv, hull_f, fuv, sv, hull_f, fuv, np.asarray(scan_tex),
        texfit.TextureFitConfig(iter_num=2, precompute=True,
                                bucketed_uv=True),
    )
    # rebuild the stacked plan exactly as fit_texture does, to time the
    # adam program alone
    from bodyfitting_tpu.ops import rasterize as rz
    from bodyfitting_tpu.ops.pallas_kernels import auto_rasterize

    def maps(w2c):
        scan_img, _ = texfit.render_textured(
            svj, sfj, suvj, scan_tex, w2c, K, 512, cfg.face_block
        )
        px, fz = rz.project_faces(svj, sfj, w2c, K)
        raster = auto_rasterize(px, fz, 512, face_block=cfg.face_block)
        return scan_img, rz.interpolate_uvs(raster, suvj), \
            raster.face_idx >= 0

    mj = jax.jit(maps)
    per_pose = [mj(jnp.asarray(u.reshape(4, 4), jnp.float32))
                for u in uniq]
    scan_imgs, uv_maps, fgs = (
        jnp.stack([m[k] for m in per_pose]) for k in range(3)
    )
    build = jax.jit(jax.vmap(
        lambda um, fg, si: uvs.build_uv_sample_plan_device(
            um, fg, si, 1024, background=1.0, chunk=cfg.uv_chunk,
            window_rows=cfg.uv_window_rows,
        )
    ))
    plans = build(uv_maps, fgs, scan_imgs)
    stacked = uvs.trim_plan(plans, uvs.used_items(plans))
    pose_idx = jnp.asarray(pose_index.astype(np.int32))

    def run_bucketed(tex0, stacked_, xs):
        opt_state = tx.init(tex0)

        def step(carry, x):
            tex, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda t: uvs.plan_l1_loss(t, uvs.index_plan(stacked_, x))
            )(tex)
            updates, opt_state = tx.update(grads, opt_state, tex)
            tex = optax.apply_updates(tex, updates)
            return (jnp.clip(tex, 0.0, 1.0), opt_state), loss

        (tex, _), losses = jax.lax.scan(step, (tex0, opt_state), xs)
        return losses

    jb = jax.jit(run_bucketed)
    compiled_b = jb.lower(init_tex, stacked, pose_idx).compile()
    flops_b, nbytes_b = cost_of(compiled_b)
    wall_b = timed(
        compiled_b, init_tex, stacked, pose_idx,
        perturb=lambda a, off: (jnp.clip(a[0] + off * 1e-5, 0, 1),)
        + a[1:],
    )
    report(f"texfit bucketed one-hot adam ({iters} iters)", wall_b,
           flops_b, nbytes_b,
           notes="(plans prebuilt once per scene)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", nargs="*", default=None,
                    choices=["headline", "staged", "texfit"])
    args = ap.parse_args()
    want = lambda n: args.only is None or n in args.only  # noqa: E731

    if args.quick:
        if want("headline"):
            bench_headline(iters=100, frames=16, views=48)
        if want("staged"):
            bench_staged(iters=60, frames=4)
        if want("texfit"):
            bench_texfit(iters=50)
    else:
        if want("headline"):
            bench_headline(iters=600, frames=150, views=48)
        if want("staged"):
            bench_staged(iters=600, frames=8)
        if want("texfit"):
            bench_texfit(iters=200)


if __name__ == "__main__":
    main()
