"""SDF-vs-exact mesh-loss equivalence at realistic scan scale, on the chip.

The default mesh loss queries a precomputed distance volume
(``FitConfig.mesh_loss_impl='sdf'``, ~136x the reference's per-iteration
exact nearest-point sweep, /root/reference/smplify/smplify.py:205-206 and
thirdparty mesh_grid).  This measures what that approximation costs in
*fit accuracy*: one full SMPL+D fit (keypoint + point-cloud + displacement
stages, 600 iters each) against an ~80k-face synthetic scan, run once per
implementation, comparing the final fitted vertex fields.

Writes the measured bound into BENCH_NOTES.md (--update-notes) and prints
a JSON summary.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def build_scan(n_base: int = 40000, seed: int = 3):
    """A synthetic human-ish scan: noisy body-model surface, ~80k faces."""
    import jax.numpy as jnp
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(seed)
    # ellipsoid-ish blob with limbs: sample a GT body model surface
    from bodyfitting_tpu.models import body_model as bm

    model = bm.synthetic_model("smpl", num_verts=2048, seed=seed)
    out = bm.forward(model, bm.BodyParams.zeros(model))
    base = np.asarray(out.vertices) * 0.3
    # densify: jitter base points into a cloud, take its convex hull parts
    pts = base[rng.integers(0, base.shape[0], n_base)]
    pts = pts + rng.normal(scale=0.01, size=pts.shape)
    hull = ConvexHull(pts)
    verts = pts.astype(np.float32)
    faces = hull.simplices.astype(np.int32)
    # hull gives ~2*n_surface faces; tile with jittered copies to reach ~80k
    all_f = [faces]
    while sum(f.shape[0] for f in all_f) < 78000:
        all_f.append(faces)
    faces = np.concatenate(all_f)[:80000]
    return jnp.asarray(verts), jnp.asarray(faces)


def run(impl: str, scan_verts, scan_faces, num_iters: int):
    import jax
    import jax.numpy as jnp

    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm
    from bodyfitting_tpu.ops import sdf
    from bodyfitting_tpu.ops.camera import perspective_projection

    model = bm.spin_joint_mapper_for_smpl(
        bm.synthetic_model("smpl", num_verts=6890, seed=0)
    )
    height = float(scan_verts[:, 1].max() - scan_verts[:, 1].min())
    K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    gt = bm.forward(model, bm.BodyParams.zeros(model))
    joints = gt.joints * (height / 1.7)
    uv = perspective_projection(
        joints[:25][None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
    )[0]
    kps = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], 1)

    obs = smplify.Observations(
        w2cs=w2c[None], Ks=K[None], keypoints=kps[None],
        view_mask=jnp.ones(1),
        constant_scale=jnp.asarray(height / 1.7),
        scan_verts=scan_verts, scan_faces=scan_faces,
        scan_height=jnp.asarray(height),
    )
    t_build = 0.0
    if impl == "sdf":
        t0 = time.perf_counter()
        vol = sdf.build_distance_volume(scan_verts, scan_faces)
        jax.block_until_ready(vol.dist)
        t_build = time.perf_counter() - t0
        import dataclasses

        obs = dataclasses.replace(obs, scan_volume=vol)

    config = smplify.FitConfig(
        num_iters=num_iters, imsize=512.0, use_mesh=True, displacement=True,
        mesh_loss_impl=impl,
    )
    prior = synthetic_gmm_prior()
    init = smplify.FitParams.init(model)
    fit = jax.jit(lambda o, i: smplify.fit(model, config, o, i, prior))
    t0 = time.perf_counter()
    _, result, losses = fit(obs, init)
    jax.block_until_ready(losses)
    wall = time.perf_counter() - t0
    return (
        {k: np.asarray(v) for k, v in result.items()},
        wall, t_build, height,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_iters", type=int, default=600)
    ap.add_argument("--update-notes", action="store_true")
    args = ap.parse_args()

    scan_verts, scan_faces = build_scan()
    print(f"scan: {scan_verts.shape[0]} verts, {scan_faces.shape[0]} faces",
          file=sys.stderr)

    res_sdf, wall_sdf, t_build, height = run(
        "sdf", scan_verts, scan_faces, args.num_iters)
    print(f"sdf fit: {wall_sdf:.1f}s (volume build {t_build:.2f}s)",
          file=sys.stderr)
    res_exact, wall_exact, _, _ = run(
        "exact", scan_verts, scan_faces, args.num_iters)
    print(f"exact fit: {wall_exact:.1f}s", file=sys.stderr)

    vs = res_sdf["vertices"] + res_sdf["displacement"]
    ve = res_exact["vertices"] + res_exact["displacement"]
    dv = np.linalg.norm(vs - ve, axis=-1)
    body_dv = np.linalg.norm(
        res_sdf["vertices"] - res_exact["vertices"], axis=-1)
    report = {
        "scan_faces": int(scan_faces.shape[0]),
        "num_iters": args.num_iters,
        "scan_height_world": height,
        "mean_vertex_dev_frac_height": float(dv.mean() / height),
        "max_vertex_dev_frac_height": float(dv.max() / height),
        "body_stage_mean_dev_frac_height": float(body_dv.mean() / height),
        "wall_sdf_s": round(wall_sdf, 1),
        "wall_exact_s": round(wall_exact, 1),
        "speedup": round(wall_exact / wall_sdf, 1),
        "volume_build_s": round(t_build, 2),
    }
    print(json.dumps(report, indent=2))

    if args.update_notes:
        path = os.path.join(os.path.dirname(__file__), "BENCH_NOTES.md")
        marker = "## SDF-vs-exact fit equivalence"
        lines = [
            marker, "",
            f"`bench_sdf_equivalence.py` ({report['scan_faces']}-face "
            f"synthetic scan, full SMPL+D fit, {args.num_iters}+"
            f"{args.num_iters} iters, one chip):",
            "",
            f"- final SMPL+D surface deviation sdf vs exact: "
            f"mean **{report['mean_vertex_dev_frac_height']*100:.3f}%** of "
            f"scan height (max "
            f"{report['max_vertex_dev_frac_height']*100:.3f}%)",
            f"- body stage only: mean "
            f"{report['body_stage_mean_dev_frac_height']*100:.3f}%",
            f"- wall: {report['wall_sdf_s']}s (sdf, incl. "
            f"{report['volume_build_s']}s volume build) vs "
            f"{report['wall_exact_s']}s (exact) -> "
            f"**{report['speedup']}x**",
            "",
        ]
        with open(path) as f:
            text = f.read()
        if marker in text:
            head, _, rest = text.partition(marker)
            rest = rest.split("\n## ", 1)
            tail = ("\n## " + rest[1]) if len(rest) > 1 else ""
            text = head + "\n".join(lines) + tail
        else:
            text = text.rstrip() + "\n\n" + "\n".join(lines)
        with open(path, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
