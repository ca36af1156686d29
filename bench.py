"""Benchmark: the north-star GeneBody workload on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.md north star): a **150-frame, 48-view** GeneBody
sequence fitted to SMPL-X at real asset size (10475 verts, 55 joints,
hands+face+contour keypoints), 600 Adam iterations per frame, keypoint +
GMM/angle/shape priors — the reference's default configuration
(/root/reference/apps/genebody_fitting.py:91 48 cameras,
:42 use_mask default False, smplify/smplify.py:44 600 iters).  All 150
frames are fitted concurrently (vmap over the frame axis) on one chip.

The baseline column is a torch-CPU re-enactment of the reference's
structure on the *same 48-view workload*: batch 1, per-view Python loop in
the loss (smplify/loss.py:156), full LBS forward + backward + Adam per
iteration.  The reference publishes no numbers (BASELINE.md), so this
measured re-enactment is the baseline.  The north-star bar is >=50x.
"""

import json
import os
import sys
import time

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_BATCH", "150"))
N_VIEWS = int(os.environ.get("BENCH_VIEWS", "48"))
NUM_ITERS = int(os.environ.get("BENCH_ITERS", "600"))


def bench_jax(batch_frames: int, n_views: int, iters: int):
    import jax
    import jax.numpy as jnp

    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model = bm.synthetic_model("smplx", num_verts=10475, seed=0)
    prior = synthetic_gmm_prior()
    config = smplify.FitConfig(num_iters=iters, imsize=512.0)

    rng = np.random.default_rng(0)
    K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    obs = smplify.Observations(
        w2cs=jnp.broadcast_to(w2c, (batch_frames, n_views, 4, 4)),
        Ks=jnp.broadcast_to(K, (batch_frames, n_views, 3, 3)),
        keypoints=jnp.asarray(
            rng.uniform(100, 400, size=(batch_frames, n_views, 135, 3)),
            jnp.float32,
        ),
        view_mask=jnp.ones((batch_frames, n_views)),
        constant_scale=jnp.full((batch_frames,), 0.3),
    )
    init = smplify.FitParams.init(model)
    inits = jax.tree.map(
        lambda x: jnp.stack([x] * batch_frames), init
    )

    fit = jax.jit(
        jax.vmap(lambda o, i: smplify.fit(model, config, o, i, prior))
    )
    # warmup/compile
    t0 = time.perf_counter()
    _, _, losses = fit(obs, inits)
    losses.block_until_ready()
    compile_and_first = time.perf_counter() - t0
    print(f"compile+first run: {compile_and_first:.1f}s", file=sys.stderr)

    runs = 3
    t0 = time.perf_counter()
    import dataclasses
    for r in range(runs):
        # distinct inputs each run: identical launches can be cached
        obs_r = dataclasses.replace(
            obs, keypoints=obs.keypoints + np.float32(r)
        )
        _, _, losses = fit(obs_r, inits)
        losses.block_until_ready()
    dt = (time.perf_counter() - t0) / runs
    sequence_fits_per_sec = 1.0 / dt
    frame_fits_per_sec = batch_frames / dt
    print(
        f"jax: {iters}-iter fit x {batch_frames} frames x {n_views} views "
        f"in {dt:.3f}s -> {frame_fits_per_sec:.1f} frame fits/s/chip "
        f"({batch_frames}-frame sequence in {dt:.2f}s)",
        file=sys.stderr,
    )
    return frame_fits_per_sec, dt


def bench_torch_baseline(n_views: int, iters: int = 6):
    """Reference-style torch loop on the same 48-view workload: batch 1,
    per-view Python loss loop, full-V LBS fwd+bwd per iteration."""
    import torch

    torch.manual_seed(0)
    V, J, S = 10475, 55, 10
    v_template = torch.randn(V, 3) * 0.3
    shapedirs = torch.randn(S, V * 3) * 0.01
    posedirs = torch.randn((J - 1) * 9, V * 3) * 0.001
    J_reg = torch.rand(J, V) ** 8
    J_reg = J_reg / J_reg.sum(1, keepdim=True)
    W = torch.softmax(torch.randn(V, J) * 2, dim=1)
    parents = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
               16, 17, 18, 19] + [15, 15, 15] + \
        [20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38] + \
        [21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53]

    means = torch.randn(8, 69) * 0.3
    precs = torch.stack([torch.eye(69) for _ in range(8)])
    logw = torch.zeros(8)

    def rodrigues(aa):
        angle = aa.norm(dim=-1, keepdim=True).clamp_min(1e-8)
        axis = aa / angle
        half = angle * 0.5
        q = torch.cat([half.cos(), half.sin() * axis], dim=-1)
        w, x, y, z = q.unbind(-1)
        return torch.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ], dim=-1).reshape(aa.shape[:-1] + (3, 3))

    pose = torch.zeros(J * 3, requires_grad=True)
    betas = torch.zeros(S, requires_grad=True)
    transl = torch.zeros(3, requires_grad=True)
    opt = torch.optim.Adam(
        [{"params": [transl], "lr": 0.1}, {"params": [pose, betas]}],
        lr=1e-2,
    )

    Ks = [torch.tensor([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
          for _ in range(n_views)]
    w2cs = [torch.eye(4) for _ in range(n_views)]
    for w2c in w2cs:
        w2c[2, 3] = 3.0
    kps = [torch.rand(135, 3) * 400 for _ in range(n_views)]

    def forward():
        v_shaped = v_template + (betas @ shapedirs).reshape(V, 3)
        joints_rest = J_reg @ v_shaped
        R = rodrigues(pose.reshape(J, 3))
        pf = (R[1:] - torch.eye(3)).reshape(-1)
        v_posed = v_shaped + (pf @ posedirs).reshape(V, 3)
        G = [None] * J
        for j in range(J):
            T = torch.eye(4)
            T = T.clone()
            T[:3, :3] = R[j]
            if parents[j] == -1:
                T[:3, 3] = joints_rest[j]
                G[j] = T
            else:
                T[:3, 3] = joints_rest[j] - joints_rest[parents[j]]
                G[j] = G[parents[j]] @ T
        A = torch.stack([
            torch.cat([
                g[:3, :3],
                (g[:3, 3] - g[:3, :3] @ joints_rest[j])[:, None]
            ], dim=1)
            for j, g in enumerate(G)
        ])
        T = torch.einsum("vj,jpq->vpq", W, A.reshape(J, 12).reshape(J, 3, 4))
        verts = torch.einsum("vpq,vq->vp", T[:, :, :3], v_posed) + T[:, :, 3]
        joints = torch.stack([g[:3, 3] for g in G])
        return verts, joints

    def loss_fn():
        verts, joints = forward()
        joints135 = verts[:135] + transl    # stand-in joint head, same cost
        total = 0.0
        for i in range(n_views):            # the reference's per-view loop
            R, t = w2cs[i][:3, :3], w2cs[i][:3, 3]
            cam = joints135 @ R.T + t
            proj = cam @ Ks[i].T
            uv = proj[:, :2] / proj[:, 2:3]
            d = (kps[i][:, :2] - uv) / 0.5
            g = (100.0 ** 2 * d * d) / (100.0 ** 2 + d * d)
            total = total + (kps[i][:, 2] ** 2 * g.sum(-1)).sum()
        diff = pose[3:72][None] - means
        quad = 0.5 * torch.einsum(
            "kj,kij,ki->k", diff, precs, diff
        ) - logw
        total = total + (4.78 ** 2) * quad.min()
        total = total + (5.0 ** 2) * (betas ** 2).sum()
        return total

    # warmup
    loss = loss_fn()
    loss.backward()
    opt.step()

    t0 = time.perf_counter()
    for _ in range(iters):
        opt.zero_grad()
        loss = loss_fn()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    rate = iters / dt
    print(
        f"torch baseline ({n_views} views): {rate:.2f} it/s/frame (batch 1) "
        f"-> {rate/600:.5f} full-600-iter frame fits/s",
        file=sys.stderr,
    )
    return rate


def main():
    from bodyfitting_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    baseline_iters = bench_torch_baseline(N_VIEWS)       # it/s, batch 1
    value, seq_wall = bench_jax(N_FRAMES, N_VIEWS, NUM_ITERS)
    baseline = baseline_iters / NUM_ITERS                # frame fits/s
    print(json.dumps({
        "metric": "genebody_150x48_smplx_600iter_frame_fits_per_sec_per_chip",
        "value": round(value, 3),
        "unit": (
            f"frame fits/s/chip ({N_FRAMES} frames x {N_VIEWS} views, "
            f"{NUM_ITERS} iters, sequence wall {seq_wall:.2f}s)"
        ),
        "vs_baseline": round(value / baseline, 1),
    }))


if __name__ == "__main__":
    main()
