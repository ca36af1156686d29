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
    import dataclasses

    from bench_common import timed_launches

    def run(off):
        obs_r = dataclasses.replace(obs, keypoints=obs.keypoints + off)
        _, _, losses = fit(obs_r, inits)
        float(losses.sum())

    # tunnel-safe protocol (salted fresh inputs per launch, host fetch,
    # median) lives in bench_common.timed_launches
    res = timed_launches(run, warmups=1, runs=5)
    print(f"compile+first run: {res.first:.1f}s", file=sys.stderr)
    dt = res.median
    print("run walls: " + ", ".join(f"{w:.3f}s" for w in res.walls),
          file=sys.stderr)
    frame_fits_per_sec = batch_frames / dt
    print(
        f"jax: {iters}-iter fit x {batch_frames} frames x {n_views} views "
        f"in {dt:.3f}s -> {frame_fits_per_sec:.1f} frame fits/s/chip "
        f"({batch_frames}-frame sequence in {dt:.2f}s)",
        file=sys.stderr,
    )
    return frame_fits_per_sec, dt


def bench_torch_baseline(n_views: int, iters: int = 30):
    """Reference-style torch loop on the same 48-view workload: batch 1,
    per-view Python loss loop, full-V LBS fwd+bwd per iteration.

    30 timed iterations (~2-3s wall at the measured 11-16 it/s) so the
    headline ratio rests on a real sample rather than a 6-iteration
    extrapolation (VERDICT r3 item 10).

    Uses the SAME torch re-enactment the parity harness validates
    (fitting/torch_reference.py, bit-level forward agreement with the JAX
    model), on the SAME synthetic SMPL-X model as the JAX benchmark — the
    baseline column and the accuracy proof rest on one implementation.
    """
    import time as _time

    from bodyfitting_tpu.fitting import torch_reference as tr
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm

    model = bm.synthetic_model("smplx", num_verts=10475, seed=0)
    md = tr.torch_model_from_jax(model)
    gmm = synthetic_gmm_prior()
    gmm_arrays = (
        np.asarray(gmm.means), np.asarray(gmm.precisions),
        np.asarray(gmm.log_nll_weights),
    )
    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]], np.float32)
    w2cs = np.broadcast_to(np.eye(4, dtype=np.float32), (n_views, 4, 4)).copy()
    w2cs[:, 2, 3] = 3.0
    Ks = np.broadcast_to(K, (n_views, 3, 3)).copy()
    kps = rng.uniform(100, 400, size=(n_views, 135, 3)).astype(np.float32)

    # Host-load guard (VERDICT r4 item 7): this is a 1-CPU host, so any
    # concurrent process inflates the torch wall (the measured baseline
    # swung 7-16 it/s across rounds on load alone).  Wait for the 1-min
    # load average to drop before sampling; warn if it never does.
    for _ in range(10):
        load = os.getloadavg()[0]
        if load < 1.5:
            break
        print(f"host load {load:.2f} — waiting 30s before baseline "
              "sampling (1-CPU host; see CLAUDE.md)", file=sys.stderr)
        _time.sleep(30)
    else:
        print(f"WARNING: host load still {os.getloadavg()[0]:.2f}; "
              "baseline may be inflated", file=sys.stderr)

    # warmup (BLAS init etc.)
    tr.smplify_fit(md, w2cs, Ks, kps, gmm_arrays, num_iters=1)
    # >= 3 samples; contention noise is ONE-SIDED (load only ever slows
    # torch down), so the FASTEST sample is the best estimate of the
    # uncontended reference loop — and the most conservative choice for
    # the ratio (a faster baseline lowers vs_baseline).
    rates = []
    for _ in range(3):
        t0 = _time.perf_counter()
        tr.smplify_fit(md, w2cs, Ks, kps, gmm_arrays, num_iters=iters)
        rates.append(iters / (_time.perf_counter() - t0))
    rate = max(rates)
    spread = (max(rates) - min(rates)) / max(rates)
    print(
        f"torch baseline ({n_views} views): best {rate:.2f} it/s/frame "
        f"of samples [" + ", ".join(f"{r:.2f}" for r in rates) + "] "
        f"(spread {spread*100:.0f}%; batch 1) "
        f"-> {rate/600:.5f} full-600-iter frame fits/s",
        file=sys.stderr,
    )
    if spread > 0.3:
        print("WARNING: baseline samples spread >30% — host contention; "
              "the best sample is used but re-run on an idle host",
              file=sys.stderr)
    return rate


def wait_for_healthy_device(max_wait_s: float = 900.0) -> None:
    """Gate on a responsive TPU before the long timed runs.

    The TPU tunnel can wedge for minutes at a time (every device op blocks;
    see CLAUDE.md).  Probe with a tiny matmul in a subprocess under a
    timeout, retrying until the device answers promptly, so a transient
    wedge delays the benchmark instead of poisoning it.  On a healthy CPU
    fallback this passes instantly and costs nothing.
    """
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp; "
        "x = jnp.ones((256, 256)); (x @ x).block_until_ready(); "
        "print('ok')"
    )
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=120, cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if r.returncode == 0 and b"ok" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print(
                f"WARNING: device probe still failing after {max_wait_s:.0f}s"
                " — benchmarking anyway", file=sys.stderr,
            )
            return
        print(
            f"device probe attempt {attempt} unresponsive; waiting 60s "
            "(tunnel wedge?)", file=sys.stderr,
        )
        time.sleep(60)


def main():
    from bodyfitting_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    wait_for_healthy_device()
    baseline_iters = bench_torch_baseline(N_VIEWS)       # it/s, batch 1
    value, seq_wall = bench_jax(N_FRAMES, N_VIEWS, NUM_ITERS)
    baseline = baseline_iters / NUM_ITERS                # frame fits/s
    print(json.dumps({
        "metric": (
            f"genebody_{N_FRAMES}x{N_VIEWS}_smplx_{NUM_ITERS}iter_"
            "frame_fits_per_sec_per_chip"
        ),
        "value": round(value, 3),
        "unit": (
            f"frame fits/s/chip ({N_FRAMES} frames x {N_VIEWS} views, "
            f"{NUM_ITERS} iters, sequence wall {seq_wall:.2f}s)"
        ),
        # 2 significant figures: the live torch baseline swings
        # 0.018-0.0225 fits/s run-to-run on this 1-CPU host (BENCH_NOTES),
        # so more precision in the ratio would be noise dressed as signal;
        # the absolute wall above is the headline number.
        "vs_baseline": float(f"{value / baseline:.2g}"),
    }))


if __name__ == "__main__":
    main()
