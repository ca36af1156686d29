"""Cross-engine parity: the JAX engine vs the torch reference re-enactment.

Proves the BASELINE.md north star ("<=1mm mean vertex deviation from
reference fits"): ``fitting/torch_reference.py`` re-enacts the reference
optimizer exactly (/root/reference/smplify/smplify.py:84-226) and must agree
with ``fitting/smplify.fit`` on identical inputs.

The fit-level comparison runs in float64 via a subprocess (jax_enable_x64
cannot be toggled inside the shared test process): in f64 the 600-step
descent is numerically locked between engines, isolating engine parity from
the problem's float32 trajectory chaos (see PARITY.md).
"""

import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_forward_matches_torch_reenactment():
    """Single forward pass: JAX model vs torch re-enactment, f32 bit-level."""
    import jax.numpy as jnp
    import torch

    from bodyfitting_tpu.fitting import torch_reference as tr
    from bodyfitting_tpu.models import body_model as bm

    model = bm.synthetic_model(
        "smplx", num_verts=512, seed=0, use_face_contour=True
    )
    md = tr.torch_model_from_jax(model)
    rng = np.random.default_rng(3)
    p = bm.BodyParams.zeros(model)
    p = dataclasses.replace(
        p,
        betas=jnp.asarray(rng.normal(scale=0.5, size=(10,)), jnp.float32),
        global_orient=jnp.asarray([0.3, -0.8, 0.2], jnp.float32),
        body_pose=jnp.asarray(
            rng.normal(scale=0.3, size=(63,)), jnp.float32),
        expression=jnp.asarray(
            rng.normal(scale=0.4, size=(10,)), jnp.float32),
        jaw_pose=jnp.asarray([0.1, 0.05, -0.02], jnp.float32),
        left_hand_pose=jnp.asarray(
            rng.normal(scale=0.5, size=(6,)), jnp.float32),
        right_hand_pose=jnp.asarray(
            rng.normal(scale=0.5, size=(6,)), jnp.float32),
    )
    out = bm.forward(model, p)
    pt = {
        f.name: torch.tensor(np.asarray(getattr(p, f.name)))
        for f in dataclasses.fields(p)
    }
    tv, tj, tp = tr.forward(md, pt)
    np.testing.assert_allclose(
        np.asarray(out.vertices), tv.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.joints), tj.numpy(), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out.full_pose), tp.numpy(), atol=1e-7)


def test_loss_matches_torch_reenactment():
    """One multiview-keypoint-loss evaluation agrees across engines."""
    import jax
    import jax.numpy as jnp
    import torch

    from bodyfitting_tpu.fitting import smplify, torch_reference as tr
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm

    sys.path.insert(0, REPO)
    from parity_fit import make_inputs

    model, w2cs, Ks, kps, cscale, _ = make_inputs(256, 3, seed=1)
    gmm = synthetic_gmm_prior()
    obs = smplify.Observations(
        w2cs=jnp.asarray(w2cs), Ks=jnp.asarray(Ks),
        keypoints=jnp.asarray(kps),
        view_mask=jnp.ones((w2cs.shape[0],)),
        constant_scale=jnp.asarray(cscale),
    )
    config = smplify.FitConfig(num_iters=1)
    params = smplify.FitParams.init(model)
    loss_jax, _ = jax.jit(
        lambda p: smplify.fit_loss(
            model, config, p, obs, jnp.zeros((), jnp.int32), gmm)
    )(params)

    md = tr.torch_model_from_jax(model)
    pt = {
        f.name: torch.zeros(np.asarray(getattr(params.body, f.name)).shape)
        for f in dataclasses.fields(params.body)
    }
    verts, joints, _ = tr.forward(md, pt)
    gmm_t = tuple(
        torch.tensor(np.asarray(g))
        for g in (gmm.means, gmm.precisions, gmm.log_nll_weights)
    )
    loss_t, _ = tr.multiview_keypoint_loss(
        [torch.tensor(w, dtype=torch.float32) for w in w2cs],
        [torch.tensor(k, dtype=torch.float32) for k in Ks],
        [torch.tensor(k, dtype=torch.float32) for k in kps],
        joints * cscale,
        pt["body_pose"], pt["betas"], gmm_t, use_hand_face=True,
    )
    assert abs(float(loss_jax) - float(loss_t)) / abs(float(loss_t)) < 1e-5


def test_nearest_oracle_pruned_bit_identical():
    """The AABB-pruned nearest query must return the SAME bits as the
    brute-force enumeration (same per-(query, face) arithmetic, pruning
    only removes provably-losing faces) — in f32 and f64, on queries far
    outside, near the surface, and exactly on vertices (tie cases)."""
    import torch

    from bodyfitting_tpu.fitting import torch_reference as tr

    for dtype, seed in ((torch.float32, 0), (torch.float64, 1)):
        g = torch.Generator().manual_seed(seed)
        verts = torch.randn(200, 3, generator=g, dtype=dtype)
        faces = torch.randint(0, 200, (400, 3), generator=g)
        near = verts[torch.randint(0, 200, (64,), generator=g)] \
            + 1e-3 * torch.randn(64, 3, generator=g, dtype=dtype)
        far = 5.0 * torch.randn(64, 3, generator=g, dtype=dtype)
        on_vert = verts[torch.randint(0, 200, (32,), generator=g)]
        points = torch.cat([near, far, on_vert])
        p_b, i_b = tr.nearest_points_on_mesh(
            points, verts, faces, prune=False)
        p_p, i_p = tr.nearest_points_on_mesh(
            points, verts, faces, prune=True)
        assert torch.equal(i_b, i_p), (i_b != i_p).nonzero()
        assert torch.equal(p_b, p_p)


@pytest.mark.slow
def test_fit_parity_f64_subprocess():
    """150-iteration f64 fit: both engines converge to the same vertices
    (<= 1e-2 mm, far inside the 1mm north star)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "parity_fit.py"), "--quick",
         "--dtype", "f64", "--num_verts", "512", "--n_views", "4",
         "--num_iters", "150", "--emit-report"],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["dtype"] == "f64"
    assert report["mean_vertex_dev_mm"] < 1e-2, report
    assert report["loss_rel_diff_max"] < 1e-5, report


@pytest.mark.slow
def test_fit_parity_mask_f64_subprocess():
    """Config-3 (silhouette) f64 parity: the staged mask loss — contour
    ICP + grid_sample stay-inside (/root/reference/smplify/loss.py:85-130)
    — keeps the engines' trajectories and converged vertices locked."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "parity_fit.py"), "--quick",
         "--config", "mask", "--dtype", "f64", "--num_iters", "150",
         "--emit-report"],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["config"] == "mask"
    # short-horizon trajectory lock (the full-length staged fit is
    # chaotic past the gate — see PARITY.md)
    assert report["mean_vertex_dev_mm"] < 1e-2, report
    assert report["loss_rel_diff_max"] < 1e-5, report
    # shared-state mask loss/grad at machine precision
    assert report["mask_step_loss_rel"] < 1e-10, report
    assert report["mask_step_grad_rel"] < 1e-10, report
    # geometric outcome equality
    assert abs(report["kp_rms_px_jax"] - report["kp_rms_px_torch"]) \
        < 0.05 * report["kp_rms_px_torch"] + 1e-3, report
    assert abs(report["contour_mean_px_jax"]
               - report["contour_mean_px_torch"]) \
        < 0.05 * report["contour_mean_px_torch"] + 1e-3, report


@pytest.mark.slow
def test_fit_parity_smpld_f64_subprocess():
    """Config-4 (SMPL+D) f64 parity: body stage with the exact point-cloud
    loss locks trajectory + vertices; the displacement stage agrees at the
    step level (shared-state loss/grad) and at the outcome level (both
    deformed surfaces land on the scan and on each other) — the stage-2
    *trajectory* is chaotic by the problem's nature, see PARITY.md."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "parity_fit.py"), "--quick",
         "--config", "smpld", "--dtype", "f64", "--num_iters", "90",
         "--emit-report"],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["config"] == "smpld"
    # body stage
    assert report["mean_vertex_dev_mm"] < 1e-2, report
    assert report["loss_rel_diff_max"] < 1e-5, report
    # displacement stage: step-level (machine precision at a shared state)
    assert report["disp_step_loss_rel"] < 1e-10, report
    assert report["disp_step_grad_max_abs"] < 1e-10, report
    # outcome-level at this deliberately short horizon: both engines'
    # deformed surfaces land on the scan with the same residual; the
    # chaotic per-vertex fields stay within a few mm point-to-surface
    rj, rt = report["scan_residual_jax_mm"], report["scan_residual_torch_mm"]
    assert abs(rj - rt) / max(rt, 1e-9) < 0.2, report
    assert report["cross_surface_dev_mm"] < 15.0, report
