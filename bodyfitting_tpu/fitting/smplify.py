"""The SMPLify optimizer as a jit-compiled ``lax.scan``.

Re-design of the reference engine (/root/reference/smplify/smplify.py:84-250):
the stateful 600-iteration Python loop over ``loss.backward(); opt.step()``
becomes a pure scan whose carry is ``(params, adam_state)``, so the entire
fit — SMPL forward, multi-view losses, Adam update — is one XLA program.
``vmap`` the fit over a frame axis and shard that axis over a device mesh
(:mod:`bodyfitting_tpu.parallel`) to fit whole sequences at once; each
frame's fit is independent, so scaling needs no collectives in the hot loop.

Reference behaviours preserved:
  * per-parameter-group Adam learning rates: 0.1 for global translation and
    scale, ``step_size`` (1e-2) for everything else (smplify.py:167-174);
  * ``jaw_pose`` is created but *omitted from the optimizer* — the jaw
    never moves even though face keypoints are in the loss (smplify.py:118,
    167-173).  Set ``optimize_jaw=True`` to fix that deliberately;
  * staging: mask and point-cloud losses switch on after
    ``num_iters // 3`` steps, each weighted 5x (smplify.py:197-210);
  * joint/vertex scaling ``(x + transl) * scale * constant_scale``
    (smplify.py:189-190) and the output dict schema (216-226).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from bodyfitting_tpu.losses.keypoints import multiview_keypoint_loss
from bodyfitting_tpu.losses.mesh import (
    compute_face_normals,
    compute_vertex_normals,
    normal_laplacian_smoothness,
    normal_loss,
    point_cloud_loss,
)
from bodyfitting_tpu.losses.silhouette import silhouette_loss
from bodyfitting_tpu.models import body_model as bm


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Static fitting configuration (hashable -> one compile per config)."""

    num_iters: int = 600
    step_size: float = 1e-2
    transl_lr: float = 0.1
    use_mask: bool = False
    use_mesh: bool = False
    displacement: bool = False
    optimize_jaw: bool = False
    # The reference never optimizes expressions either: it creates no
    # expression tensor and smplx's internal zero buffer is used
    # (smplify.py:117-128,167-173).  True = deliberate capability upgrade.
    optimize_expression: bool = False
    imsize: float = 512.0
    sigma: float = 100.0
    pose_prior_weight: float = 4.78
    angle_prior_weight: float = 15.2
    shape_prior_weight: float = 5.0
    mask_weight: float = 5.0
    pc_weight: float = 5.0
    disp_lr: float = 5e-2
    stage_gate_den: int = 3          # gate = num_iters // stage_gate_den
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # 'sdf' queries a precomputed distance volume per iteration (O(Q),
    # ~1000x cheaper; requires obs.scan_volume); 'exact' re-runs the
    # dense nearest-point sweep like the reference.
    mesh_loss_impl: str = "sdf"
    # rematerialize the body-model forward in the backward pass instead of
    # saving its [B,V,*] intermediates (HBM-bound, see BENCH_NOTES.md)
    remat_forward: bool = False
    # Keypoint-only fits never read full vertices inside the hot loop:
    # reduce the model to the ~250 vertex rows the joints touch and fold
    # J_regressor into the bases (models.body_model.reduce_for_joints),
    # making each iteration independent of V.  Exact for the loss; the
    # returned vertices still come from the full model.  Auto-disabled
    # when use_mask/use_mesh need full vertices per iteration.
    reduce_joints_only: bool = True
    # Accumulate the keypoint terms over blocks of this many views
    # (0 = all views at once).  Identical objective (re-associated sum);
    # caps the per-iteration [B, V, K, *] transient at long frame
    # batches — the direct fix for the 600-1200-frame scaling cliff
    # (BENCH_NOTES batch-scaling table).
    view_chunk: int = 0
    # Order of the every-4th mask vertices inside the merged reduction:
    # 'height' sorts them by template coordinate along the body's long
    # axis (or `mask_height_axis`), which makes the stay-inside kernel's
    # point tiles image-row-coherent under upright cameras so its
    # row-windowed sweep touches only each tile's actual row span
    # (ops.pallas_kernels.bilinear_cov_grads(row_window=...)).  The loss
    # terms are identical values summed in a different point order —
    # float reassociation only, same objective and gradients; parity
    # harnesses pin 'reference' (the reference's vertices[::4] order,
    # loss.py:94) to keep torch's exact summation order.
    mask_point_order: str = "height"
    # -1 = the template axis of maximum extent (body height for humans)
    mask_height_axis: int = -1
    # lax.scan unroll factor for the Adam loops.  Measured NO-WIN on the
    # latency-bound headline shape (BENCH_NOTES: 150fx48vx600, walls flat
    # at unroll 1/2/4/8) — the per-step latency is op scheduling inside
    # the step, not loop bookkeeping — and unroll>1 changes fusion and
    # therefore float rounding, which scatters the chaotic trajectories
    # (CLAUDE.md).  Keep 1 for reproducible fits; the knob stays for
    # experiments on other deployments.
    scan_unroll: int = 1


@dataclasses.dataclass(frozen=True)
class FitParams:
    """Everything the optimizer moves (reference smplify.py:103-174)."""

    body: bm.BodyParams
    global_transl: jax.Array      # [3]
    body_scale: jax.Array         # [1]

    @staticmethod
    def init(
        model: bm.BodyModel,
        init_betas: Optional[jax.Array] = None,
        init_global_orient: Optional[jax.Array] = None,
        init_body_pose: Optional[jax.Array] = None,
    ) -> "FitParams":
        body = bm.BodyParams.zeros(model)
        if init_betas is not None:
            body = dataclasses.replace(body, betas=init_betas)
        if init_global_orient is not None:
            body = dataclasses.replace(body, global_orient=init_global_orient)
        if init_body_pose is not None:
            body = dataclasses.replace(body, body_pose=init_body_pose)
        return FitParams(
            body=body,
            global_transl=jnp.zeros((3,)),
            body_scale=jnp.ones((1,)),
        )


jax.tree_util.register_dataclass(
    FitParams, data_fields=["body", "global_transl", "body_scale"],
    meta_fields=[],
)


@dataclasses.dataclass(frozen=True)
class Observations:
    """Per-frame observed data (a pytree; pad the view axis as needed)."""

    w2cs: jax.Array               # [Vw, 4, 4]
    Ks: jax.Array                 # [Vw, 3, 3]
    keypoints: jax.Array          # [Vw, K, 3] (u, v, conf), model order
    view_mask: jax.Array          # [Vw]
    constant_scale: jax.Array     # scalar (0.3 GeneBody / height/1.7 scans)
    # scalar count of views with images (the reference's len(use_frames),
    # the keypoint-loss denominator); None -> padded view count
    num_views_used: Optional[jax.Array] = None
    # silhouette fitting (config.use_mask)
    masks: Optional[jax.Array] = None          # [Vm, H, W]
    mask_w2cs: Optional[jax.Array] = None      # [Vm, 4, 4]
    mask_Ks: Optional[jax.Array] = None        # [Vm, 3, 3]
    contours: Optional[jax.Array] = None       # [Vm, P, 2]
    contour_valid: Optional[jax.Array] = None  # [Vm, P]
    # content-cropped masks for the stay-inside term (exact-value
    # fast path, losses.silhouette.compute_mask_crops); when present the
    # loss samples the crops and `masks` may be None
    mask_crops: Optional[jax.Array] = None         # [Vm, Hc, Wc]
    mask_crop_origins: Optional[jax.Array] = None  # [Vm, 2] (x0, y0)
    mask_view_valid: Optional[jax.Array] = None    # [Vm]
    # scan fitting (config.use_mesh)
    scan_verts: Optional[jax.Array] = None     # [Vs, 3]
    scan_faces: Optional[jax.Array] = None     # [Fs, 3] int32
    scan_height: Optional[jax.Array] = None    # scalar
    scan_volume: Optional[object] = None       # ops.sdf.DistanceVolume


jax.tree_util.register_dataclass(
    Observations,
    data_fields=[
        "w2cs", "Ks", "keypoints", "view_mask", "constant_scale",
        "num_views_used", "masks",
        "mask_w2cs", "mask_Ks", "contours", "contour_valid",
        "mask_crops", "mask_crop_origins", "mask_view_valid",
        "scan_verts", "scan_faces", "scan_height", "scan_volume",
    ],
    meta_fields=[],
)


def _body_pose69(model: bm.BodyModel, body_pose: jax.Array) -> jax.Array:
    """SMPL-X's 63-dim body pose zero-padded to the prior's 69 dims
    (reference loss.py:207)."""
    if body_pose.shape[-1] == 69:
        return body_pose
    pad = jnp.zeros(body_pose.shape[:-1] + (69 - body_pose.shape[-1],),
                    body_pose.dtype)
    return jnp.concatenate([body_pose, pad], axis=-1)


def _make_optimizer(config: FitConfig, params: FitParams):
    """Adam with the reference's per-group learning rates.

    transl & scale use ``transl_lr``; jaw (and optionally nothing else) is
    frozen, matching the reference's omission of jaw_pose from opt_params.
    """
    def lr_tree(p: FitParams) -> FitParams:
        body_lrs = {
            f.name: jnp.full_like(getattr(p.body, f.name), config.step_size)
            for f in dataclasses.fields(p.body)
        }
        if not config.optimize_jaw:
            body_lrs["jaw_pose"] = jnp.zeros_like(p.body.jaw_pose)
        if not config.optimize_expression:
            body_lrs["expression"] = jnp.zeros_like(p.body.expression)
        return FitParams(
            body=bm.BodyParams(**body_lrs),
            global_transl=jnp.full_like(p.global_transl, config.transl_lr),
            body_scale=jnp.full_like(p.body_scale, config.transl_lr),
        )

    lrs = lr_tree(params)
    adam = optax.scale_by_adam(b1=config.adam_b1, b2=config.adam_b2)

    def update_fn(updates, state, params=None):
        updates, state = adam.update(updates, state, params)
        updates = jax.tree.map(lambda u, lr: -lr * u, updates, lrs)
        return updates, state

    return optax.GradientTransformation(adam.init, update_fn)


def fit_loss(
    model: bm.BodyModel,
    config: FitConfig,
    params: FitParams,
    obs: Observations,
    step: jax.Array,
    pose_prior_fn,
    joints_model: Optional[bm.BodyModel] = None,
    mask_vertex_rows: Optional[jax.Array] = None,
):
    """Total staged loss at a given iteration (one frame).

    ``joints_model`` (optional, a :func:`bm.reduce_for_joints` of
    ``model``) serves the keypoint term; the full-vertex forward then runs
    only inside the gated mask/mesh branch, so the first
    ``num_iters // stage_gate_den`` iterations of mask/mesh fits are
    vertex-free too.

    ``mask_vertex_rows`` (optional, from :func:`bm.reduce_for_rows`)
    marks ``model`` as a merged reduction that already carries the
    every-4th vertex rows the silhouette term reads: the mask loss then
    consumes ``out.vertices[mask_vertex_rows]`` from the SAME forward as
    the keypoint term (stride 1) instead of a second full-V forward —
    one short LBS chain per step (see :func:`loss_models`).
    """
    jm = joints_model if joints_model is not None else model

    def fwd_of(m):
        f = lambda p: bm.forward(m, p)  # noqa: E731
        return jax.checkpoint(f) if config.remat_forward else f

    out = fwd_of(jm)(params.body)
    scale = params.body_scale * obs.constant_scale
    model_joints = (out.joints + params.global_transl) * scale

    use_hand_face = model.model_type == "smplx"
    pose69 = _body_pose69(model, params.body.body_pose)

    total, terms = multiview_keypoint_loss(
        obs.w2cs, obs.Ks, obs.keypoints, obs.view_mask, model_joints,
        pose69, params.body.betas, pose_prior_fn,
        imsize=config.imsize, sigma=config.sigma,
        pose_prior_weight=config.pose_prior_weight,
        angle_prior_weight=config.angle_prior_weight,
        shape_prior_weight=config.shape_prior_weight,
        use_hand_face=use_hand_face,
        num_views_used=obs.num_views_used,
        view_chunk=config.view_chunk,
    )

    gate = config.num_iters // config.stage_gate_den
    late = step > gate

    if config.use_mask or config.use_mesh:
        mask_stride = 4                     # reference loss.py:94 [::4]
        if mask_vertex_rows is not None:
            # merged reduction (mask-only): the one forward above already
            # computed the strided rows the silhouette reads
            mask_stride = 1

            def get_vertices():
                return (
                    out.vertices[mask_vertex_rows] + params.global_transl
                ) * scale
        elif joints_model is None:
            # same forward serves both terms (single-model callers)
            body_vertices = (out.vertices + params.global_transl) * scale
            get_vertices = lambda: body_vertices  # noqa: E731
        else:
            def get_vertices():
                full = fwd_of(model)(params.body)
                return (full.vertices + params.global_transl) * scale

        use_sdf = (
            config.mesh_loss_impl == "sdf" and obs.scan_volume is not None
        )

        def late_terms(_):
            verts = get_vertices()
            mask_l = jnp.zeros(())
            pc_l = jnp.zeros(())
            if config.use_mask:
                mask_l = silhouette_loss(
                    obs.contours, obs.contour_valid, obs.masks,
                    obs.mask_w2cs, obs.mask_Ks, verts,
                    imsize=config.imsize, vertex_stride=mask_stride,
                    mask_crops=obs.mask_crops,
                    mask_crop_origins=obs.mask_crop_origins,
                    mask_view_valid=obs.mask_view_valid,
                    full_hw=(int(config.imsize), int(config.imsize)),
                )
            if config.use_mesh:
                if use_sdf:
                    from bodyfitting_tpu.ops.sdf import point_cloud_loss_sdf

                    pc = point_cloud_loss_sdf(verts, obs.scan_volume)
                else:
                    pc = point_cloud_loss(
                        verts, obs.scan_verts, obs.scan_faces
                    )
                # reference: / scan_height * imsize (smplify.py:206)
                pc_l = pc / obs.scan_height * config.imsize
            return mask_l, pc_l

        mask_l, pc_l = jax.lax.cond(
            late, late_terms,
            lambda _: (jnp.zeros(()), jnp.zeros(())), None,
        )
        if config.use_mask:
            total = total + config.mask_weight * mask_l
            terms["mask_loss"] = mask_l
        if config.use_mesh:
            total = total + config.pc_weight * pc_l
            terms["pc_loss"] = pc_l

    return total, terms


def loss_models(model: bm.BodyModel, config: FitConfig):
    """The ``(loss_model, joints_model, mask_rows)`` triple every fit loop
    must use so trajectories agree across entry points (fit /
    fit_resumable / sequence fits).  With ``reduce_joints_only``:

    * keypoint-only fits run on the joints-reduced model;
    * mask-only fits (GeneBody's production ``--use_mask``) run on ONE
      reduced model that also keeps the every-4th vertex rows the
      silhouette loss reads (``reduce_for_rows``) — ``mask_rows`` indexes
      them — so each step has a single short LBS chain instead of a
      joints-reduced forward plus a full-V forward in the gated branch;
    * mesh fits keep the full model for vertices (the point-cloud term
      reads all of them) with the joints-reduced model for keypoints.
    """
    loss_model = model
    joints_model = None
    mask_rows = None
    if config.reduce_joints_only:
        try:
            # Static host-side reduction; requires concrete model arrays
            # (the normal case: the model is closed over, not a jit arg).
            if config.use_mask and not config.use_mesh:
                import numpy as np

                ids = np.arange(0, model.num_verts, 4)
                if config.mask_point_order == "height":
                    vt = np.asarray(model.v_template)[ids]
                    ax = config.mask_height_axis
                    if ax < 0:
                        ax = int(np.argmax(vt.max(0) - vt.min(0)))
                    ids = ids[np.argsort(vt[:, ax], kind="stable")]
                loss_model, mask_rows = bm.reduce_for_rows(model, ids)
            elif config.use_mesh:
                joints_model = bm.reduce_for_joints(model)
            else:
                loss_model = bm.reduce_for_joints(model)
        except jax.errors.TracerArrayConversionError:
            # f32 trajectories are chaotic (CLAUDE.md), so silently
            # forking reduced/unreduced per call style would be invisible
            # yet change converged fits — make the fork loud.
            import warnings

            warnings.warn(
                "reduce_joints_only requested but the BodyModel is a jit "
                "tracer (model passed as a jit argument?); falling back "
                "to the unreduced forward — this follows a different "
                "float32 optimization trajectory than closed-over-model "
                "entry points. Close over a concrete model or set "
                "FitConfig(reduce_joints_only=False) to silence.",
                stacklevel=3,
            )
    return loss_model, joints_model, mask_rows


def fit(
    model: bm.BodyModel,
    config: FitConfig,
    obs: Observations,
    init: FitParams,
    pose_prior_fn,
):
    """Run the staged SMPLify optimization for one frame.

    Returns ``(final FitParams, result dict, loss trace)`` where the result
    dict matches the reference's output schema (smplify.py:216-226).
    Jit-compile with ``model``/``config`` static; ``vmap`` over frames by
    batching ``obs`` and ``init``.

    Small deliberate fix vs the reference: its returned vertices/joints
    come from the forward pass *before* the last Adam step while the
    returned parameters are *post*-step (smplify.py:177-226), so they are
    one step inconsistent.  Here both come from the final parameters.
    """
    tx = _make_optimizer(config, init)
    opt_state = tx.init(init)
    step_fn = make_step_fn(model, config, obs, pose_prior_fn, tx)

    (params, _), losses = jax.lax.scan(
        step_fn, (init, opt_state), jnp.arange(config.num_iters),
        unroll=config.scan_unroll,
    )

    result = fit_result(model, params, obs)

    if config.displacement and config.use_mesh:
        disp, disp_losses = fit_displacement(
            model, config, obs, jax.lax.stop_gradient(result["vertices"])
        )
        result["displacement"] = disp
        losses = jnp.concatenate([losses, disp_losses])

    return params, result, losses


def make_step_fn(model, config, obs, pose_prior_fn, tx):
    """One Adam step as a ``lax.scan`` body, shared by every entry point
    (:func:`fit`, ``checkpointing.fit_resumable``) so chunked/resumed runs
    follow the exact same float32 trajectory (CLAUDE.md: trajectories are
    chaotic — any drift between step implementations changes fits)."""
    loss_model, joints_model, mask_rows = loss_models(model, config)

    def step_fn(carry, step):
        params, opt_state = carry
        (loss, terms), grads = jax.value_and_grad(
            lambda p: fit_loss(
                loss_model, config, p, obs, step, pose_prior_fn,
                joints_model=joints_model, mask_vertex_rows=mask_rows,
            ),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    return step_fn


def fit_result(model, params: FitParams, obs: Observations) -> dict:
    """The reference's output dict (smplify.py:216-226) from final params."""
    out = bm.forward(model, params.body)
    scale = params.body_scale * obs.constant_scale
    return {
        "vertices": (out.vertices + params.global_transl) * scale,
        "joints": (out.joints + params.global_transl) * scale,
        "pose": params.body.body_pose,
        "betas": params.body.betas,
        "global_orient": params.body.global_orient,
        "global_transl": params.global_transl * params.body_scale,
        "scale": params.body_scale,
        "full_pose": out.full_pose,
    }


def fit_displacement(
    model: bm.BodyModel,
    config: FitConfig,
    obs: Observations,
    body_vertices: jax.Array,
):
    """Stage 2: per-vertex displacement (SMPL+D) fit to the scan
    (reference smplify.py:228-247): ICP + normal + Laplacian losses."""
    disp_loss, tx, disp0 = displacement_problem(
        model, config, obs, body_vertices
    )
    opt_state = tx.init(disp0)

    def step_fn(carry, _):
        disp, opt_state = carry
        loss, grads = jax.value_and_grad(disp_loss)(disp)
        updates, opt_state = tx.update(grads, opt_state, disp)
        disp = optax.apply_updates(disp, updates)
        return (disp, opt_state), loss

    (disp, _), losses = jax.lax.scan(
        step_fn, (disp0, opt_state), None, length=config.num_iters,
        unroll=config.scan_unroll,
    )
    return disp, losses


def displacement_problem(
    model: bm.BodyModel,
    config: FitConfig,
    obs: Observations,
    body_vertices: jax.Array,
):
    """The displacement stage as ``(loss_fn, optimizer, init)`` so every
    entry point (the in-scan :func:`fit_displacement` and chunked
    external loops like bench_sdf_equivalence) optimizes the SAME
    objective with the same Adam hyperparameters."""
    faces = model.faces
    scan_face_normals = compute_face_normals(obs.scan_verts, obs.scan_faces)
    use_sdf = (
        config.mesh_loss_impl == "sdf" and obs.scan_volume is not None
    )

    def disp_loss(disp):
        deformed = body_vertices + disp
        deformed_norms = compute_vertex_normals(deformed, faces)
        if use_sdf:
            from bodyfitting_tpu.ops.sdf import (
                normal_loss_sdf,
                point_cloud_loss_sdf,
            )

            icp = point_cloud_loss_sdf(deformed, obs.scan_volume)
            nl = normal_loss_sdf(
                deformed, deformed_norms, obs.scan_volume,
                scan_face_normals,
            )
        else:
            from bodyfitting_tpu.losses.mesh import nearest_points

            # one O(V*F) sweep shared by both terms (they were each
            # running the identical blocked brute-force query)
            near = nearest_points(
                deformed.reshape(-1, 3), obs.scan_verts, obs.scan_faces
            )
            icp = point_cloud_loss(
                deformed, obs.scan_verts, obs.scan_faces, nearest=near
            )
            nl = normal_loss(
                deformed, deformed_norms, obs.scan_verts, obs.scan_faces,
                scan_face_normals, nearest=near,
            )
        sm = normal_laplacian_smoothness(deformed_norms, faces)
        return icp + (nl + sm) * obs.constant_scale * 0.1

    tx = optax.adam(
        config.disp_lr, b1=config.adam_b1, b2=config.adam_b2
    )
    disp0 = jnp.zeros_like(body_vertices)
    return disp_loss, tx, disp0
