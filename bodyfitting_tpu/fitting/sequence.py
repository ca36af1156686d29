"""Sequence-level fitting with temporal coupling.

The reference fits every frame independently in a serial loop
(apps/genebody_fitting.py:183-192), which can produce jittery sequences.
Because this framework fits a whole batch of frames in one program, a
temporal prior is just more terms on the stacked parameters: squared
velocities of body pose, global orientation, translation and (optionally)
acceleration, added to the sum of per-frame losses and optimized jointly.

This is a capability the serial reference cannot express; with the frame
axis sharded over a device mesh the temporal differences become
neighbour-exchange collectives that XLA inserts automatically.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.models import body_model as bm


@dataclasses.dataclass(frozen=True)
class TemporalConfig:
    pose_velocity_weight: float = 100.0
    orient_velocity_weight: float = 100.0
    transl_velocity_weight: float = 1000.0
    betas_consistency_weight: float = 100.0   # shape is one body: tie frames
    acceleration_weight: float = 0.0


def temporal_loss(
    params: smplify.FitParams, tcfg: TemporalConfig,
    frame_valid=None,
) -> jax.Array:
    """Smoothness terms over the leading frame axis of batched params.

    ``frame_valid`` (``[F]`` of 0/1, default all-valid) excludes padding
    frames: velocity/acceleration pairs touching a padded frame carry
    zero weight and the betas-consistency mean runs over valid frames
    only, so padding a batch (e.g. to a device-mesh multiple) leaves the
    real frames' objective bit-identical to the unpadded fit.
    """
    F = params.global_transl.shape[0]
    if frame_valid is None:
        frame_valid = jnp.ones((F,), params.global_transl.dtype)
    v_pair = frame_valid[1:] * frame_valid[:-1]
    v_tri = (
        frame_valid[2:] * frame_valid[1:-1] * frame_valid[:-2]
        if F > 2 else None
    )

    def vel(x):
        d2 = jnp.sum((x[1:] - x[:-1]) ** 2, axis=tuple(range(1, x.ndim)))
        return jnp.sum(d2 * v_pair)

    def acc(x):
        if v_tri is None:
            return jnp.zeros(())
        d2 = jnp.sum(
            (x[2:] - 2 * x[1:-1] + x[:-2]) ** 2,
            axis=tuple(range(1, x.ndim)),
        )
        return jnp.sum(d2 * v_tri)

    total = tcfg.pose_velocity_weight * vel(params.body.body_pose)
    total += tcfg.orient_velocity_weight * vel(params.body.global_orient)
    total += tcfg.transl_velocity_weight * vel(params.global_transl)
    # shape should be constant across a subject's sequence
    n_valid = jnp.maximum(jnp.sum(frame_valid), 1.0)
    mean_betas = (
        jnp.sum(params.body.betas * frame_valid[:, None], axis=0,
                keepdims=True) / n_valid
    )
    total += tcfg.betas_consistency_weight * jnp.sum(
        (params.body.betas - mean_betas) ** 2 * frame_valid[:, None]
    )
    if tcfg.acceleration_weight:
        total += tcfg.acceleration_weight * (
            acc(params.body.body_pose) + acc(params.global_transl)
        )
    return total


def fit_sequence(
    model: bm.BodyModel,
    config: smplify.FitConfig,
    obs_batched: smplify.Observations,
    init_batched: smplify.FitParams,
    pose_prior_fn,
    tcfg: TemporalConfig = TemporalConfig(),
    frame_valid=None,
):
    """Jointly fit a sequence of frames with temporal smoothing.

    ``obs_batched`` / ``init_batched`` carry a leading frame axis.  Returns
    ``(params, result dict (batched), losses [num_iters])`` — like
    :func:`smplify.fit` but one optimization over all frames at once.
    ``frame_valid`` (``[F]`` 0/1) marks padding frames whose data and
    temporal terms are excluded from the objective (see
    :func:`temporal_loss`).
    """
    tx = smplify._make_optimizer(config, init_batched)
    opt_state = tx.init(init_batched)

    # same model reduction as smplify.fit so per-frame trajectories agree
    loss_model, joints_model, mask_rows = smplify.loss_models(model, config)

    per_frame_loss = jax.vmap(
        lambda p, o, step: smplify.fit_loss(
            loss_model, config, p, o, step, pose_prior_fn,
            joints_model=joints_model, mask_vertex_rows=mask_rows,
        )[0],
        in_axes=(0, 0, None),
    )

    def total_loss(params, step):
        frame_losses = per_frame_loss(params, obs_batched, step)
        if frame_valid is not None:
            frame_losses = frame_losses * frame_valid
        return jnp.sum(frame_losses) + temporal_loss(
            params, tcfg, frame_valid
        )

    def step_fn(carry, step):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(total_loss)(params, step)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step_fn, (init_batched, opt_state), jnp.arange(config.num_iters),
        unroll=config.scan_unroll,
    )

    out = jax.vmap(lambda p: bm.forward(model, p.body))(params)
    scale = (
        params.body_scale * obs_batched.constant_scale[:, None]
    )[:, None, :]
    result = {
        "vertices": (out.vertices + params.global_transl[:, None]) * scale,
        "joints": (out.joints + params.global_transl[:, None]) * scale,
        "pose": params.body.body_pose,
        "betas": params.body.betas,
        "global_orient": params.body.global_orient,
        "global_transl": params.global_transl * params.body_scale,
        "scale": params.body_scale,
        "full_pose": out.full_pose,
    }
    return params, result, losses
