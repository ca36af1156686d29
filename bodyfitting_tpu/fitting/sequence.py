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
    params: smplify.FitParams, tcfg: TemporalConfig
) -> jax.Array:
    """Smoothness terms over the leading frame axis of batched params."""

    def vel(x):
        return jnp.sum((x[1:] - x[:-1]) ** 2)

    def acc(x):
        return jnp.sum((x[2:] - 2 * x[1:-1] + x[:-2]) ** 2) if (
            x.shape[0] > 2
        ) else jnp.zeros(())

    total = tcfg.pose_velocity_weight * vel(params.body.body_pose)
    total += tcfg.orient_velocity_weight * vel(params.body.global_orient)
    total += tcfg.transl_velocity_weight * vel(params.global_transl)
    # shape should be constant across a subject's sequence
    mean_betas = params.body.betas.mean(axis=0, keepdims=True)
    total += tcfg.betas_consistency_weight * jnp.sum(
        (params.body.betas - mean_betas) ** 2
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
):
    """Jointly fit a sequence of frames with temporal smoothing.

    ``obs_batched`` / ``init_batched`` carry a leading frame axis.  Returns
    ``(params, result dict (batched), losses [num_iters])`` — like
    :func:`smplify.fit` but one optimization over all frames at once.
    """
    tx = smplify._make_optimizer(config, init_batched)
    opt_state = tx.init(init_batched)

    loss_model = model
    if config.reduce_joints_only and not (config.use_mask or config.use_mesh):
        try:
            # joints-only reduction, as in smplify.fit (host-side; needs
            # concrete model arrays — the normal closed-over case)
            loss_model = bm.reduce_for_joints(model)
        except jax.errors.TracerArrayConversionError:
            loss_model = model

    per_frame_loss = jax.vmap(
        lambda p, o, step: smplify.fit_loss(
            loss_model, config, p, o, step, pose_prior_fn
        )[0],
        in_axes=(0, 0, None),
    )

    def total_loss(params, step):
        frame_losses = per_frame_loss(params, obs_batched, step)
        return jnp.sum(frame_losses) + temporal_loss(params, tcfg)

    def step_fn(carry, step):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(total_loss)(params, step)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step_fn, (init_batched, opt_state), jnp.arange(config.num_iters)
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
