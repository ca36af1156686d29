"""Checkpoint / resume for long fitting runs.

The reference has no optimizer-state checkpointing (SURVEY §5) — a crash
mid-sequence re-runs every fit.  Here the scan-based SMPLify loop can run
in chunks with ``(params, adam state, step)`` persisted after each chunk,
so an interrupted sequence fit resumes where it stopped.  Serialisation
uses flax's msgpack (structure restored against a template), so it is
pytree-shape-safe across restarts.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.models import body_model as bm


@dataclasses.dataclass
class FitCheckpoint:
    params: smplify.FitParams
    opt_state: object
    step: int


def _payload(ckpt: FitCheckpoint):
    return {
        "params": ckpt.params,
        "opt_state": ckpt.opt_state,
        "step": jnp.asarray(ckpt.step),
    }


def save_checkpoint(path: str, ckpt: FitCheckpoint) -> None:
    """msgpack the flattened leaf list (structure comes from the caller's
    template at load time — pytree-registration-agnostic)."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = jax.tree.leaves(_payload(ckpt))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(leaves))
    os.replace(tmp, path)          # atomic: a torn write never corrupts


def load_checkpoint(path: str, template: FitCheckpoint) -> FitCheckpoint:
    from flax import serialization

    tpl = _payload(template)
    tpl_leaves, treedef = jax.tree.flatten(tpl)
    with open(path, "rb") as f:
        leaves = serialization.from_bytes(tpl_leaves, f.read())
    restored = jax.tree.unflatten(treedef, leaves)
    return FitCheckpoint(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )


def fit_resumable(
    model: bm.BodyModel,
    config: smplify.FitConfig,
    obs: smplify.Observations,
    init: smplify.FitParams,
    pose_prior_fn,
    checkpoint_path: Optional[str] = None,
    chunk_size: int = 100,
):
    """Run the SMPLify loop in resumable chunks.

    Identical optimization trajectory to :func:`smplify.fit` (same Adam
    state threading, same step indices for the stage gates); after every
    ``chunk_size`` steps the state is checkpointed, and an existing
    checkpoint at ``checkpoint_path`` resumes the run.

    Returns ``(params, result dict, losses [num_iters])``.
    """
    tx = smplify._make_optimizer(config, init)
    # same model reduction as smplify.fit so chunked runs follow the
    # production trajectory (trajectories are float-chaotic, CLAUDE.md)
    loss_model, joints_model = smplify.loss_models(model, config)
    params = init
    opt_state = tx.init(init)
    start_step = 0

    if checkpoint_path and os.path.exists(checkpoint_path):
        template = FitCheckpoint(params=params, opt_state=opt_state, step=0)
        ck = load_checkpoint(checkpoint_path, template)
        params, opt_state, start_step = ck.params, ck.opt_state, ck.step

    def chunk(params, opt_state, step0, n):
        def step_fn(carry, step):
            p, s = carry
            (loss, _), grads = jax.value_and_grad(
                lambda q: smplify.fit_loss(
                    loss_model, config, q, obs, step, pose_prior_fn,
                    joints_model=joints_model,
                ),
                has_aux=True,
            )(p)
            updates, s = tx.update(grads, s, p)
            p = jax.tree.map(lambda a, u: a + u, p, updates)
            return (p, s), loss

        return jax.lax.scan(
            step_fn, (params, opt_state),
            step0 + jnp.arange(n),
        )

    chunk_jit = jax.jit(chunk, static_argnames=("n",))

    all_losses = []
    step = start_step
    while step < config.num_iters:
        n = min(chunk_size, config.num_iters - step)
        (params, opt_state), losses = chunk_jit(params, opt_state, step, n)
        losses.block_until_ready()
        all_losses.append(losses)
        step += n
        if checkpoint_path:
            save_checkpoint(
                checkpoint_path,
                FitCheckpoint(params=params, opt_state=opt_state,
                              step=step),
            )

    out = bm.forward(model, params.body)
    scale = params.body_scale * obs.constant_scale
    result = {
        "vertices": (out.vertices + params.global_transl) * scale,
        "joints": (out.joints + params.global_transl) * scale,
        "pose": params.body.body_pose,
        "betas": params.body.betas,
        "global_orient": params.body.global_orient,
        "global_transl": params.global_transl * params.body_scale,
        "scale": params.body_scale,
        "full_pose": out.full_pose,
    }
    losses = (
        jnp.concatenate(all_losses) if all_losses
        else jnp.zeros((0,))
    )
    return params, result, losses
