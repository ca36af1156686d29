"""Checkpoint / resume for long fitting runs.

The reference has no optimizer-state checkpointing (SURVEY §5) — a crash
mid-sequence re-runs every fit.  Here the scan-based SMPLify loop can run
in chunks with ``(params, adam state, step, loss history)`` persisted
after each chunk, so an interrupted sequence fit resumes where it
stopped.  Serialisation uses flax's msgpack (structure restored against a
template), so it is pytree-shape-safe across restarts.
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
    params: object          # stage pytree (FitParams, or disp array)
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


def _run_chunked(
    step_fn,
    params,
    opt_state,
    num_iters: int,
    chunk_size: int,
    checkpoint_path: Optional[str],
):
    """Drive ``step_fn`` (a ``lax.scan`` body taking the step index) in
    resumable chunks; returns ``(params, opt_state, losses [num_iters])``
    with the FULL loss history even across resumes (the history rides in
    a ``.losses.npy`` sidecar so a resume with a different ``num_iters``
    still restores cleanly)."""
    import numpy as np

    losses = np.zeros((num_iters,), np.float32)
    start_step = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        template = FitCheckpoint(params=params, opt_state=opt_state, step=0)
        ck = load_checkpoint(checkpoint_path, template)
        params, opt_state, start_step = ck.params, ck.opt_state, ck.step
        lpath = checkpoint_path + ".losses.npy"
        if os.path.exists(lpath):
            prev = np.load(lpath)
            n = min(prev.shape[0], num_iters)
            losses[:n] = prev[:n]

    def chunk(params, opt_state, step0, n):
        return jax.lax.scan(
            step_fn, (params, opt_state), step0 + jnp.arange(n)
        )

    chunk_jit = jax.jit(chunk, static_argnames=("n",))

    step = start_step
    while step < num_iters:
        n = min(chunk_size, num_iters - step)
        (params, opt_state), chunk_losses = chunk_jit(
            params, opt_state, step, n
        )
        chunk_losses.block_until_ready()
        losses[step:step + n] = np.asarray(chunk_losses)
        step += n
        if checkpoint_path:
            save_checkpoint(
                checkpoint_path,
                FitCheckpoint(params=params, opt_state=opt_state,
                              step=step),
            )
            np.save(checkpoint_path + ".losses.npy", losses[:step])
    return params, opt_state, jnp.asarray(losses)


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

    Identical optimization trajectory to :func:`smplify.fit` (the scan
    step body is literally shared — ``smplify.make_step_fn``); after every
    ``chunk_size`` steps the state is checkpointed, and an existing
    checkpoint at ``checkpoint_path`` resumes the run.  The returned loss
    trace always covers all ``num_iters`` steps, resumes included.  With
    ``config.displacement and config.use_mesh`` the SMPL+D displacement
    stage runs too (chunked the same way, checkpointed at
    ``checkpoint_path + '.disp'``), matching :func:`smplify.fit`'s output
    schema.

    Returns ``(params, result dict, losses)``.
    """
    tx = smplify._make_optimizer(config, init)
    step_fn = smplify.make_step_fn(model, config, obs, pose_prior_fn, tx)
    params, _, losses = _run_chunked(
        step_fn, init, tx.init(init), config.num_iters, chunk_size,
        checkpoint_path,
    )

    result = smplify.fit_result(model, params, obs)

    if config.displacement and config.use_mesh:
        disp_loss, dtx, disp0 = smplify.displacement_problem(
            model, config, obs, jax.lax.stop_gradient(result["vertices"])
        )

        def disp_step(carry, _step):
            disp, opt_state = carry
            loss, grads = jax.value_and_grad(disp_loss)(disp)
            updates, opt_state = dtx.update(grads, opt_state, disp)
            import optax

            disp = optax.apply_updates(disp, updates)
            return (disp, opt_state), loss

        disp, _, disp_losses = _run_chunked(
            disp_step, disp0, dtx.init(disp0), config.num_iters,
            chunk_size,
            checkpoint_path + ".disp" if checkpoint_path else None,
        )
        result["displacement"] = disp
        losses = jnp.concatenate([losses, disp_losses])

    return params, result, losses
