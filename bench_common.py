"""Shared TPU-tunnel-safe timing helpers for the bench scripts.

The tunnel rules these encode (CLAUDE.md):
  - per-process-unique salt: fixed seeds replay byte-identical launches
    across processes, which the tunnel's execution cache can serve;
  - every launch (warmups included) gets a distinct offset — repeated
    identical (program, inputs) launches can be cache-served;
  - timed sections must FETCH the result to host (``float(out)``) —
    ``block_until_ready`` can return before execution finishes;
  - median of the timed runs: robust to transient tunnel degradation
    either way (a wedge inflates a run; we must not cherry-pick the best
    either);
  - microbenchmarks time N varied iterations inside ONE jitted
    ``lax.scan`` (per-launch dispatch over the tunnel costs ~ms).
"""

import time
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


def process_salt() -> float:
    """A per-process-unique offset in ``[1, 998)``."""
    return (time.time() % 997.0) + 1.0


class TimedResult(NamedTuple):
    median: float       # median wall seconds over the timed runs
    walls: list         # individual timed-run wall seconds
    first: float        # wall of the first (compile+execute) warmup


def timed_launches(
    run: Callable[[np.float32], None],
    *,
    warmups: int = 2,
    runs: int = 3,
    salt: float | None = None,
) -> TimedResult:
    """Time ``run(offset)`` launches under the tunnel protocol.

    ``run`` must perturb its inputs by ``offset`` (so no two launches are
    identical) and fetch its result to host before returning.
    """
    if salt is None:
        salt = process_salt()
    first = None
    for w in range(warmups):
        t0 = time.perf_counter()
        run(np.float32(salt + 0.25 * (w + 1)))
        if first is None:
            first = time.perf_counter() - t0
    walls = []
    for r in range(runs):
        t0 = time.perf_counter()
        run(np.float32(salt + 1 + r))
        walls.append(time.perf_counter() - t0)
    return TimedResult(float(np.median(walls)), walls, first or 0.0)


def timed_scan(step_fn, *args, runs: int = 50, warmups: int = 2,
               timed: int = 3) -> float:
    """Median per-iteration seconds of ``step_fn(seed, *args) -> scalar``,
    timing ``runs`` varied iterations inside ONE jitted ``lax.scan``.

    ``step_fn`` receives a distinct scalar seed each scan iteration (the
    iteration index plus a fresh per-launch offset) and should fold it
    into its inputs so no iteration repeats another's computation.
    """
    f = jax.jit(
        lambda s, *a: jax.lax.scan(
            lambda c, r: (c + step_fn(r + s, *a), None),
            jnp.zeros(()), jnp.arange(1.0, runs + 1.0),
        )[0]
    )

    def run(off):
        float(f(jnp.full((), off), *args))

    res = timed_launches(run, warmups=warmups, runs=timed)
    return res.median / runs


def timed_fit_repeats(fit_losses_fn, obs, *, repeats: int = 4,
                      warmups: int = 1, runs: int = 3) -> TimedResult:
    """Per-fit wall via ``repeats`` full fits inside ONE jitted lax.scan.

    ``fit_losses_fn(obs) -> losses`` runs one complete fit and returns its
    loss trace.  Each scan repeat perturbs ``obs.keypoints`` by a distinct
    salted offset (fresh inputs — the tunnel caches repeat-identical
    work), the scan carry sums the traces (forces sequential execution and
    gives a host-fetchable scalar), and the launch overhead + tunnel
    session variance amortize over ``repeats`` — the session-invariant
    protocol of ``bench_skinning.timed_scan`` applied at fit granularity
    (VERDICT r3 item 6).  Returned walls are per-fit (already / repeats).
    """
    import dataclasses

    def body(ob, c, r):
        o = dataclasses.replace(ob, keypoints=ob.keypoints + r)
        losses = fit_losses_fn(o)
        return c + jnp.sum(losses), None

    # obs is a jit ARGUMENT, not a closure: broadcast masks/keypoints as
    # closed-over literals blow the remote-compile request-size limit
    # (HTTP 413, CLAUDE.md)
    f = jax.jit(
        lambda ob, s: jax.lax.scan(
            lambda c, r: body(ob, c, r),
            jnp.zeros(()), s + jnp.arange(1.0, repeats + 1.0)
        )[0]
    )

    def run(off):
        float(f(obs, jnp.full((), off)))

    res = timed_launches(run, warmups=warmups, runs=runs)
    return TimedResult(
        res.median / repeats, [w / repeats for w in res.walls], res.first
    )
