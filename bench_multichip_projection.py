"""Multi-chip DP scaling projection: structural evidence + model.

The frame axis is embarrassingly parallel (each frame's 600-iter fit is
independent — the design replaces the reference's serial frame loop,
/root/reference/apps/genebody_fitting.py:184), so the projection model
is ``fits/s(n_chips) = n_chips x single-chip fits/s`` with NO collective
traffic on ICI.  This script provides the structural proof on an
8-virtual-device CPU mesh (the environment has one real chip):

  1. compiles the PRODUCTION staged training step
     (parallel.checks.make_production_fit_problem +
     parallel.sharding.training_step) sharded over a frame-DP mesh;
  2. counts cross-device collectives in the optimized HLO — frame-DP
     must have ZERO (all-reduce / all-gather / collective-permute /
     reduce-scatter / all-to-all);
  3. reports per-device memory of the compiled step so the
     frames-per-chip residency assumption (the ~150-frame sweet spot,
     BENCH_NOTES batch-scaling section) is stated with a number;
  4. executes one step to prove values, not just compilation.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_multichip_projection.py
"""

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

COLLECTIVES = (
    "all-reduce", "all-gather", "collective-permute", "reduce-scatter",
    "all-to-all",
)


def main(frames_per_device: int = 2, num_iters: int = 12):
    jax.config.update("jax_platforms", "cpu")

    from bodyfitting_tpu.parallel import sharding as sh
    from bodyfitting_tpu.parallel.checks import make_production_fit_problem

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")
    mesh = sh.make_mesh()
    B = frames_per_device * n_dev

    model, config, obs, init, prior = make_production_fit_problem(
        num_iters=num_iters, n_frames=B
    )
    # evaluate past the stage gate so the mask/mesh branches are in the
    # compiled program (the expensive production step, not the cheap one)
    tx, step_vmapped = sh.training_step(
        model, config, prior, step_idx=config.num_iters
    )
    params = init
    opt_state = jax.vmap(tx.init)(params)

    from jax.sharding import NamedSharding, PartitionSpec as P

    frame_sh = NamedSharding(mesh, P("frames"))
    step = jax.jit(
        step_vmapped,
        in_shardings=(
            jax.tree.map(lambda _: frame_sh, params),
            jax.tree.map(lambda _: frame_sh, opt_state),
            sh.obs_sharding(mesh, obs),
        ),
    )
    compiled = step.lower(params, opt_state, obs).compile()
    hlo = compiled.as_text()

    counts = {
        c: len(re.findall(rf"= \S+ {c}\(", hlo))
        + len(re.findall(rf"{c}-start", hlo))
        for c in COLLECTIVES
    }
    total = sum(counts.values())
    nonzero = {k: v for k, v in counts.items() if v}
    print(f"collectives in the compiled {n_dev}-device DP step: {total}"
          + (f" ({nonzero})" if nonzero else ""))

    mem = compiled.memory_analysis()
    if mem is not None:
        try:
            print(
                f"per-device memory: args "
                f"{mem.argument_size_in_bytes/1e6:.1f} MB, temps "
                f"{mem.temp_size_in_bytes/1e6:.1f} MB, output "
                f"{mem.output_size_in_bytes/1e6:.1f} MB "
                f"({frames_per_device} frames/device)"
            )
        except AttributeError:
            print(f"memory analysis: {mem}")

    out = compiled(params, opt_state, obs)
    jax.block_until_ready(out)
    loss = np.asarray(out[2])
    assert loss.shape == (B,) and np.isfinite(loss).all()
    print("sharded step executed ok; per-frame losses finite")

    # No-hidden-serialization check: the same B-frame step compiled for
    # ONE device vs sharded over all n_dev virtual devices.  All virtual
    # devices share this host's single physical core, so total compute
    # is identical; any sharded-path overhead (sync, layout shuffles,
    # runtime scheduling) shows up directly as wall-clock excess.
    import time

    dev0 = jax.devices()[0]
    step_1dev = jax.jit(step_vmapped, device=dev0)
    compiled_1 = step_1dev.lower(params, opt_state, obs).compile()

    def timed(fn, reps=5):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, opt_state, obs))
            walls.append(time.perf_counter() - t0)
        return float(np.median(walls))

    timed(compiled, reps=1)
    timed(compiled_1, reps=1)
    w_n = timed(compiled)
    w_1 = timed(compiled_1)
    print(
        f"step wall, same {B}-frame work: 1 device {w_1*1e3:.1f} ms vs "
        f"{n_dev}-device sharded {w_n*1e3:.1f} ms "
        f"(ratio {w_n/w_1:.2f}; ~1.0 = no hidden serialization beyond "
        f"compute on this 1-core host)"
    )

    if total == 0:
        print(
            "PROJECTION: zero-collective frame-DP -> fits/s(n) = "
            "n x single-chip fits/s (186.6 at the 150-frame headline "
            "point, BENCH_r04), valid while (a) each chip holds its "
            "~150-frame chunk (residency sweet spot, BENCH_NOTES batch "
            "scaling) and (b) the host pipeline feeds n chips — GeneBody "
            "host prep saturates ~one chip per host core today, so "
            "multi-chip runs need the io_cache steady state or one "
            "prep host per few chips, NOT more ICI."
        )
        return 0
    print("PROJECTION: collectives present — linear-DP model needs "
          "re-derivation", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
