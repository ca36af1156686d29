"""Microbench: fused Pallas skinning vs XLA matmul+einsum, on the chip.

Measures the full-vertex forward+backward skinning step at fit scale
(SMPL-X 10475 verts, batch 128) — the path mask/mesh fits take per
iteration (keypoint-only fits use the joints-only reduction instead).

Timing methodology: the remote-TPU per-launch dispatch latency is on the
order of the kernel times themselves, so each variant runs ``runs``
iterations inside ONE jitted ``lax.scan`` whose per-step inputs differ
(a step-indexed perturbation), and the wall time of that single launch is
divided by ``runs``.  No launch caching, no dispatch pollution.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.ops.pallas_kernels import make_fused_skinning, skinning_xla


def timed_scan(step_fn, A, vp, runs=50):
    """Median per-iteration seconds of ``step_fn(A + s*1e-6, vp)`` under
    the shared tunnel-safe protocol (``bench_common.timed_scan``) — the
    seed perturbs the transforms so no iteration or launch repeats."""
    from bench_common import timed_scan as _timed_scan

    return _timed_scan(
        lambda s, a, v: step_fn(a + s * 1e-6, v), A, vp, runs=runs
    )


def main(V=10475, J=55, B=128):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.random((V, J)), jnp.float32)
    W = W / W.sum(1, keepdims=True)
    A = jnp.asarray(rng.normal(size=(B, J, 12)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32)

    skin = make_fused_skinning(W)

    def fwd_fused(a, v):
        return jax.vmap(skin)(a, v).sum()

    def fwd_xla(a, v):
        return jax.vmap(lambda x, y: skinning_xla(W, x, y))(a, v).sum()

    def bwd_fused(a, v):
        g = jax.grad(fwd_fused, argnums=(0, 1))(a, v)
        return g[0].sum() + g[1].sum()

    def bwd_xla(a, v):
        g = jax.grad(fwd_xla, argnums=(0, 1))(a, v)
        return g[0].sum() + g[1].sum()

    for name, fn in [("fwd xla", fwd_xla), ("fwd fused", fwd_fused),
                     ("fwd+bwd xla", bwd_xla), ("fwd+bwd fused", bwd_fused)]:
        dt = timed_scan(fn, A, vp)
        print(f"{name:>14}: {dt*1e3:8.3f} ms/iter", file=sys.stderr)
    d = jnp.abs(jax.vmap(skin)(A, vp)
                - jax.vmap(lambda x, y: skinning_xla(W, x, y))(A, vp)).max()
    print(f"max abs diff fused vs xla on-chip: {float(d):.2e}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
