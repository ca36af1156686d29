"""Microbench: fused Pallas skinning vs XLA matmul+einsum, on the chip.

Measures the full-vertex forward+backward skinning step at fit scale
(SMPL-X 10475 verts, batch 128) — the path mask/mesh fits take per
iteration (keypoint-only fits use the joints-only reduction instead).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.ops.pallas_kernels import make_fused_skinning, skinning_xla


def bench(fn, *args, runs=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs


def main(V=10475, J=55, B=128):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.random((V, J)), jnp.float32)
    W = W / W.sum(1, keepdims=True)
    A = jnp.asarray(rng.normal(size=(B, J, 12)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32)

    skin = make_fused_skinning(W)

    def loss_fused(a, v):
        return jax.vmap(skin)(a, v).sum()

    def loss_xla(a, v):
        return jax.vmap(lambda x, y: skinning_xla(W, x, y))(a, v).sum()

    # distinct inputs per run (TPU caches identical launches)
    fused_g = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))
    xla_g = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))
    fused_f = jax.jit(jax.vmap(skin))
    xla_f = jax.jit(jax.vmap(lambda x, y: skinning_xla(W, x, y)))

    for name, fn in [("fwd xla", xla_f), ("fwd fused", fused_f),
                     ("fwd+bwd xla", xla_g), ("fwd+bwd fused", fused_g)]:
        dt = bench(fn, A, vp)
        print(f"{name:>14}: {dt*1e3:8.3f} ms  "
              f"({B*V*3*4*2/dt/1e9:6.1f} GB/s io-bound-equiv)",
              file=sys.stderr)
    # numerical check on chip
    d = jnp.abs(fused_f(A, vp) - xla_f(A, vp)).max()
    print(f"max abs diff fused vs xla on-chip: {float(d):.2e}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
