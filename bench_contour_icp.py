"""Microbench: contour->vertex ICP match, Pallas kernel vs XLA broadcast.

The silhouette loss's ICP term matches every (resampled) contour pixel to
the nearest projected every-4th SMPL vertex per iteration — measured
3.4 ms/iter as a broadcast [P, M] min+argmin at 8 frames x 8 mask views
(BENCH_NOTES.md).  This times both implementations of the *full
silhouette loss value+grad* at that shape inside one jitted ``lax.scan``
with step-varied inputs (per-launch tunnel dispatch is ~ms, so never time
a Python loop of launches), plus the match alone.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from bench_common import timed_scan
from bodyfitting_tpu.losses import silhouette as sil


def main(B=8, Vm=8, P=512, V=10475, imsize=512):
    rng = np.random.default_rng(0)
    M = V // 4 + (1 if V % 4 else 0)
    contours = jnp.asarray(
        rng.uniform(0, imsize, size=(B, Vm, P, 2)), jnp.float32
    )
    cvalid = jnp.ones((B, Vm, P), jnp.float32)
    masks = jnp.asarray(
        rng.uniform(size=(B, Vm, imsize, imsize)) > 0.5, jnp.float32
    )
    K = jnp.asarray([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    Ks = jnp.broadcast_to(K, (B, Vm, 3, 3))
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    w2cs = jnp.broadcast_to(w2c, (B, Vm, 4, 4))
    verts = jnp.asarray(rng.normal(size=(B, V, 3)) * 0.5, jnp.float32)

    # NB: observation tensors are passed as arguments, never closed over
    # (the remote-compile tunnel rejects huge constants, CLAUDE.md)
    def loss_at(vs, co, cv, ms, ws, ks):
        per_frame = lambda c, v, m, w, k, ve: sil.silhouette_loss(  # noqa
            c, v, m, w, k, ve, imsize=float(imsize)
        )
        return jax.vmap(per_frame)(co, cv, ms, ws, ks, vs).sum()

    def value_grad(r, vs, co, cv, ms, ws, ks):
        l, g = jax.value_and_grad(
            lambda v: loss_at(v, co, cv, ms, ws, ks)
        )(vs + r * 1e-4)
        return l + g.sum()

    # match-only comparison at one view shape
    c1 = contours[0, 0]
    p1 = jnp.asarray(rng.uniform(0, imsize, size=(M, 2)), jnp.float32)
    v1 = jnp.ones((M,), jnp.float32)

    def match_xla(r, c, p, v):
        pr = p + r * 1e-4
        d2 = jnp.sum((c[:, None, :] - pr[None, :, :]) ** 2, -1)
        d2 = jnp.where(v[None, :] > 0, d2, 1e9)
        return jnp.min(d2, 1).sum() + jnp.argmin(d2, 1).sum().astype(
            jnp.float32
        )

    def match_pallas(r, c, p, v):
        from bodyfitting_tpu.ops.pallas_kernels import contour_min_idx

        d2, idx = contour_min_idx(c, p + r * 1e-4, v)
        return d2.sum() + idx.sum().astype(jnp.float32)

    for name, fn, args in [
        ("match xla (1 view)", match_xla, (c1, p1, v1)),
        ("match pallas (1 view)", match_pallas, (c1, p1, v1)),
    ]:
        dt = timed_scan(fn, *args)
        print(f"{name:>28}: {dt*1e3:8.3f} ms/iter", file=sys.stderr)

    for impl in ["xla", "pallas"]:
        sil.CONTOUR_MATCH = impl
        dt = timed_scan(
            value_grad, verts, contours, cvalid, masks, w2cs, Ks, runs=30
        )
        print(
            f"silhouette loss val+grad [{impl:6}] (B={B}, Vm={Vm}): "
            f"{dt*1e3:8.3f} ms/iter", file=sys.stderr,
        )
    sil.CONTOUR_MATCH = "auto"

    # value parity on-chip
    sil.CONTOUR_MATCH = "xla"
    lx = jax.jit(loss_at)(verts, contours, cvalid, masks, w2cs, Ks)
    sil.CONTOUR_MATCH = "pallas"
    lp = jax.jit(loss_at)(verts, contours, cvalid, masks, w2cs, Ks)
    sil.CONTOUR_MATCH = "auto"
    print(
        f"loss parity xla vs pallas: {float(lx):.6e} vs {float(lp):.6e}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
