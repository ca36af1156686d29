"""Microbenchmark: the fused stay-inside sampler at production shape.

Isolates ``ops.pallas_kernels.bilinear_cov_grads`` — the binary-term
kernel that owns ~8 ms/iter of the production mask config (3b) — at the
exact production shape (B=32 frames x 8 mask views, M=2619 strided
SMPL-X vertices, 512^2 masks), sweeping ``point_tile`` x ``row_window``
to attribute the remaining wall between per-tile fixed overhead, the
windowed row sweep, and the full-W column work.

Points are drawn like a mid-fit body: clustered in a ~[150 x 300] pixel
box and sorted by y (the ``FitConfig.mask_point_order='height'``
contract), salted per scan iteration so the tunnel can never serve
cached executions (CLAUDE.md timing rules).

Usage: python bench_stay_inside.py [--iters 50]
"""

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench_common import timed_scan


def make_inputs(B=32, Vm=8, M=2619, H=512, W=512, seed=0):
    rng = np.random.default_rng(seed)
    # mid-fit body: x/y spanning ~60% of the image, sorted by y
    x0, x1 = 0.35 * W, 0.65 * W
    y0, y1 = 0.2 * H, 0.78 * H
    xy = np.stack(
        [
            rng.uniform(x0, x1, size=(B * Vm, M)),
            np.sort(rng.uniform(y0, y1, size=(B * Vm, M)), axis=1),
        ],
        axis=-1,
    ).astype(np.float32)
    masks = np.zeros((B * Vm, H, W), np.float32)
    masks[:, int(y0):int(y1), int(x0):int(x1)] = 1.0
    return jnp.asarray(xy), jnp.asarray(masks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--H", type=int, default=512)
    ap.add_argument("--W", type=int, default=512)
    ap.add_argument("--tiles", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--windows", type=int, nargs="*",
                    default=[0, 32, 64, 128])
    ap.add_argument("--band_rows", type=int, nargs="*",
                    default=[32, 64, 128],
                    help="banded-kernel variants (band-axis grid)")
    ap.add_argument("--value_and_grad", action="store_true",
                    help="time through the silhouette-loss custom-vjp "
                         "wrapper (forward + elementwise backward) "
                         "instead of the raw kernel forward")
    cli = ap.parse_args()

    from bodyfitting_tpu.ops.pallas_kernels import bilinear_cov_grads

    xy, masks = make_inputs(H=cli.H, W=cli.W)
    print(f"devices: {jax.devices()}  xy {xy.shape}  masks {masks.shape}")

    def time_variant(label, tile, rw=None, bands=None):
        def step(s, xy, masks):
            # salt positions; sum of outputs as the fetched scalar
            xys = xy + s * 1e-3
            f = functools.partial(
                bilinear_cov_grads, point_tile=tile, row_window=rw,
                band_rows=bands,
            )
            out = jax.vmap(f)(masks, xys)      # [BV, 6, M]
            return jnp.sum(out[:, 0]) + jnp.sum(out[:, 2])

        dt = timed_scan(step, xy, masks, runs=cli.iters)
        print(f"{label}: {dt*1e3:7.2f} ms/iter")

    for tile in cli.tiles:
        for win in cli.windows:
            time_variant(
                f"tile {tile:5d}  window {win:4d}", tile,
                rw=None if win == 0 else win,
            )
        for bands in getattr(cli, "band_rows", []):
            time_variant(
                f"tile {tile:5d}  bands  {bands:4d}", tile, bands=bands
            )


if __name__ == "__main__":
    main()
