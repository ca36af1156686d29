"""Shared pad-and-reshape helper for block-scanned kernels.

Every blocked sweep in ``ops/`` (nearest point, inside-mesh,
ray-intersect, z-buffer raster, soft silhouette) pads its face axis to a
multiple of the block size with a sentinel that can never win the
reduction, then reshapes to ``[num_blocks, block, ...]`` for ``lax.scan``.
The arithmetic lives here once; each site keeps choosing its own
sentinel (far-away triangle, -FAR screen coords, FAR depth).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_to_blocks(arr: jax.Array, block: int, fill) -> jax.Array:
    """Pad axis 0 to a multiple of ``block`` with ``fill`` and reshape to
    ``[nb, block, *rest]``."""
    n = arr.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        arr = jnp.concatenate(
            [arr, jnp.full((pad,) + arr.shape[1:], fill, arr.dtype)]
        )
    return arr.reshape((nb, block) + arr.shape[1:])


def num_blocks(n: int, block: int) -> int:
    """Ceil-division block count (matches :func:`pad_to_blocks`)."""
    return -(-n // block)
