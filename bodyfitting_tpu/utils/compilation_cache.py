"""Persistent XLA compilation cache setup.

Cold-start profiling (BENCH_NOTES.md) shows the heavy one-time costs are
XLA compiles (90-250 s for the large fit programs), not compute.  Enabling
jax's persistent compilation cache makes them once-per-machine instead of
once-per-process.  Called by the CLI apps and the benchmark; opt out with
``BODYFIT_NO_COMPILE_CACHE=1``.

Caveat: on this development environment's tunneled TPU ("axon" platform,
remote_compile over HTTP) the big-program compile largely bypasses the
local cache; on standard TPU VMs the cache eliminates repeat compiles.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache (idempotent)."""
    if os.environ.get("BODYFIT_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = cache_dir or os.environ.get(
        "BODYFIT_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "bodyfitting_tpu", "xla"
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes meaningful time to compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
