"""Texfit cold-start across processes (VERDICT r3 item 8).

Runs the default texture fit (bucketed one-hot plans, 200 Adam iters,
1024^2 atlas / 512^2 renders — the bench_configs 5b shape) ONCE in this
process with the persistent compilation cache enabled, and prints the
first-call wall (cold or cross-process warm, depending on cache state)
plus a second in-process call (fully warm).  Protocol:

    python bench_texfit_coldstart.py --fresh_cache   # process 1: cold
    python bench_texfit_coldstart.py                 # process 2: x-proc warm

Caveat (CLAUDE.md): on this tunneled TPU the remote compiler serves part
of the compile wall regardless of the local cache, and cold walls swing
2-4x between sessions — compare the two processes of ONE session only.
"""

import argparse
import json
import shutil
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fresh_cache", action="store_true",
                    help="wipe the persistent compilation cache first "
                         "(true cold start)")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import os

    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "bodyfitting_tpu", "xla"
    )
    if args.fresh_cache:
        shutil.rmtree(cache_dir, ignore_errors=True)
    from bodyfitting_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from scipy.spatial import ConvexHull

    from bodyfitting_tpu.fitting import texture as texfit

    rng = np.random.default_rng(0)
    sph = rng.normal(size=(2000, 3))
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    hull_f = ConvexHull(sph).simplices.astype(np.int32)
    sv = sph.astype(np.float32)
    uu = 0.5 + np.arctan2(sv[:, 2], sv[:, 0]) / (2 * np.pi)
    vv = 0.5 + np.arcsin(np.clip(sv[:, 1], -1, 1)) / np.pi
    fuv = np.stack(
        [np.stack([uu[hull_f[:, i]], vv[hull_f[:, i]]], -1)
         for i in range(3)], 1,
    ).astype(np.float32)
    scan_tex = rng.uniform(size=(1024, 1024, 3)).astype(np.float32)

    walls = []
    for salt in (0.0, 0.37):          # fresh inputs per launch (tunnel
        # cache serves repeat-identical work)
        stex = np.clip(scan_tex + np.float32(salt), 0.0, 1.0)
        t0 = time.perf_counter()
        _, losses = texfit.fit_texture(
            sv, hull_f, fuv, sv, hull_f, fuv, stex,
            texfit.TextureFitConfig(iter_num=args.iters),
        )
        float(losses[-1])             # host fetch inside the wall
        walls.append(time.perf_counter() - t0)

    print(json.dumps({
        "metric": "texfit_coldstart_wall_s",
        "first_call_s": round(walls[0], 1),
        "in_process_warm_s": round(walls[1], 1),
        "fresh_cache": args.fresh_cache,
        "unit": f"{args.iters}-iter 1024^2/512^2 bucketed texfit incl. "
                "plan builds; first_call is cold with --fresh_cache, "
                "cross-process warm otherwise",
    }))


if __name__ == "__main__":
    main()
