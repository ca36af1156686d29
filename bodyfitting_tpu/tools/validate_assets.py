"""Validate real (licensed) assets against the loaders' expectations.

The test suite runs entirely on synthetic fixtures (the licensed SMPL/
SMPL-X files, ``gmm_08.pkl`` and the HMR/OpenPose checkpoints the
reference points at in /root/reference/config.py:1-6 cannot be vendored).
This tool closes the remaining risk on the user's machine: it loads real
files through the *production* loaders and checks the invariants the
fitting engine relies on, printing a PASS/FAIL report.

Usage::

    python -m bodyfitting_tpu.tools.validate_assets \
        --model_path data/smplx/SMPLX_NEUTRAL.npz \
        [--model_type smplx] [--gmm data/gmm_08.pkl] \
        [--hmr data/model_checkpoint.pt] \
        [--openpose_body body_pose_model.pth] \
        [--openpose_hand hand_pose_model.pth] \
        [--lbam LBAM_NoBN_ParisStreetView.pth]

Checkpoints are first verified STRUCTURALLY against the published
layer-name+shape manifests (tools/manifests.py) — a wrong or truncated
file is reported key-by-key before any conversion is attempted.

Exit status 0 iff every requested check passes.
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


class Report:
    def __init__(self):
        self.rows = []
        self.failed = 0

    def check(self, name, ok, detail=""):
        self.rows.append((bool(ok), name, detail))
        if not ok:
            self.failed += 1

    def info(self, name, detail):
        self.rows.append((None, name, detail))

    def dump(self):
        for ok, name, detail in self.rows:
            tag = "  ...." if ok is None else ("  PASS" if ok else "* FAIL")
            line = f"{tag}  {name}"
            if detail:
                line += f"  [{detail}]"
            print(line)
        print(
            f"\n{self.failed} failure(s), "
            f"{sum(1 for r in self.rows if r[0] is True)} passed."
        )


def validate_model(path: str, model_type, rep: Report):
    """Body-model asset invariants (smplx-package semantics the engine
    reproduces; see models/body_model.py docstrings for citations)."""
    import jax.numpy as jnp

    from bodyfitting_tpu.models import body_model as bm

    model = bm.load_model(
        path, model_type=model_type, flat_hand_mean=True
    )
    V = model.v_template.shape[0]
    J = model.J_regressor.shape[0]
    rep.info("model", f"type={model.model_type} V={V} J={J} "
                      f"F={model.faces.shape[0]}")

    w = np.asarray(model.lbs_weights)
    rep.check("lbs weight rows sum to 1",
              np.allclose(w.sum(1), 1.0, atol=1e-4),
              f"max |sum-1| = {np.abs(w.sum(1) - 1).max():.2e}")
    rep.check("lbs weights non-negative", (w >= -1e-6).all())

    jr = np.asarray(model.J_regressor)
    rep.check("J_regressor rows sum to 1",
              np.allclose(jr.sum(1), 1.0, atol=1e-3),
              f"max |sum-1| = {np.abs(jr.sum(1) - 1).max():.2e}")

    f = np.asarray(model.faces)
    rep.check("face indices in range", f.min() >= 0 and f.max() < V)
    degen = (f[:, 0] == f[:, 1]) | (f[:, 1] == f[:, 2]) | (f[:, 0] == f[:, 2])
    rep.check("no duplicate-vertex faces", not degen.any(),
              f"{int(degen.sum())} degenerate")

    expected_v = {"smpl": 6890, "smplh": 6890, "smplx": 10475}
    rep.check(
        f"vertex count matches published {model.model_type}",
        V == expected_v.get(model.model_type, V),
        f"{V} vs {expected_v.get(model.model_type)}",
    )

    # zero-pose forward reproduces the template (flat hands: full pose 0)
    out = bm.forward(model, bm.BodyParams.zeros(model))
    dv = np.abs(np.asarray(out.vertices) - np.asarray(model.v_template))
    rep.check("zero-pose forward == v_template",
              dv.max() < 1e-4, f"max |dv| = {dv.max():.2e}")

    if model.model_type == "smplx":
        rep.check(
            "expression dirs present (shapedirs 300:310 slice)",
            model.expr_dirs is not None
            and model.expr_dirs.shape[0] == model.num_expressions,
            f"{None if model.expr_dirs is None else model.expr_dirs.shape}",
        )
        rep.check(
            "static landmark table is 51 faces",
            model.lmk_faces_idx is not None
            and model.lmk_faces_idx.shape[0] == 51,
        )
        rep.check(
            "dynamic landmark table is [79, 17]",
            model.dyn_lmk_faces_idx is not None
            and tuple(model.dyn_lmk_faces_idx.shape) == (79, 17),
        )
        lf = np.asarray(model.lmk_faces_idx)
        rep.check("landmark face ids in range",
                  lf.min() >= 0 and lf.max() < model.faces.shape[0])
    if model.model_type in ("smplh", "smplx"):
        rep.check(
            "hand PCA components are [<=45, 45]",
            model.hand_components_l is not None
            and model.hand_components_l.shape[1] == 45,
            f"{None if model.hand_components_l is None else model.hand_components_l.shape}",
        )
        rep.check(
            "hand means are 45-dim",
            model.hand_mean_l is not None
            and model.hand_mean_l.shape[-1] == 45,
        )

    # A posed forward must produce finite outputs at a generic pose.
    import dataclasses

    rng = np.random.default_rng(0)
    p = dataclasses.replace(
        bm.BodyParams.zeros(model),
        body_pose=jnp.asarray(
            rng.normal(scale=0.2, size=3 * model.num_body_joints),
            jnp.float32,
        ),
        betas=jnp.asarray(rng.normal(size=model.num_betas), jnp.float32),
    )
    out = bm.forward(model, p)
    rep.check("posed forward finite",
              np.isfinite(np.asarray(out.vertices)).all()
              and np.isfinite(np.asarray(out.joints)).all())
    return model


def validate_gmm(path: str, rep: Report):
    """gmm_08.pkl invariants (reference smplify/prior.py:100-174)."""
    from bodyfitting_tpu.losses.priors import load_gmm_prior

    prior = load_gmm_prior(path)
    K, D = np.asarray(prior.means).shape
    rep.info("gmm", f"K={K} D={D}")
    rep.check("8 mixture components (gmm_08)", K == 8)
    rep.check("69-dim SMPL body pose", D == 69)
    prec = np.asarray(prior.precisions)
    eig = np.linalg.eigvalsh(prec)
    rep.check("precision matrices positive-definite",
              (eig > 0).all(), f"min eig = {eig.min():.2e}")
    rep.check("nll weights finite",
              np.isfinite(np.asarray(prior.log_nll_weights)).all())
    # the prior must prefer the mean pose over a wild one
    import jax.numpy as jnp

    nll_mean = float(prior(jnp.asarray(np.asarray(prior.means)[0])))
    nll_wild = float(prior(jnp.asarray(
        np.random.default_rng(0).normal(scale=2.0, size=D), jnp.float32
    )))
    rep.check("NLL(mean pose) < NLL(wild pose)", nll_mean < nll_wild,
              f"{nll_mean:.1f} vs {nll_wild:.1f}")


def _structural_check(rep, name, state_dict, required, optional):
    """Manifest rows: required-tensor coverage, shapes, extra keys."""
    from bodyfitting_tpu.tools.manifests import check_state_dict

    r = check_state_dict(state_dict, required, optional)
    rep.check(
        f"{name}: all {r['n_required']} required tensors present",
        not r["missing"],
        "" if not r["missing"] else
        f"{len(r['missing'])} missing, e.g. {list(r['missing'])[:3]}",
    )
    rep.check(
        f"{name}: tensor shapes match the published architecture",
        not r["mismatched"],
        "" if not r["mismatched"] else
        f"{len(r['mismatched'])} wrong, e.g. "
        + str({k: v for k, v in list(r['mismatched'].items())[:2]}),
    )
    if r["extra"]:
        rep.info(f"{name}: extra keys ignored",
                 f"{len(r['extra'])}, e.g. {r['extra'][:3]}")
    return r["ok"]


# torch.load fallback policy: all three checkpoint families this tool
# vets (HMR, OpenPose pth, LBAM) are plain tensor dicts, so the safe
# weights_only=True loader handles them; weights_only=False executes
# arbitrary pickle code from the very file being vetted, so it is only
# reachable behind the explicit --unsafe-load flag (advisor finding r4).
_UNSAFE_LOAD = False


def _torch_load_checkpoint(path: str, rep: Report, name: str):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # noqa: BLE001 — pickle errors vary widely
        if _UNSAFE_LOAD:
            rep.info(f"{name}: weights_only load failed, using "
                     f"--unsafe-load pickle fallback", str(e)[:100])
            return torch.load(path, map_location="cpu", weights_only=False)
        rep.check(
            f"{name} loads with weights_only=True", False,
            f"{str(e)[:100]} — re-run with --unsafe-load ONLY if you "
            f"trust this file (executes pickled code)",
        )
        return None


def validate_hmr(path: str, rep: Report):
    """HMR checkpoint: structural manifest check, then conversion."""
    import jax

    from bodyfitting_tpu.models import hmr as hmr_mod
    from bodyfitting_tpu.tools.manifests import expected_hmr_state_dict

    model, variables = hmr_mod.init_hmr(jax.random.PRNGKey(0))
    ckpt = _torch_load_checkpoint(path, rep, "hmr")
    if ckpt is None:
        return
    sd = ckpt["model"] if isinstance(ckpt, dict) and isinstance(
        ckpt.get("model"), dict) else ckpt
    required, optional = expected_hmr_state_dict(variables)
    if not _structural_check(rep, "hmr", sd, required, optional):
        return
    try:
        converted = hmr_mod.convert_torch_checkpoint(sd, variables)
        rep.check("hmr checkpoint converts", True)
    except Exception as e:  # noqa: BLE001
        rep.check("hmr checkpoint converts", False, str(e)[:120])
        return
    n_params = sum(
        np.asarray(x).size for x in jax.tree.leaves(converted)
    )
    rep.info("hmr", f"{n_params / 1e6:.1f}M parameters")
    import jax.numpy as jnp

    out = hmr_mod.hmr_forward(
        model, converted, jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    rot = np.asarray(out[0])
    rep.check("hmr output is 24 rotation matrices",
              rot.shape[-3:] == (24, 3, 3))
    rtr = rot.reshape(-1, 3, 3)
    orth = np.abs(rtr @ rtr.transpose(0, 2, 1) - np.eye(3)).max()
    rep.check("hmr rotations orthonormal", orth < 1e-3,
              f"max |RR^T - I| = {orth:.2e}")


def validate_openpose(path: str, which: str, rep: Report):
    """OpenPose .pth: structural manifest check, then conversion."""
    from bodyfitting_tpu.models import openpose as op
    from bodyfitting_tpu.tools.manifests import (
        expected_openpose_state_dict,
        normalize_openpose_keys,
    )

    inits = {
        "body": op.init_body_net,
        "hand": op.init_hand_net,
        "face": op.init_face_net,
    }
    model, variables = inits[which]()
    sd = _torch_load_checkpoint(path, rep, f"openpose {which}")
    if sd is None:
        return
    required, optional = expected_openpose_state_dict(variables)
    if not _structural_check(
        rep, f"openpose {which}", normalize_openpose_keys(sd),
        required, optional,
    ):
        return
    try:
        variables = op.convert_openpose_torch(sd, variables)
        rep.check(f"openpose {which} net converts", True)
    except Exception as e:  # noqa: BLE001
        rep.check(f"openpose {which} net converts", False, str(e)[:120])
        return
    import jax.numpy as jnp

    out = model.apply(variables, jnp.zeros((1, 368, 368, 3), jnp.float32))
    if not isinstance(out, (tuple, list)):
        out = (out,)
    shapes = tuple(tuple(o.shape) for o in out)
    n_ch = {"body": (38, 19), "hand": (22,), "face": (71,)}[which]
    rep.check(
        f"openpose {which} output channels {n_ch}",
        tuple(s[-1] for s in shapes) == n_ch, f"{shapes}",
    )


def validate_lbam(path: str, rep: Report):
    """LBAM inpainter .pth: structural manifest check, then conversion
    and a finite-output probe."""
    from bodyfitting_tpu.models import inpaint as lbam
    from bodyfitting_tpu.tools.manifests import expected_lbam_state_dict

    inp = lbam.Inpainter()
    sd = _torch_load_checkpoint(path, rep, "lbam")
    if sd is None:
        return
    required, optional = expected_lbam_state_dict(inp.variables)
    if not _structural_check(rep, "lbam", sd, required, optional):
        return
    try:
        inp.variables = lbam.convert_lbam_torch(sd, inp.variables)
        rep.check("lbam checkpoint converts", True)
    except Exception as e:  # noqa: BLE001
        rep.check("lbam checkpoint converts", False, str(e)[:120])
        return
    img = np.full((64, 64, 3), 128, np.uint8)
    mask = np.zeros((64, 64, 3), np.uint8)
    mask[16:48, 16:48] = 255
    out = inp(img, mask)
    rep.check("lbam inpaints finite values in [0,1]",
              np.isfinite(out).all() and out.min() >= 0
              and out.max() <= 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--model_path", help="SMPL .pkl / SMPL-X .npz asset")
    ap.add_argument("--model_type", default=None,
                    choices=[None, "smpl", "smplh", "smplx"])
    ap.add_argument("--gmm", help="gmm_08.pkl pose prior")
    ap.add_argument("--hmr", help="HMR model_checkpoint.pt")
    ap.add_argument("--openpose_body", help="body_pose_model.pth")
    ap.add_argument("--openpose_hand", help="hand_pose_model.pth")
    ap.add_argument("--openpose_face", help="face net .pth")
    ap.add_argument("--lbam", help="LBAM_NoBN_ParisStreetView.pth")
    ap.add_argument(
        "--unsafe-load", action="store_true",
        help="fall back to torch.load(weights_only=False) when the safe "
             "loader rejects a checkpoint — executes pickled code from "
             "the file; use only on files you trust",
    )
    args = ap.parse_args(argv)
    global _UNSAFE_LOAD
    _UNSAFE_LOAD = args.unsafe_load

    rep = Report()
    any_given = False
    if args.model_path:
        any_given = True
        validate_model(args.model_path, args.model_type, rep)
    if args.gmm:
        any_given = True
        validate_gmm(args.gmm, rep)
    if args.hmr:
        any_given = True
        validate_hmr(args.hmr, rep)
    for which in ("body", "hand", "face"):
        p = getattr(args, f"openpose_{which}")
        if p:
            any_given = True
            validate_openpose(p, which, rep)
    if args.lbam:
        any_given = True
        validate_lbam(args.lbam, rep)
    if not any_given:
        ap.error("give at least one asset to validate")
    rep.dump()
    return 1 if rep.failed else 0


if __name__ == "__main__":
    sys.exit(main())
