"""Structural manifests for the published torch checkpoints.

The engine converts three families of released PyTorch weights:

* SPIN HMR ``model_checkpoint.pt`` (ResNet-50 + IEF head; the reference
  loads it at /root/reference/smplify/body_fitting.py:20-26 from
  /root/reference/config.py:6),
* pytorch-openpose ``body_pose_model.pth`` / ``hand_pose_model.pth``
  (flat layer-name keys — the reference re-prefixes them at
  /root/reference/openpose/util.py:35-39, loaded at openpose/body.py:56),
* LBAM ``LBAM_NoBN_ParisStreetView.pth`` (the generator state dict,
  loaded strict at /root/reference/models/inpaint.py:10; used at
  texture_fitting.py:189).

The licensed files cannot be vendored, so conversion correctness is
proven against synthetic random checkpoints with the same structure
(tests/test_hmr.py, test_openpose_draw.py, test_inpaint.py).  This
module closes the structural gap for *real* files: each ``expected_*``
function derives the exact torch key -> shape table a checkpoint must
contain by inverting the corresponding converter's name mapping over the
live Flax variable tree — so the manifest can never drift from the
architecture — and :func:`check_state_dict` produces a clear
missing/extra/shape-mismatch report BEFORE conversion is attempted.
The converters call it and refuse with that report instead of a bare
``KeyError`` mid-conversion.
"""

from __future__ import annotations

import numpy as np


def _flat(variables):
    import flax

    return flax.traverse_util.flatten_dict(variables)


def expected_hmr_state_dict(variables):
    """Torch key -> shape table for the SPIN HMR checkpoint's ``model``
    dict (required, optional); mapping mirrors
    ``models.hmr.convert_torch_checkpoint``."""
    required: dict[str, tuple] = {}
    optional: dict[str, tuple] = {}
    bn_prefixes = set()
    for path, val in _flat(variables).items():
        col, leaf = path[0], path[-1]
        mods = path[1:-1]
        name = mods[0]
        if name.startswith("layer") and "_" in name:
            layer, block = name.split("_")
            prefix = f"{layer}.{block}"
            sub = mods[1]
            if sub == "downsample_conv":
                prefix += ".downsample.0"
            elif sub == "downsample_bn":
                prefix += ".downsample.1"
            else:
                prefix += f".{sub}"
        else:
            prefix = ".".join(mods)
        shape = tuple(val.shape)
        if col == "params":
            if leaf == "kernel" and val.ndim == 4:   # HWIO -> OIHW
                required[f"{prefix}.weight"] = (
                    shape[3], shape[2], shape[0], shape[1])
            elif leaf == "kernel":                   # [in,out] -> [out,in]
                required[f"{prefix}.weight"] = (shape[1], shape[0])
            elif leaf == "scale":
                required[f"{prefix}.weight"] = shape
                bn_prefixes.add(prefix)
            else:
                required[f"{prefix}.bias"] = shape
        else:  # batch_stats
            key = "running_mean" if leaf == "mean" else "running_var"
            required[f"{prefix}.{key}"] = shape
            bn_prefixes.add(prefix)
    for p in bn_prefixes:
        optional[f"{p}.num_batches_tracked"] = ()
    # registered mean-parameter buffers (reference models/hmr.py:92-94);
    # present in the published file, unused by the converter (the Flax
    # model takes them from smpl_mean_params directly)
    optional["init_pose"] = (1, 144)
    optional["init_shape"] = (1, 10)
    optional["init_cam"] = (1, 3)
    return required, optional


def expected_openpose_state_dict(variables):
    """Torch key -> shape table for a released OpenPose ``.pth`` in its
    published flat layer-name form (``conv1_1.weight`` ...); mapping
    mirrors ``models.openpose.convert_openpose_torch``."""
    required: dict[str, tuple] = {}
    for path, val in _flat(variables).items():
        layer, leaf = path[-3], path[-1]
        shape = tuple(val.shape)
        if leaf == "kernel":
            required[f"{layer}.weight"] = (
                shape[3], shape[2], shape[0], shape[1])
        else:
            required[f"{layer}.bias"] = shape
    return required, {}


def expected_lbam_state_dict(variables):
    """Torch key -> shape table for ``LBAM_NoBN_ParisStreetView.pth``
    (the generator's own keys — the reference loads it strict,
    /root/reference/models/inpaint.py:10); mapping mirrors
    ``models.inpaint.convert_lbam_torch``."""
    required: dict[str, tuple] = {}
    for path, val in _flat(variables).items():
        mods = path[1:]
        name = mods[0]
        shape = tuple(val.shape)
        if name.startswith("ec"):
            sub = mods[1]
            if sub == "gauss":
                required[f"{name}.conv.activationFuncG_A.{mods[-1]}"] = ()
            else:
                required[f"{name}.conv.{sub}.weight"] = (
                    shape[3], shape[2], shape[0], shape[1])
        elif name.startswith("reverseConv"):
            sub = mods[1]
            if sub == "gauss":
                required[f"{name}.activationFuncG_A.{mods[-1]}"] = ()
            else:
                required[f"{name}.reverseMaskConv.weight"] = (
                    shape[3], shape[2], shape[0], shape[1])
        elif name == "dc7":
            # ConvTranspose2d stores (in, out, kH, kW); Flax kkio
            required["dc7.weight"] = (shape[2], shape[3], shape[0], shape[1])
        elif name.startswith("dc"):
            required[f"{name}.conv.weight"] = (
                shape[2], shape[3], shape[0], shape[1])
        else:
            raise KeyError(path)
    return required, {}


def _shape_of(v):
    if hasattr(v, "detach"):
        return tuple(v.detach().cpu().shape)
    return tuple(np.asarray(v).shape)


def normalize_openpose_keys(state_dict):
    """Strip the module-path prefix down to ``<layer>.<leaf>`` (the
    published files are already flat; re-prefixed saves like
    ``model0.conv1_1.weight`` normalize to the same form — the identical
    tolerance the converter has)."""
    return {".".join(k.split(".")[-2:]): v for k, v in state_dict.items()}


def check_state_dict(state_dict, required, optional=None):
    """Compare a torch state dict's keys+shapes against a manifest.

    Returns a report dict: ``ok`` (bool — no missing keys, no shape
    mismatches), ``missing`` (key -> expected shape), ``mismatched``
    (key -> (expected, actual)), ``extra`` (informational: present but
    not in the manifest — the reference itself tolerates these via
    ``strict=False`` loads).
    """
    optional = optional or {}
    shapes = {k: _shape_of(v) for k, v in state_dict.items()}
    missing = {k: s for k, s in required.items() if k not in shapes}
    mismatched = {}
    for k, exp in required.items():
        if k in shapes and shapes[k] != tuple(exp):
            mismatched[k] = (tuple(exp), shapes[k])
    for k, exp in optional.items():
        if k in shapes and tuple(exp) and shapes[k] != tuple(exp):
            mismatched[k] = (tuple(exp), shapes[k])
    known = set(required) | set(optional)
    extra = sorted(k for k in shapes if k not in known)
    return {
        "ok": not missing and not mismatched,
        "missing": missing,
        "mismatched": mismatched,
        "extra": extra,
        "n_required": len(required),
        "n_present": len(required) - len(missing),
    }


def describe_report(report, what):
    """One readable multi-line summary of a failed (or passed) check."""
    lines = [
        f"{what}: {report['n_present']}/{report['n_required']} required "
        f"tensors present"
    ]
    for k, s in list(report["missing"].items())[:10]:
        lines.append(f"  missing  {k}  expected {s}")
    if len(report["missing"]) > 10:
        lines.append(f"  ... and {len(report['missing']) - 10} more missing")
    for k, (e, a) in list(report["mismatched"].items())[:10]:
        lines.append(f"  shape    {k}  expected {e}, got {a}")
    if len(report["mismatched"]) > 10:
        lines.append(
            f"  ... and {len(report['mismatched']) - 10} more mismatched")
    if report["extra"]:
        lines.append(
            f"  note: {len(report['extra'])} extra keys ignored "
            f"(e.g. {report['extra'][:3]})")
    return "\n".join(lines)


def verify_or_raise(state_dict, required, optional, what):
    """Raise ``ValueError`` with the full report if the check fails."""
    report = check_state_dict(state_dict, required, optional)
    if not report["ok"]:
        raise ValueError(
            "checkpoint structure does not match the published "
            + describe_report(report, what)
        )
    return report
