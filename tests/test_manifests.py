"""Checkpoint structural manifests (tools/manifests.py).

Two properties per checkpoint family:

* **sufficiency** — a state dict built from nothing but the manifest
  (random tensors at the manifest shapes) converts successfully, so the
  manifest lists everything the converter reads;
* **fidelity** — the state dict of the independently-written torch model
  that reproduces the published architecture (the same ones the
  differential converter tests use) passes the manifest check, so the
  manifest matches the real files' structure.

Plus: converters refuse broken checkpoints with a clear report instead
of a bare KeyError.
"""

import numpy as np
import pytest

import jax

from bodyfitting_tpu.tools import manifests as mf

torch = pytest.importorskip("torch")


def _random_state_dict(required, optional=None, include_optional=True):
    rng = np.random.default_rng(0)
    sd = {}
    for k, s in required.items():
        sd[k] = torch.tensor(
            rng.normal(scale=0.05, size=s).astype(np.float32))
    if include_optional and optional:
        for k, s in optional.items():
            sd[k] = torch.tensor(np.zeros(s, np.float32))
    return sd


# --- HMR -------------------------------------------------------------------


def _hmr_setup(layers=(2, 2, 2, 2)):
    from bodyfitting_tpu.models import hmr as hmr_mod

    model, variables = hmr_mod.init_hmr(jax.random.PRNGKey(0), layers=layers)
    required, optional = mf.expected_hmr_state_dict(variables)
    return hmr_mod, variables, required, optional


def test_hmr_manifest_sufficient_for_conversion():
    hmr_mod, variables, required, optional = _hmr_setup()
    sd = _random_state_dict(required, optional)
    converted = hmr_mod.convert_torch_checkpoint(sd, variables)
    assert jax.tree.structure(converted) == jax.tree.structure(variables)


def test_hmr_manifest_matches_published_architecture():
    from tests.test_hmr import TorchHMR

    _, _, required, optional = _hmr_setup(layers=(2, 2, 2, 2))
    sd = TorchHMR(layers=(2, 2, 2, 2)).state_dict()
    report = mf.check_state_dict(sd, required, optional)
    assert report["ok"], report
    # torch auto-registers num_batches_tracked; everything it saves is
    # either required or declared optional (nothing unexplained)
    unexplained = [k for k in report["extra"]]
    assert unexplained == [], unexplained


def test_hmr_converter_refuses_broken_checkpoints():
    hmr_mod, variables, required, optional = _hmr_setup()
    sd = _random_state_dict(required, optional)
    del sd["fc1.weight"]
    with pytest.raises(ValueError, match="missing.*fc1.weight"):
        hmr_mod.convert_torch_checkpoint(sd, variables)

    sd = _random_state_dict(required, optional)
    sd["decpose.weight"] = torch.zeros(7, 7)
    with pytest.raises(ValueError, match="shape.*decpose.weight"):
        hmr_mod.convert_torch_checkpoint(sd, variables)


# --- OpenPose ---------------------------------------------------------------


@pytest.mark.parametrize("which", ["body", "hand", "face"])
def test_openpose_manifest_sufficient(which):
    from bodyfitting_tpu.models import openpose as op

    inits = {"body": op.init_body_net, "hand": op.init_hand_net,
             "face": op.init_face_net}
    model, variables = inits[which]()
    required, optional = mf.expected_openpose_state_dict(variables)
    # published flat form
    sd = _random_state_dict(required)
    converted = op.convert_openpose_torch(sd, variables)
    assert jax.tree.structure(converted) == jax.tree.structure(variables)
    # re-prefixed save form ("model0.conv1_1.weight") normalizes too
    sd_prefixed = {f"model0.{k}": v for k, v in sd.items()}
    report = mf.check_state_dict(
        mf.normalize_openpose_keys(sd_prefixed), required, optional)
    assert report["ok"], report


def test_openpose_converter_refuses_broken_checkpoint():
    from bodyfitting_tpu.models import openpose as op

    model, variables = op.init_hand_net()
    required, _ = mf.expected_openpose_state_dict(variables)
    sd = _random_state_dict(required)
    del sd["conv1_1.weight"]
    with pytest.raises(ValueError, match="missing.*conv1_1.weight"):
        op.convert_openpose_torch(sd, variables)


# --- LBAM -------------------------------------------------------------------


def test_lbam_manifest_sufficient_and_matches_published():
    from bodyfitting_tpu.models import inpaint as lbam
    from tests.test_inpaint import TLBAM

    inp = lbam.Inpainter()
    required, optional = mf.expected_lbam_state_dict(inp.variables)
    sd = _random_state_dict(required)
    converted = lbam.convert_lbam_torch(sd, inp.variables)
    assert jax.tree.structure(converted) == jax.tree.structure(
        inp.variables)

    report = mf.check_state_dict(TLBAM().state_dict(), required, optional)
    assert report["ok"], report
    assert report["extra"] == [], report["extra"]


def test_lbam_converter_refuses_broken_checkpoint():
    from bodyfitting_tpu.models import inpaint as lbam

    inp = lbam.Inpainter()
    required, _ = mf.expected_lbam_state_dict(inp.variables)
    sd = _random_state_dict(required)
    sd["dc7.weight"] = torch.zeros(1, 2, 3, 4)
    with pytest.raises(ValueError, match="shape.*dc7.weight"):
        lbam.convert_lbam_torch(sd, inp.variables)


# --- validate_assets CLI integration ----------------------------------------


def test_validate_assets_lbam_roundtrip(tmp_path, capsys):
    from bodyfitting_tpu.models import inpaint as lbam
    from bodyfitting_tpu.tools import validate_assets as va

    inp = lbam.Inpainter()
    required, _ = mf.expected_lbam_state_dict(inp.variables)
    good = tmp_path / "lbam.pth"
    torch.save(_random_state_dict(required), str(good))
    rc = va.main(["--lbam", str(good)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "0 failure(s)" in out

    sd = _random_state_dict(required)
    del sd["ec1.conv.conv.weight"]
    bad = tmp_path / "lbam_bad.pth"
    torch.save(sd, str(bad))
    rc = va.main(["--lbam", str(bad)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out
