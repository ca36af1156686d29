"""The asset-validation tool (bodyfitting_tpu.tools.validate_assets)
passes on structurally-valid synthetic assets and catches broken ones."""

import pickle

import numpy as np
import pytest

from tests.test_model_loading import _smplx_parents

J_X, V_X = 55, 10475


def _write_smplx_npz(path, *, break_weights=False):
    rng = np.random.default_rng(0)
    parents = np.asarray(_smplx_parents(), np.int64)
    kintree = np.stack([parents, np.arange(J_X)], 0).astype(np.uint32)
    kintree[0, 0] = np.iinfo(np.uint32).max
    F = 2000
    fa = rng.integers(0, V_X, size=F)
    fb = (fa + 1 + rng.integers(0, V_X - 1, size=F)) % V_X
    fc = (fa + 2 + rng.integers(0, V_X - 2, size=F)) % V_X
    fc = np.where(fc == fb, (fc + 1) % V_X, fc)
    fc = np.where(fc == fa, (fc + 1) % V_X, fc)
    fc = np.where(fc == fb, (fc + 1) % V_X, fc)
    weights = rng.dirichlet(np.ones(J_X), size=V_X)
    if break_weights:
        weights = weights * 1.5
    np.savez(
        str(path),
        v_template=rng.normal(scale=0.3, size=(V_X, 3)),
        shapedirs=rng.normal(scale=0.01, size=(V_X, 3, 400)),
        posedirs=rng.normal(scale=1e-3, size=(V_X, 3, (J_X - 1) * 9)),
        J_regressor=rng.dirichlet(np.ones(V_X) * 0.05, size=J_X),
        weights=weights,
        kintree_table=kintree,
        f=np.stack([fa, fb, fc], 1).astype(np.uint32),
        hands_componentsl=rng.normal(size=(45, 45)),
        hands_componentsr=rng.normal(size=(45, 45)),
        hands_meanl=rng.normal(scale=0.05, size=45),
        hands_meanr=rng.normal(scale=0.05, size=45),
        lmk_faces_idx=rng.integers(0, F, size=51).astype(np.int64),
        lmk_bary_coords=rng.dirichlet(np.ones(3), size=51),
        dynamic_lmk_faces_idx=rng.integers(0, F, size=(79, 17)).astype(
            np.int64
        ),
        dynamic_lmk_bary_coords=rng.dirichlet(np.ones(3), size=(79, 17)),
    )


def _write_gmm(path, K=8, D=69):
    rng = np.random.default_rng(1)
    covs = []
    for _ in range(K):
        A = rng.normal(size=(D, D)) * 0.03
        covs.append(A @ A.T + np.eye(D) * 0.2)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "means": rng.normal(scale=0.2, size=(K, D)),
                "covars": np.stack(covs),
                "weights": rng.dirichlet(np.ones(K)),
            },
            f,
        )


def test_validate_assets_passes_on_good_assets(tmp_path, capsys):
    from bodyfitting_tpu.tools import validate_assets as va

    npz = tmp_path / "SMPLX_NEUTRAL.npz"
    gmm = tmp_path / "gmm_08.pkl"
    _write_smplx_npz(npz)
    _write_gmm(gmm)
    rc = va.main(["--model_path", str(npz), "--model_type", "smplx",
                  "--gmm", str(gmm)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "0 failure(s)" in out
    assert "PASS  zero-pose forward == v_template" in out


def test_validate_assets_catches_broken_weights(tmp_path, capsys):
    from bodyfitting_tpu.tools import validate_assets as va

    npz = tmp_path / "SMPLX_BROKEN.npz"
    _write_smplx_npz(npz, break_weights=True)
    rc = va.main(["--model_path", str(npz), "--model_type", "smplx"])
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "FAIL  lbs weight rows sum to 1" in out


def test_validate_assets_catches_wrong_gmm(tmp_path, capsys):
    from bodyfitting_tpu.tools import validate_assets as va

    gmm = tmp_path / "gmm_05.pkl"
    _write_gmm(gmm, K=5)
    rc = va.main(["--gmm", str(gmm)])
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "FAIL  8 mixture components" in out


def test_validate_assets_requires_an_asset():
    from bodyfitting_tpu.tools import validate_assets as va

    with pytest.raises(SystemExit):
        va.main([])
