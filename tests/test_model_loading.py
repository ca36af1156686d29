"""Asset-loader tests against schema-exact synthetic SMPL/SMPL-X files.

Real SMPL assets are licensed; these fixtures reproduce the exact on-disk
schemas (SMPL-X ``.npz`` with 400-dim shapedirs and dynamic landmark
tables; legacy SMPL ``.pkl`` with chumpy-wrapped arrays, scipy-sparse
J_regressor and uint32 kintree) so the loaders' real code paths run.
"""

import dataclasses
import pickle
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from bodyfitting_tpu.models import body_model as bm


V_X, J_X = 10475, 55
V_S, J_S = 6890, 24


def _smplx_parents():
    body = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
            16, 17, 18, 19]
    head = [15, 15, 15]
    lhand = [20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38]
    rhand = [21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53]
    return body + head + lhand + rhand


@pytest.fixture(scope="module")
def smplx_npz(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("assets") / "SMPLX_NEUTRAL.npz"
    parents = np.asarray(_smplx_parents(), np.int64)
    kintree = np.stack([parents, np.arange(J_X)], 0).astype(np.uint32)
    kintree[0, 0] = np.iinfo(np.uint32).max   # 2^32-1 in real assets
    F = 2000
    np.savez(
        str(path),
        v_template=rng.normal(scale=0.3, size=(V_X, 3)),
        shapedirs=rng.normal(scale=0.01, size=(V_X, 3, 400)),
        posedirs=rng.normal(scale=1e-3, size=(V_X, 3, (J_X - 1) * 9)),
        J_regressor=rng.random((J_X, V_X)) / V_X,
        weights=rng.dirichlet(np.ones(J_X), size=V_X),
        kintree_table=kintree,
        f=rng.integers(0, V_X, size=(F, 3)).astype(np.uint32),
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
    return str(path)


def test_load_smplx_npz(smplx_npz):
    model = bm.load_model(smplx_npz)
    assert model.model_type == "smplx"
    assert model.num_verts == V_X and model.num_joints == J_X
    assert model.parents[0] == -1
    assert model.parents[22] == 15       # jaw under head
    assert model.shapedirs.shape == (10, 3 * V_X)
    assert model.expr_dirs.shape == (10, 3 * V_X)
    assert model.use_face_contour

    out = bm.forward(model, bm.BodyParams.zeros(model))
    assert out.joints.shape == (135, 3)
    assert np.isfinite(np.asarray(out.vertices)).all()

    # expression dirs really are shapedirs[..., 300:310]
    d = dict(np.load(smplx_npz))
    want = d["shapedirs"][..., 300:310].reshape(3 * V_X * 0 + V_X * 3, 10).T
    np.testing.assert_allclose(
        np.asarray(model.expr_dirs), want.astype(np.float32), atol=1e-6
    )
    # expression moves the face-region vertices
    import dataclasses

    p = dataclasses.replace(
        bm.BodyParams.zeros(model), expression=jnp.ones(10)
    )
    out2 = bm.forward(model, p)
    assert np.abs(np.asarray(out2.vertices - out.vertices)).max() > 1e-4


@pytest.fixture(scope="module")
def smpl_pkl(tmp_path_factory):
    """Legacy SMPL .pkl: chumpy arrays + scipy sparse regressor."""
    rng = np.random.default_rng(1)

    # forge a 'chumpy' module so pickled objects carry the chumpy path
    chmod = types.ModuleType("chumpy")
    chmod_ch = types.ModuleType("chumpy.ch")

    class Ch:
        def __init__(self, x):
            self.x = np.asarray(x)

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    chmod_ch.Ch = Ch
    chmod.ch = chmod_ch
    chmod.Ch = Ch
    sys.modules["chumpy"] = chmod
    sys.modules["chumpy.ch"] = chmod_ch
    try:
        from scipy import sparse

        data = {
            "v_template": Ch(rng.normal(scale=0.3, size=(V_S, 3))),
            "shapedirs": Ch(rng.normal(scale=0.01, size=(V_S, 3, 10))),
            "posedirs": rng.normal(scale=1e-3, size=(V_S, 3, (J_S - 1) * 9)),
            "J_regressor": sparse.csr_matrix(
                rng.random((J_S, V_S)) / V_S
            ),
            "weights": rng.dirichlet(np.ones(J_S), size=V_S),
            "kintree_table": np.stack([
                np.asarray([-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                            12, 13, 14, 16, 17, 18, 19, 20, 21], np.int64),
                np.arange(J_S),
            ], 0).astype(np.uint32),
            "f": rng.integers(0, V_S, size=(13776, 3)).astype(np.uint32),
        }
        path = tmp_path_factory.mktemp("assets") / "SMPL_NEUTRAL.pkl"
        with open(path, "wb") as f:
            pickle.dump(data, f)
    finally:
        sys.modules.pop("chumpy", None)
        sys.modules.pop("chumpy.ch", None)
    return str(path)


def test_load_smpl_pkl_with_chumpy_and_sparse(smpl_pkl):
    model = bm.load_model(smpl_pkl)
    assert model.model_type == "smpl"
    assert model.num_verts == V_S and model.num_joints == J_S
    assert model.parents == (-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                             12, 13, 14, 16, 17, 18, 19, 20, 21)
    model = bm.spin_joint_mapper_for_smpl(model)
    out = bm.forward(model, bm.BodyParams.zeros(model))
    assert out.joints.shape == (49, 3)
    np.testing.assert_allclose(
        np.asarray(out.vertices), np.asarray(model.v_template), atol=1e-5
    )


def test_golden_forward_from_npz_asset(smplx_npz):
    """Golden-value fixture: load the (byte-deterministic, seed-0) SMPL-X
    .npz through the real asset path — uint32 kintree with 2^32-1 root,
    400-dim shapedirs with the 300:310 expression slice, hand PCA, landmark
    tables — and pin the forward output at a fixed non-trivial pose.

    The literals below were captured once and independently cross-checked
    against the torch re-enactment of smplx semantics
    (fitting/torch_reference.py, agreement < 1e-7), so any silent change in
    asset parsing, layout, or forward math trips this test.
    """
    import dataclasses

    model = bm.load_model(smplx_npz)
    prng = np.random.default_rng(42)
    p = dataclasses.replace(
        bm.BodyParams.zeros(model),
        betas=jnp.asarray(prng.normal(scale=0.8, size=(10,)), jnp.float32),
        global_orient=jnp.asarray([0.4, -0.7, 0.25], jnp.float32),
        body_pose=jnp.asarray(
            prng.normal(scale=0.25, size=(63,)), jnp.float32),
        expression=jnp.asarray(
            prng.normal(scale=0.6, size=(10,)), jnp.float32),
        jaw_pose=jnp.asarray([0.2, -0.05, 0.1], jnp.float32),
        left_hand_pose=jnp.asarray(prng.normal(size=(6,)), jnp.float32),
        right_hand_pose=jnp.asarray(prng.normal(size=(6,)), jnp.float32),
    )
    out = bm.forward(model, p)

    golden_verts = np.array([
        [-0.00633255, -0.07434872, 0.03233631],
        [0.04585138, 0.09974814, 0.02586859],
        [-0.09515287, 0.10192651, 0.16676655],
        [-0.17152068, 0.0045441, 0.05882237],
        [-0.07900219, -0.10903733, -0.20781614],
    ], np.float32)
    golden_joints = np.array([
        [-0.03399682, -0.1361996, -0.07718547],
        [-0.00018191, 0.00065142, 0.00025738],
        [-0.0017539, -0.00069212, 0.00027727],
        [0.00104491, -0.00226201, -0.00297964],
        [-0.06173583, -0.05067138, -0.02211942],
    ], np.float32)
    np.testing.assert_allclose(
        np.asarray(out.vertices)[[0, 123, 456, 789, 999]], golden_verts,
        atol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.joints)[[0, 12, 25, 55, 134]], golden_joints,
        atol=5e-6,
    )


def test_load_legacy_smplx_expression_slice(tmp_path):
    """Legacy SMPL-X assets store 20 shapedirs (10 shape + 10 expression,
    smplx body_models.py layout); the expression slice must load, not be
    silently dropped (which left the fitter optimizing a no-op)."""
    rng = np.random.default_rng(3)
    path = tmp_path / "SMPLX_LEGACY.npz"
    parents = np.asarray(_smplx_parents(), np.int64)
    kintree = np.stack([parents, np.arange(J_X)], 0).astype(np.uint32)
    kintree[0, 0] = np.iinfo(np.uint32).max
    F = 2000
    np.savez(
        str(path),
        v_template=rng.normal(scale=0.3, size=(V_X, 3)),
        shapedirs=rng.normal(scale=0.01, size=(V_X, 3, 20)),
        posedirs=rng.normal(scale=1e-3, size=(V_X, 3, (J_X - 1) * 9)),
        J_regressor=rng.random((J_X, V_X)) / V_X,
        weights=rng.dirichlet(np.ones(J_X), size=V_X),
        kintree_table=kintree,
        f=rng.integers(0, V_X, size=(F, 3)).astype(np.uint32),
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
    model = bm.load_model(str(path))
    assert model.model_type == "smplx"
    assert model.expr_dirs is not None
    d = dict(np.load(str(path)))
    want = d["shapedirs"][..., 10:20].reshape(V_X * 3, 10).T
    np.testing.assert_allclose(
        np.asarray(model.expr_dirs), want, rtol=1e-6
    )
    # expression coefficients really move vertices
    p0 = bm.BodyParams.zeros(model)
    p1 = dataclasses.replace(
        p0, expression=jnp.full((model.num_expressions,), 0.5)
    )
    v0 = bm.forward(model, p0).vertices
    v1 = bm.forward(model, p1).vertices
    assert float(jnp.abs(v1 - v0).max()) > 1e-4


def test_hand_use_pca_false_full_axis_angle():
    """hand_use_pca=False treats hand poses as full 45-dim axis-angle
    (smplx use_pca=False): equivalent to a PCA model with an identity
    basis, and BodyParams.zeros allocates 45 dims."""
    model = bm.synthetic_model("smplx", num_verts=128, seed=2)
    eye = jnp.eye(45, dtype=model.hand_components_l.dtype)
    model_id = dataclasses.replace(
        model, hand_components_l=eye, hand_components_r=eye,
        num_hand_pca=45,
    )
    model_aa = dataclasses.replace(model, hand_use_pca=False)

    p = bm.BodyParams.zeros(model_aa)
    assert p.left_hand_pose.shape == (45,)
    rng = np.random.default_rng(0)
    hand = jnp.asarray(rng.normal(scale=0.2, size=45), jnp.float32)
    p = dataclasses.replace(p, left_hand_pose=hand, right_hand_pose=-hand)

    va = bm.forward(model_aa, p).vertices
    vb = bm.forward(model_id, p).vertices
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)
