"""Distance-volume tests: accuracy vs exact sweep, gradients, fit parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.ops import sdf
from bodyfitting_tpu.ops.nearest import nearest_point_on_mesh


@pytest.fixture(scope="module")
def sphere_mesh(rng=None):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(80, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    return (
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(hull.simplices.astype(np.int32)),
    )


@pytest.fixture(scope="module")
def sphere_vol(sphere_mesh):
    """One shared 48^3 volume: the build dominates these tests' wall
    (every test used to build its own 64^3 volume; sharing one cut the
    file from ~17 min to a fraction)."""
    verts, faces = sphere_mesh
    return sdf.build_distance_volume(verts, faces, resolution=48)


def test_distance_volume_matches_exact(sphere_mesh, sphere_vol, rng):
    verts, faces = sphere_mesh
    vol = sphere_vol
    q = jnp.asarray(
        rng.uniform(-1.1, 1.1, size=(200, 3)).astype(np.float32)
    )
    approx = np.asarray(sdf.query_distance(vol, q))
    _, _, d2 = nearest_point_on_mesh(q, verts, faces)
    exact = np.sqrt(np.asarray(d2))
    # accuracy bounded by the cell size (~2.6/47 ~ 0.055)
    assert np.abs(approx - exact).max() < 0.08
    assert np.abs(approx - exact).mean() < 0.02


def test_separable_query_matches_gather_query(sphere_vol, rng):
    """The MXU separable trilinear query must be f32-exact against the
    8-tap gather oracle, values and point-gradients, including points
    outside the volume (clipped identically)."""
    vol = sphere_vol
    pts = jnp.asarray(rng.uniform(-2.0, 2.0, size=(500, 3)), jnp.float32)
    a = np.asarray(sdf._query_distance_gather(vol, pts))
    b = np.asarray(sdf.query_distance(vol, pts))
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-6)
    ga = jax.grad(lambda p: jnp.sum(sdf._query_distance_gather(vol, p)))(pts)
    gb = jax.grad(lambda p: jnp.sum(sdf.query_distance(vol, p)))(pts)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=0, atol=5e-5
    )
    # nearest-face lookup: separable form must be EXACT vs direct indexing
    fid = np.asarray(sdf.query_nearest_face(vol, pts))
    R = vol.resolution
    g = np.asarray((pts - vol.origin) / vol.spacing)
    i = np.clip(np.round(g), 0, R - 1).astype(np.int32)
    expect = np.asarray(vol.face_idx)[i[:, 0], i[:, 1], i[:, 2]]
    np.testing.assert_array_equal(fid, expect)


def test_distance_gradient_points_to_surface(sphere_vol):
    vol = sphere_vol
    # outside the unit sphere, the distance gradient points radially out
    # points must lie inside the padded volume (extends to ~1.3)
    q = jnp.asarray([[0.0, 0.0, 1.25], [1.2, 0.0, 0.0]])
    g = jax.jacobian(lambda p: sdf.query_distance(vol, p).sum())(q)
    g = np.array(g)
    g = g / np.linalg.norm(g, axis=1, keepdims=True)
    # faceted hull: the true nearest direction is not exactly radial
    assert g[0, 2] > 0.9 and g[1, 0] > 0.9
    np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=1e-3)


def test_nearest_face_volume(sphere_mesh, sphere_vol):
    verts, faces = sphere_mesh
    vol = sphere_vol
    q = jnp.asarray([[0.0, 0.0, 1.2]])
    fid = int(sdf.query_nearest_face(vol, q)[0])
    # the reported face should be near the +z pole
    centroid = np.asarray(verts)[np.asarray(faces)[fid]].mean(0)
    assert centroid[2] > 0.7


def test_sdf_fit_matches_exact_fit():
    """SMPL+D fit with the SDF path lands on (almost) the same surface."""
    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.models import body_model as bm

    model = bm.spin_joint_mapper_for_smpl(
        bm.synthetic_model("smpl", num_verts=96, seed=5)
    )
    rng = np.random.default_rng(0)
    scan_out = bm.forward(model, bm.BodyParams.zeros(model))
    scan_verts = scan_out.vertices * 0.3
    height = float(scan_verts[:, 1].max() - scan_verts[:, 1].min())

    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    from bodyfitting_tpu.ops.camera import perspective_projection

    joints = scan_out.joints * 0.3
    uv = perspective_projection(
        joints[:25][None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
    )[0]
    kps = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], 1)

    base = smplify.Observations(
        w2cs=w2c[None], Ks=K[None], keypoints=kps[None],
        view_mask=jnp.ones(1), constant_scale=jnp.asarray(0.3),
        scan_verts=scan_verts, scan_faces=model.faces,
        scan_height=jnp.asarray(height),
    )
    vol = sdf.build_distance_volume(scan_verts, model.faces, resolution=48)
    obs_sdf = dataclasses.replace(base, scan_volume=vol)

    prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731
    init = smplify.FitParams.init(model)
    cfg_exact = smplify.FitConfig(
        num_iters=45, imsize=256.0, use_mesh=True, displacement=True,
        mesh_loss_impl="exact",
    )
    cfg_sdf = smplify.FitConfig(
        num_iters=45, imsize=256.0, use_mesh=True, displacement=True,
        mesh_loss_impl="sdf",
    )
    _, res_e, _ = jax.jit(
        lambda o, i: smplify.fit(model, cfg_exact, o, i, prior)
    )(base, init)
    _, res_s, _ = jax.jit(
        lambda o, i: smplify.fit(model, cfg_sdf, o, i, prior)
    )(obs_sdf, init)

    # both runs converge to nearby surfaces
    dv = np.abs(
        np.asarray(res_e["vertices"]) - np.asarray(res_s["vertices"])
    )
    assert dv.mean() < 0.02 * height
    assert "displacement" in res_s
    assert np.isfinite(np.asarray(res_s["displacement"])).all()


def test_outside_volume_gradient_points_inward(sphere_vol):
    """Past the padded grid the clip used to zero the gradient along the
    clipped axis; the out-of-volume residual restores the inward pull and
    keeps the value growing with distance."""
    vol = sphere_vol
    far = jnp.asarray([[0.0, 0.0, 3.0], [-4.0, 0.0, 0.0]])
    near = jnp.asarray([[0.0, 0.0, 1.29], [-1.29, 0.0, 0.0]])
    d_far = np.asarray(sdf.query_distance(vol, far))
    d_near = np.asarray(sdf.query_distance(vol, near))
    assert (d_far > d_near + 1.0).all()      # value keeps growing
    g = np.asarray(
        jax.jacobian(lambda p: sdf.query_distance(vol, p).sum())(far)
    )
    assert g[0, 2] > 0.9                     # +z point pulled toward -z
    assert g[1, 0] < -0.9                    # -x point pulled toward +x
    # far outside, the residual dominates: unit-norm radial gradient
    np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=0.1)


def test_fit_resumable_runs_displacement_stage(tmp_path):
    """fit_resumable with displacement=True must produce the same output
    schema and (same-machine, same-chunking-math) the same trajectory as
    smplify.fit — previously the displacement stage was silently skipped."""
    from bodyfitting_tpu.fitting import checkpointing as ck
    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.models import body_model as bm

    # sphere mesh: the displacement losses differentiate unit normals over
    # the body mesh, and a random triangulation's sliver faces amplify
    # ulp-level reassociation noise between the chunked and whole-scan XLA
    # programs beyond any usable tolerance (see losses/mesh and PARITY.md)
    model = bm.spin_joint_mapper_for_smpl(
        bm.synthetic_model("smpl", num_verts=96, seed=5, mesh="sphere")
    )
    scan_out = bm.forward(model, bm.BodyParams.zeros(model))
    scan_verts = scan_out.vertices * 0.3
    height = float(scan_verts[:, 1].max() - scan_verts[:, 1].min())
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    from bodyfitting_tpu.ops.camera import perspective_projection

    uv = perspective_projection(
        (scan_out.joints * 0.3)[:25][None], w2c[None, :3, :3],
        w2c[None, :3, 3], K[None],
    )[0]
    kps = jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], 1)
    vol = sdf.build_distance_volume(scan_verts, model.faces, resolution=32)
    obs = smplify.Observations(
        w2cs=w2c[None], Ks=K[None], keypoints=kps[None],
        view_mask=jnp.ones(1), constant_scale=jnp.asarray(0.3),
        scan_verts=scan_verts, scan_faces=model.faces,
        scan_height=jnp.asarray(height), scan_volume=vol,
    )
    cfg = smplify.FitConfig(
        num_iters=20, imsize=256.0, use_mesh=True, displacement=True,
        mesh_loss_impl="sdf",
    )
    prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731
    init = smplify.FitParams.init(model)

    _, res_plain, losses_plain = jax.jit(
        lambda o, i: smplify.fit(model, cfg, o, i, prior)
    )(obs, init)
    _, res_ck, losses_ck = ck.fit_resumable(
        model, cfg, obs, init, prior,
        checkpoint_path=str(tmp_path / "d.ckpt"), chunk_size=7,
    )
    assert "displacement" in res_ck
    assert losses_ck.shape == losses_plain.shape == (40,)
    # chunked and whole-scan are different XLA programs: same math, ulp-level
    # reassociation noise — and the displacement stage is chaotic in f32
    # (discrete nearest-face switches; see PARITY.md), so the *fields* are
    # compared at the outcome level: both deformed surfaces must land on
    # the scan equally well.  The loss trajectory is pinned loosely, the
    # schema exactly.
    np.testing.assert_allclose(
        np.asarray(losses_ck), np.asarray(losses_plain), rtol=8e-2,
    )
    from bodyfitting_tpu.losses.mesh import nearest_points

    def scan_residual(res):
        deformed = jnp.asarray(res["vertices"]) + jnp.asarray(
            res["displacement"]
        )
        closest, _ = nearest_points(deformed, scan_verts, model.faces)
        return float(
            jnp.linalg.norm(deformed - closest, axis=-1).mean()
        )

    r_plain = scan_residual(res_plain)
    r_ck = scan_residual(res_ck)
    # 20 iters is far from converged, so the residuals themselves are
    # noisy — both must simply be small vs the ~0.5-unit body and agree
    # to the same order
    assert abs(r_plain - r_ck) <= 0.25 * max(r_plain, 1e-6) + 1e-3, (
        r_plain, r_ck,
    )
    assert max(r_plain, r_ck) < 0.05
