"""SMPL / SMPL-X body models as pure, jit-compilable JAX functions.

The reference outsources the body model to the ``smplx`` pip package
(/root/reference/smplify/smplify.py:80, /root/reference/models/smpl.py:56);
here the whole forward pass — shape/expression blendshapes, pose-corrective
blendshapes, joint regression, the rigid kinematic chain and linear blend
skinning — is a single pure function of a parameter pytree, so it can be
``jax.grad``-ed, ``vmap``-ed across frames and ``pjit``-ed across chips.

Design notes (TPU-first):
  * Every hot step is a large dense matmul that maps onto the MXU:
    blendshapes are ``[B,S] @ [S,3V]``, pose correctives ``[B,207] @
    [207,3V]``, skinning ``[V,J] @ [B,J,16]``.  No per-vertex Python.
  * The kinematic chain is an unrolled loop over at most 55 joints with
    static ``parents`` — XLA sees a fixed DAG of tiny matmuls.
  * All shapes are static; optional features (expressions, hands, face
    landmarks) are controlled by static metadata on the model pytree, so
    each configuration compiles once.

Data-layout contracts kept from the reference so its assets drop in:
  * SMPL ``.pkl`` / SMPL-X ``.npz`` asset schema (v_template, shapedirs,
    posedirs, J_regressor, weights, kintree_table, hands_components*,
    lmk_faces_idx, dynamic_lmk_faces_idx, ...).
  * The 21 vertex-picked auxiliary joints (smplx vertex_ids.py tables).
  * OpenPose-order joint mapping for SMPL-X (reference models/utils.py:32-94)
    and the 49-joint SPIN layout for SMPL (reference models/smpl.py:61-83,
    constants.py:71-89).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu import constants
from bodyfitting_tpu.ops.rotations import rodrigues

# ---------------------------------------------------------------------------
# Vertex ids of the 21 auxiliary "joints" picked directly from the mesh
# (nose/eyes/ears, toes/heels, fingertips).  Public data tables from the
# smplx package (vertex_ids.py); the order below matches smplx's
# VertexJointSelector concatenation order: 5 face + 6 feet + 10 fingertips.
# ---------------------------------------------------------------------------
_VERTEX_IDS = {
    "smpl": dict(
        nose=332, reye=6260, leye=2800, rear=4071, lear=583,
        LBigToe=3216, LSmallToe=3226, LHeel=3387,
        RBigToe=6617, RSmallToe=6624, RHeel=6787,
        lthumb=2746, lindex=2319, lmiddle=2445, lring=2556, lpinky=2673,
        rthumb=6191, rindex=5782, rmiddle=5905, rring=6016, rpinky=6133,
    ),
    "smplx": dict(
        nose=9120, reye=9929, leye=9448, rear=616, lear=6,
        LBigToe=5770, LSmallToe=5780, LHeel=8846,
        RBigToe=8463, RSmallToe=8474, RHeel=8635,
        lthumb=5361, lindex=4933, lmiddle=5058, lring=5169, lpinky=5286,
        rthumb=8079, rindex=7669, rmiddle=7794, rring=7905, rpinky=8022,
    ),
}
_VERTEX_IDS["smplh"] = _VERTEX_IDS["smpl"]

_SELECTOR_ORDER = (
    "nose", "reye", "leye", "rear", "lear",
    "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
    "lthumb", "lindex", "lmiddle", "lring", "lpinky",
    "rthumb", "rindex", "rmiddle", "rring", "rpinky",
)


def selector_vertex_ids(model_type: str) -> np.ndarray:
    """The 21 vertex ids appended after the skeleton joints, in order."""
    table = _VERTEX_IDS[model_type]
    return np.array([table[k] for k in _SELECTOR_ORDER], dtype=np.int32)


def smpl_to_openpose(
    model_type: str = "smplx",
    use_hands: bool = True,
    use_face: bool = True,
    use_face_contour: bool = False,
    openpose_format: str = "coco25",
) -> np.ndarray:
    """Permutation mapping model joints into OpenPose keypoint order.

    Data contract reproduced from the reference (models/utils.py:32-141);
    these are published index tables tying the smplx joint layout to the
    OpenPose BODY_25 / hands / face keypoint order.
    """
    fmt = openpose_format.lower()
    if fmt == "coco19":
        if model_type == "smpl":
            return np.array(
                [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
                 25, 26, 27, 28], dtype=np.int32)
        if model_type == "smplh":
            body = [52, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
                    53, 54, 55, 56]
            mapping = [np.array(body, dtype=np.int32)]
            if use_hands:
                mapping += [
                    np.array([20, 34, 35, 36, 57, 22, 23, 24, 58, 25, 26,
                              27, 59, 31, 32, 33, 60, 28, 29, 30, 61],
                             dtype=np.int32),
                    np.array([21, 49, 50, 51, 62, 37, 38, 39, 63, 40, 41,
                              42, 64, 46, 47, 48, 65, 43, 44, 45, 66],
                             dtype=np.int32),
                ]
            return np.concatenate(mapping)
        if model_type == "smplx":
            body = [55, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
                    56, 57, 58, 59]
            mapping = [np.array(body, dtype=np.int32)]
            if use_hands:
                mapping += [
                    np.array([20, 37, 38, 39, 60, 25, 26, 27, 61, 28, 29,
                              30, 62, 34, 35, 36, 63, 31, 32, 33, 64],
                             dtype=np.int32),
                    np.array([21, 52, 53, 54, 65, 40, 41, 42, 66, 43, 44,
                              45, 67, 49, 50, 51, 68, 46, 47, 48, 69],
                             dtype=np.int32),
                ]
            if use_face:
                mapping += [np.arange(
                    70, 70 + 51 + 17 * use_face_contour, dtype=np.int32
                )]
            return np.concatenate(mapping)
        raise ValueError(f"unknown model type {model_type}")
    if fmt != "coco25":
        raise ValueError(f"unknown joint format {openpose_format}")
    if model_type == "smpl":
        return np.array(
            [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
             25, 26, 27, 28, 29, 30, 31, 32, 33, 34], dtype=np.int32)
    if model_type == "smplh":
        body = [52, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
                53, 54, 55, 56, 57, 58, 59, 60, 61, 62]
        mapping = [np.array(body, dtype=np.int32)]
        if use_hands:
            mapping += [
                np.array([20, 34, 35, 36, 63, 22, 23, 24, 64, 25, 26, 27,
                          65, 31, 32, 33, 66, 28, 29, 30, 67], dtype=np.int32),
                np.array([21, 49, 50, 51, 68, 37, 38, 39, 69, 40, 41, 42,
                          70, 46, 47, 48, 71, 43, 44, 45, 72], dtype=np.int32),
            ]
        return np.concatenate(mapping)
    if model_type == "smplx":
        body = [55, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
                56, 57, 58, 59, 60, 61, 62, 63, 64, 65]
        mapping = [np.array(body, dtype=np.int32)]
        if use_hands:
            mapping += [
                np.array([20, 37, 38, 39, 66, 25, 26, 27, 67, 28, 29, 30,
                          68, 34, 35, 36, 69, 31, 32, 33, 70], dtype=np.int32),
                np.array([21, 52, 53, 54, 71, 40, 41, 42, 72, 43, 44, 45,
                          73, 49, 50, 51, 74, 46, 47, 48, 75], dtype=np.int32),
            ]
        if use_face:
            mapping += [np.arange(76, 127 + 17 * use_face_contour,
                                  dtype=np.int32)]
        return np.concatenate(mapping)
    raise ValueError(f"unknown model type {model_type}")


# ---------------------------------------------------------------------------
# Model data pytree
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BodyModel:
    """Immutable body-model data, registered as a JAX pytree.

    Array fields are pytree leaves; configuration fields are static metadata
    so jitted functions specialise per configuration.
    """

    # --- core LBS data -----------------------------------------------------
    v_template: jax.Array          # [V, 3]
    shapedirs: jax.Array           # [S, 3V] shape blendshape basis (flattened)
    posedirs: jax.Array            # [(J-1)*9, 3V] pose-corrective basis
    J_regressor: jax.Array         # [J, V]
    lbs_weights: jax.Array         # [V, J]
    faces: jax.Array               # [F, 3] int32
    # --- optional feature data (zeros-shaped placeholders when unused) -----
    expr_dirs: Optional[jax.Array]          # [E, 3V] expression basis
    hand_components_l: Optional[jax.Array]  # [C, 45] PCA basis, left hand
    hand_components_r: Optional[jax.Array]  # [C, 45]
    hand_mean_l: Optional[jax.Array]        # [45]
    hand_mean_r: Optional[jax.Array]        # [45]
    lmk_faces_idx: Optional[jax.Array]      # [51] static face landmark tris
    lmk_bary_coords: Optional[jax.Array]    # [51, 3]
    dyn_lmk_faces_idx: Optional[jax.Array]  # [79, 17] per-yaw-bucket contour
    dyn_lmk_bary_coords: Optional[jax.Array]  # [79, 17, 3]
    extra_joint_regressor: Optional[jax.Array]  # [9, V] SPIN extra joints
    selector_ids: Optional[jax.Array]       # [21] vertex-picked joints
    joint_mapper: Optional[jax.Array]       # [M] output permutation
    kid_shape_dir: Optional[jax.Array]      # [3V] SMIL-template blend dir
    # Folded joint regression (set by reduce_for_joints): rest joints as a
    # direct linear function of betas/expression, J_regressor pre-applied.
    # When present, lbs() skips the [J, V] regression over v_shaped.
    J_template: Optional[jax.Array] = None      # [J, 3]
    J_shapedirs: Optional[jax.Array] = None     # [S, J*3]
    J_exprdirs: Optional[jax.Array] = None      # [E, J*3]
    J_kid_dir: Optional[jax.Array] = None       # [J*3]
    # --- static metadata ---------------------------------------------------
    model_type: str = "smpl"       # 'smpl' | 'smplh' | 'smplx'
    parents: tuple = ()            # [J] kinematic tree, parents[0] == -1
    neck_chain: tuple = ()         # joint chain used for contour landmarks
    num_betas: int = 10
    num_expressions: int = 0
    num_hand_pca: int = 6
    hand_use_pca: bool = True      # False: hand poses are full [45] aa
    flat_hand_mean: bool = False
    use_face_contour: bool = False

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_body_joints(self) -> int:
        """Joints driven by ``body_pose`` (23 for SMPL, 21 for SMPL-X)."""
        return 23 if self.model_type == "smpl" else 21


jax.tree_util.register_dataclass(
    BodyModel,
    data_fields=[
        "v_template", "shapedirs", "posedirs", "J_regressor", "lbs_weights",
        "faces", "expr_dirs", "hand_components_l", "hand_components_r",
        "hand_mean_l", "hand_mean_r", "lmk_faces_idx", "lmk_bary_coords",
        "dyn_lmk_faces_idx", "dyn_lmk_bary_coords", "extra_joint_regressor",
        "selector_ids", "joint_mapper", "kid_shape_dir",
        "J_template", "J_shapedirs", "J_exprdirs", "J_kid_dir",
    ],
    meta_fields=[
        "model_type", "parents", "neck_chain", "num_betas",
        "num_expressions", "num_hand_pca", "hand_use_pca",
        "flat_hand_mean", "use_face_contour",
    ],
)


@dataclasses.dataclass(frozen=True)
class BodyParams:
    """Optimisable body parameters; a single frame (add leading axes freely).

    Matches the parameter blocks the reference optimises
    (smplify/smplify.py:103-128): axis-angle poses, linear shape/expression
    coefficients, PCA hand poses.
    """

    betas: jax.Array               # [S]
    global_orient: jax.Array       # [3]
    body_pose: jax.Array           # [3 * num_body_joints]
    expression: jax.Array          # [E] (empty for SMPL)
    jaw_pose: jax.Array            # [3]
    leye_pose: jax.Array           # [3]
    reye_pose: jax.Array           # [3]
    left_hand_pose: jax.Array      # [C] PCA coeffs; [45] aa if not hand_use_pca
    right_hand_pose: jax.Array     # same layout as left_hand_pose

    @staticmethod
    def zeros(model: BodyModel, dtype=jnp.float32) -> "BodyParams":
        nb = model.num_body_joints
        c = model.num_hand_pca if model.hand_use_pca else 45
        return BodyParams(
            betas=jnp.zeros((model.num_betas,), dtype),
            global_orient=jnp.zeros((3,), dtype),
            body_pose=jnp.zeros((3 * nb,), dtype),
            expression=jnp.zeros((model.num_expressions,), dtype),
            jaw_pose=jnp.zeros((3,), dtype),
            leye_pose=jnp.zeros((3,), dtype),
            reye_pose=jnp.zeros((3,), dtype),
            left_hand_pose=jnp.zeros((c,), dtype),
            right_hand_pose=jnp.zeros((c,), dtype),
        )


jax.tree_util.register_dataclass(
    BodyParams,
    data_fields=[
        "betas", "global_orient", "body_pose", "expression", "jaw_pose",
        "leye_pose", "reye_pose", "left_hand_pose", "right_hand_pose",
    ],
    meta_fields=[],
)


@dataclasses.dataclass(frozen=True)
class BodyOutput:
    vertices: jax.Array            # [V, 3]
    joints: jax.Array              # mapped joints (OpenPose/SPIN order)
    joints_raw: jax.Array          # skeleton+selector(+landmark) joints
    full_pose: jax.Array           # [J*3] axis-angle, incl. global orient


jax.tree_util.register_dataclass(
    BodyOutput,
    data_fields=["vertices", "joints", "joints_raw", "full_pose"],
    meta_fields=[],
)


# ---------------------------------------------------------------------------
# Forward-pass building blocks
# ---------------------------------------------------------------------------


def blend_shapes(coeffs: jax.Array, dirs: jax.Array) -> jax.Array:
    """``[S]`` coefficients x ``[S, 3V]`` basis -> ``[V, 3]`` offsets."""
    # accumulate in the INPUT precision: a hardcoded f32 preferred type
    # silently downcast f64 parity runs (parity_fit.py) to f32
    out = jnp.matmul(
        coeffs, dirs,
        preferred_element_type=jnp.promote_types(coeffs.dtype, dirs.dtype),
    )
    return out.reshape(dirs.shape[-1] // 3, 3)


def vertices2joints(J_regressor: jax.Array, verts: jax.Array) -> jax.Array:
    """Regress joint locations ``[J, 3]`` from vertices ``[V, 3]``."""
    return jnp.matmul(
        J_regressor, verts,
        preferred_element_type=jnp.promote_types(
            J_regressor.dtype, verts.dtype
        ),
    )


def rigid_transform_chain(
    rot_mats: jax.Array, rest_joints: jax.Array, parents: tuple
):
    """Forward-kinematics over the (static) kinematic tree.

    Args:
      rot_mats: ``[J, 3, 3]`` local joint rotations.
      rest_joints: ``[J, 3]`` rest-pose joint locations.
      parents: length-J tuple, ``parents[0] == -1``.

    Returns:
      posed_joints ``[J, 3]`` and relative skinning transforms ``[J, 4, 4]``
      (world transform with the rest-pose joint location factored out).

    Deliberately the unrolled J-step form: a level-wise (depth-batched)
    variant with gather/scatter per tree level measured ~5% slower on the
    full 150x48 fit (BENCH_NOTES.md negative results) — XLA pipelines the
    55 tiny matmuls better than it handles the scatters.
    """
    J = len(parents)
    rel = rest_joints - jnp.concatenate(
        [rest_joints[:1], rest_joints[np.array(parents[1:])]], axis=0
    )
    rel = rel.at[0].set(rest_joints[0])

    def make_T(R, t):
        T = jnp.zeros((4, 4), dtype=R.dtype)
        T = T.at[:3, :3].set(R).at[:3, 3].set(t).at[3, 3].set(1.0)
        return T

    local = jax.vmap(make_T)(rot_mats, rel)
    # Unrolled accumulation over the static tree: J tiny matmuls.
    world = [local[0]]
    for j in range(1, J):
        world.append(world[parents[j]] @ local[j])
    world = jnp.stack(world, axis=0)                     # [J, 4, 4]

    posed_joints = world[:, :3, 3]
    # Factor out the rest joint: A = world - [0 | world_R @ j_rest]
    correction = jnp.einsum("jpq,jq->jp", world[:, :3, :3], rest_joints)
    rel_transforms = world.at[:, :3, 3].add(-correction)
    return posed_joints, rel_transforms


def _full_pose(model: BodyModel, p: BodyParams) -> jax.Array:
    """Assemble the ``[J*3]`` axis-angle pose vector in smplx layout."""
    if model.model_type == "smpl":
        return jnp.concatenate([p.global_orient, p.body_pose])

    def hand_aa(coeffs, components, mean):
        if model.hand_use_pca:
            # PCA coefficients through the basis (smplx use_pca=True)
            aa = jnp.matmul(
                coeffs, components[: coeffs.shape[-1]],
                preferred_element_type=jnp.promote_types(
                    coeffs.dtype, components.dtype
                ),
            )
        else:
            # full [45] axis-angle pose (smplx use_pca=False)
            aa = coeffs
        if not model.flat_hand_mean:
            aa = aa + mean
        return aa

    lhand = hand_aa(p.left_hand_pose, model.hand_components_l,
                    model.hand_mean_l)
    rhand = hand_aa(p.right_hand_pose, model.hand_components_r,
                    model.hand_mean_r)
    if model.model_type == "smplh":
        # SMPL-H: global(1) + body(21) + lhand(15) + rhand(15) = 52 joints
        return jnp.concatenate([
            p.global_orient, p.body_pose, lhand, rhand,
        ])
    # SMPL-X: global(1) + body(21) + jaw + leye + reye + lhand(15) + rhand(15)
    return jnp.concatenate([
        p.global_orient, p.body_pose, p.jaw_pose, p.leye_pose, p.reye_pose,
        lhand, rhand,
    ])


def _face_landmarks(
    model: BodyModel, vertices: jax.Array, full_pose_aa: jax.Array
) -> jax.Array:
    """Static (51) + dynamic-contour (17) face landmarks for SMPL-X.

    The contour landmarks depend on head yaw: the neck-chain world rotation's
    y-Euler angle selects a row of the per-degree contour tables, mirroring
    smplx's ``find_dynamic_lmk_idx_and_bcoords``.
    """
    faces = model.faces
    lmk_faces = model.lmk_faces_idx
    lmk_bary = model.lmk_bary_coords
    if model.use_face_contour:
        chain = np.array(model.neck_chain, dtype=np.int32)
        aa = full_pose_aa.reshape(-1, 3)[chain]
        rots = rodrigues(aa)                               # [L, 3, 3]
        rel = rots[0]
        for i in range(1, rots.shape[0]):
            rel = rots[i] @ rel                            # root-to-neck prod
        # y Euler angle of the head world rotation, in degrees.
        y_angle = -jnp.arctan2(
            -rel[2, 0], jnp.sqrt(rel[0, 0] ** 2 + rel[1, 0] ** 2)
        ) * (180.0 / jnp.pi)
        y_rot = jnp.round(jnp.clip(y_angle, max=39.0)).astype(jnp.int32)
        neg = y_rot < 0
        below = y_rot < -39
        neg_vals = jnp.where(below, 78, 39 - y_rot)
        idx = jnp.where(neg, neg_vals, y_rot)
        dyn_faces = model.dyn_lmk_faces_idx[idx]           # [17]
        dyn_bary = model.dyn_lmk_bary_coords[idx]          # [17, 3]
        lmk_faces = jnp.concatenate([lmk_faces, dyn_faces])
        lmk_bary = jnp.concatenate([lmk_bary, dyn_bary], axis=0)
    tri_verts = vertices[faces[lmk_faces]]                 # [L, 3, 3]
    return jnp.einsum("lvc,lv->lc", tri_verts, lmk_bary)


# Fused-skinning switch.  "on" forces the Pallas kernel (parity-exact with
# the XLA path; tests run it in interpret mode).  Measured on a v5e with
# scan-based in-program timing (bench_skinning.py): the XLA matmul+einsum
# runs ~0.66 ms fwd+bwd (B=128, V=10475) while the v1 kernel's [TV, 3]
# trailing-dim blocks are DMA-bound at ~13 ms, so "auto" resolves to the
# XLA path — the joints-only reduction (reduce_for_joints) removed this op
# from the keypoint hot loop entirely, which superseded the fusion lever.
FUSED_SKINNING = "auto"


def _use_fused_skinning(model: BodyModel) -> bool:
    if FUSED_SKINNING == "off" or FUSED_SKINNING == "auto":
        return False
    if model.lbs_weights.dtype != jnp.float32:
        return False
    return True


def lbs(model: BodyModel, params: BodyParams):
    """Core linear-blend-skinning forward pass for one frame.

    Returns ``(vertices [V,3], skeleton_joints [J,3], full_pose [J*3])``.
    """
    full_pose_aa = _full_pose(model, params)

    # Shape (+ expression) blendshapes.  With a kid template, the last
    # beta drives the SMIL blend direction and the rest the usual basis
    # (reference smplify/smplify.py:50-56, smplx kid_template_path).
    shape_betas = (
        params.betas[:-1] if model.kid_shape_dir is not None
        else params.betas
    )
    v_shaped = model.v_template + blend_shapes(shape_betas, model.shapedirs)
    if model.num_expressions and model.expr_dirs is not None:
        v_shaped = v_shaped + blend_shapes(params.expression, model.expr_dirs)
    if model.kid_shape_dir is not None:
        v_shaped = v_shaped + params.betas[-1] * model.kid_shape_dir.reshape(
            -1, 3
        )

    if model.J_template is not None:
        # Folded joint regression (reduce_for_joints): J_regressor applied
        # to the bases once at reduction time, so rest joints cost O(S*J)
        # instead of O(J*V).  Same math by linearity of the regression.
        rest_joints = model.J_template + blend_shapes(
            shape_betas, model.J_shapedirs
        )
        if model.num_expressions and model.J_exprdirs is not None:
            rest_joints = rest_joints + blend_shapes(
                params.expression, model.J_exprdirs
            )
        if model.J_kid_dir is not None:
            rest_joints = rest_joints + params.betas[-1] * (
                model.J_kid_dir.reshape(-1, 3)
            )
    else:
        rest_joints = vertices2joints(model.J_regressor, v_shaped)

    rot_mats = rodrigues(full_pose_aa.reshape(-1, 3))      # [J, 3, 3]
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[1:] - eye).reshape(-1)        # [(J-1)*9]
    v_posed = v_shaped + blend_shapes(pose_feature, model.posedirs)

    posed_joints, rel_tf = rigid_transform_chain(
        rot_mats, rest_joints, model.parents
    )

    # Skinning.  The [B,V,12] blended transform is the fit's bandwidth
    # bottleneck (BENCH_NOTES.md); on TPU a fused Pallas kernel streams
    # A[J,12] through VMEM and never materializes it.  Elsewhere (and for
    # small/reduced models, where kernel launch overhead loses) one MXU
    # matmul + einsum.
    A12 = rel_tf[:, :3, :].reshape(model.num_joints, 12)
    if _use_fused_skinning(model):
        from bodyfitting_tpu.ops.pallas_kernels import make_fused_skinning

        verts = make_fused_skinning(model.lbs_weights)(A12, v_posed)
    else:
        T = jnp.matmul(
            model.lbs_weights, A12,
            preferred_element_type=jnp.promote_types(
                model.lbs_weights.dtype, A12.dtype
            ),
        ).reshape(model.num_verts, 3, 4)
        verts = (
            jnp.einsum("vij,vj->vi", T[:, :, :3], v_posed) + T[:, :, 3]
        )
    return verts, posed_joints, full_pose_aa


def forward(model: BodyModel, params: BodyParams) -> BodyOutput:
    """Full single-frame forward pass, including auxiliary joints.

    ``vmap`` over a leading axis of ``params`` for batched evaluation.

    Joint layout of ``joints``:
      * smpl: the 49-joint SPIN superset (reference models/smpl.py:69-83),
        whose first 25 joints are OpenPose BODY_25 order.
      * smplx: 25 body + 21 + 21 hand + 51 face (+17 contour) keypoints in
        OpenPose order via the coco25 mapper (reference smplify/smplify.py:59).
    """
    verts, skel_joints, full_pose_aa = lbs(model, params)

    joints = skel_joints
    if model.selector_ids is not None:
        joints = jnp.concatenate([joints, verts[model.selector_ids]], axis=0)
    if model.model_type == "smplx" and model.lmk_faces_idx is not None:
        landmarks = _face_landmarks(model, verts, full_pose_aa)
        joints = jnp.concatenate([joints, landmarks], axis=0)
    joints_raw = joints

    if model.model_type == "smpl" and model.extra_joint_regressor is not None:
        # SPIN: append 9 regressed joints, permute into the 49-joint layout
        # (reference models/smpl.py:69-83).
        extra = vertices2joints(model.extra_joint_regressor, verts)
        joints = jnp.concatenate([joints, extra], axis=0)
    if model.joint_mapper is not None:
        joints = joints[model.joint_mapper]

    return BodyOutput(
        vertices=verts,
        joints=joints,
        joints_raw=joints_raw,
        full_pose=full_pose_aa,
    )


# ---------------------------------------------------------------------------
# Asset loading
# ---------------------------------------------------------------------------


class _ChumpyShimUnpickler(pickle.Unpickler):
    """Unpickle legacy SMPL pkl files without the ``chumpy`` package.

    SMPL .pkl assets store chumpy array objects; this maps the chumpy class
    to a minimal shim whose state still contains the raw numpy data.
    """

    class _Ch:
        def __setstate__(self, state):
            self.__dict__.update(state)

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyShimUnpickler._Ch
        if module == "copy_reg" and name == "_reconstructor":
            return lambda cls, base, state: (
                base(state) if base is not object else cls.__new__(cls)
            )
        return super().find_class(module, name)


def _to_np(x, dtype=np.float64) -> np.ndarray:
    if hasattr(x, "toarray"):          # scipy sparse
        x = x.toarray()
    if hasattr(x, "__dict__") and "x" in getattr(x, "__dict__", {}):
        x = x.__dict__["x"]            # chumpy shim: underlying data
    return np.asarray(x, dtype=dtype)


def _parents_from_kintree(kintree: np.ndarray) -> tuple:
    parents = np.asarray(kintree, dtype=np.int64)
    if parents.ndim == 2:              # kintree_table [2, J]: row 0 = parents
        parents = parents[0]
    parents = parents.astype(np.int64)
    parents[0] = -1                    # stored as 2^32-1 in some assets
    return tuple(int(p) for p in parents)


def _neck_chain(parents: tuple, neck_idx: int = 12) -> tuple:
    chain, cur = [], neck_idx
    while cur != -1:
        chain.append(cur)
        cur = parents[cur]
    return tuple(chain)


def load_model(
    path: str,
    model_type: Optional[str] = None,
    num_betas: int = 10,
    num_expressions: int = 10,
    num_hand_pca: int = 6,
    hand_use_pca: bool = True,
    flat_hand_mean: bool = False,
    use_face_contour: bool = True,
    extra_joint_regressor_path: Optional[str] = None,
    kid_template_path: Optional[str] = None,
    dtype=jnp.float32,
) -> BodyModel:
    """Load a SMPL (.pkl) or SMPL-X (.npz) model asset.

    Accepts the exact asset files the reference uses (``data/smpl/*.pkl``,
    ``data/SMPLX_*.npz``); ``model_type`` is inferred from the contents when
    not given.
    """
    if path.endswith(".npz"):
        data: Any = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            data = _ChumpyShimUnpickler(f, encoding="latin1").load()

    J = _to_np(data["J_regressor"]).shape[0]
    if model_type is None:
        model_type = {24: "smpl", 52: "smplh", 55: "smplx"}.get(J, "smpl")

    v_template = _to_np(data["v_template"])
    V = v_template.shape[0]
    shapedirs_full = _to_np(data["shapedirs"])            # [V, 3, S_total]
    # SMPL-X shapedirs layouts (smplx body_models.py SHAPE_SPACE_DIM
    # logic): full assets store 400 dirs — [0:300] shape space, [300:310]
    # expression; legacy assets store 20 — [0:10] shape, [10:20]
    # expression.  Dropping the legacy expression slice would leave the
    # fitter optimizing expression coefficients with zero effect.
    if model_type == "smplx" and shapedirs_full.shape[-1] > 150:
        shape_part = shapedirs_full[..., :num_betas]
        expr_part = shapedirs_full[..., 300:300 + num_expressions]
    elif model_type == "smplx":
        nb = min(num_betas, 10)
        shape_part = shapedirs_full[..., :nb]
        expr_part = shapedirs_full[..., 10:10 + min(num_expressions, 10)]
    else:
        shape_part = shapedirs_full[..., :num_betas]
        expr_part = None

    posedirs = _to_np(data["posedirs"]).reshape(V * 3, -1).T  # [(J-1)*9, 3V]
    parents = _parents_from_kintree(data["kintree_table"])

    def _maybe(key, dt=np.float64):
        return _to_np(data[key], dt) if key in data else None

    kid_dir = None
    if kid_template_path is not None:
        with open(kid_template_path, "rb") as f:
            kid = _ChumpyShimUnpickler(f, encoding="latin1").load()
        kid_v = _to_np(kid["v_template"] if isinstance(kid, dict) else kid)
        kid_dir = (kid_v - kid_v.mean(0, keepdims=True)) - v_template
        kid_dir = kid_dir.reshape(-1)

    is_x = model_type == "smplx"
    mapper = None
    if is_x:
        mapper = smpl_to_openpose(
            "smplx", use_hands=True, use_face=True,
            use_face_contour=use_face_contour, openpose_format="coco25",
        )

    extra_reg = None
    if extra_joint_regressor_path is not None:
        extra_reg = np.load(extra_joint_regressor_path).astype(np.float64)

    def arr(x):
        return None if x is None else jnp.asarray(x, dtype=dtype)

    return BodyModel(
        v_template=arr(v_template),
        shapedirs=arr(shape_part.reshape(V * 3, -1).T),
        posedirs=arr(posedirs),
        J_regressor=arr(_to_np(data["J_regressor"])),
        lbs_weights=arr(_to_np(data["weights"])),
        faces=jnp.asarray(_to_np(data["f"], np.int64), dtype=jnp.int32),
        expr_dirs=arr(
            expr_part.reshape(V * 3, -1).T if expr_part is not None else None
        ),
        hand_components_l=arr(_maybe("hands_componentsl")),
        hand_components_r=arr(_maybe("hands_componentsr")),
        hand_mean_l=arr(_maybe("hands_meanl")),
        hand_mean_r=arr(_maybe("hands_meanr")),
        lmk_faces_idx=(
            jnp.asarray(_to_np(data["lmk_faces_idx"], np.int64), jnp.int32)
            if "lmk_faces_idx" in data else None
        ),
        lmk_bary_coords=arr(_maybe("lmk_bary_coords")),
        dyn_lmk_faces_idx=(
            jnp.asarray(
                _to_np(data["dynamic_lmk_faces_idx"], np.int64), jnp.int32
            ) if "dynamic_lmk_faces_idx" in data else None
        ),
        dyn_lmk_bary_coords=arr(_maybe("dynamic_lmk_bary_coords")),
        extra_joint_regressor=arr(extra_reg),
        selector_ids=jnp.asarray(selector_vertex_ids(model_type)),
        joint_mapper=None if mapper is None else jnp.asarray(mapper),
        kid_shape_dir=arr(kid_dir),
        model_type=model_type,
        parents=parents,
        neck_chain=_neck_chain(parents) if is_x else (),
        num_betas=num_betas + (1 if kid_dir is not None else 0),
        num_expressions=num_expressions if is_x else 0,
        num_hand_pca=num_hand_pca,
        hand_use_pca=hand_use_pca,
        flat_hand_mean=flat_hand_mean,
        use_face_contour=use_face_contour and is_x,
    )


def spin_joint_mapper_for_smpl(model: BodyModel) -> BodyModel:
    """Attach the 49-joint SPIN permutation to a SMPL model.

    Reproduces the reference SMPL wrapper (models/smpl.py:61-83): joints =
    permute([45 smplx joints ++ 9 extra-regressed], JOINT_MAP[JOINT_NAMES]).
    Valid rows require ``extra_joint_regressor``; without it the 9 extra
    joints are taken as zeros (only SPIN rows >= 25 are affected — the
    OpenPose block used by the fitting losses is exact either way).
    """
    perm = jnp.asarray(constants.SPIN_JOINT_PERMUTATION)
    extra = model.extra_joint_regressor
    if extra is None:
        extra = jnp.zeros((9, model.num_verts), model.v_template.dtype)
    return dataclasses.replace(
        model, joint_mapper=perm, extra_joint_regressor=extra
    )


# ---------------------------------------------------------------------------
# Joints-only model reduction
# ---------------------------------------------------------------------------


def reduce_for_rows(model: BodyModel, vertex_ids):
    """Joints reduction that ALSO keeps the given full-model vertex rows.

    Returns ``(reduced_model, rows)`` where ``reduced_model`` computes
    the identical joints as :func:`reduce_for_joints` plus the requested
    vertex rows (same per-row float ops as the full forward), and
    ``rows`` are the positions of ``vertex_ids`` inside
    ``reduced_model``'s vertex axis, i.e.
    ``reduced.forward(p).vertices[rows] == full.forward(p).vertices[vertex_ids]``
    row-for-row.

    This is the single-forward engine for mask fits: the silhouette loss
    reads every-4th vertex (reference loss.py:94 ``vertices[:, ::4]``),
    so keeping those ~V/4 rows lets the keypoint AND mask terms share one
    reduced LBS instead of chaining a joints-reduced forward with a
    second full-V forward inside the gated branch — the staged step's
    measured bottleneck is sequential-op latency (BENCH_NOTES MFU table),
    so halving the chain and cutting the vertex rows 4x attacks the wall
    directly.
    """
    vertex_ids = np.asarray(vertex_ids, np.int64)
    reduced, vids = _reduce_for_vertex_rows(model, vertex_ids)
    rows = np.searchsorted(vids, vertex_ids)
    return reduced, jnp.asarray(rows, jnp.int32)


def reduce_for_joints(model: BodyModel) -> BodyModel:
    """Shrink a model to the vertex rows its *joints* actually depend on.

    A keypoint-only fit (the reference's default GeneBody configuration,
    /root/reference/apps/genebody_fitting.py:42 ``use_mask=False``) never
    consumes full vertices inside the hot loop — the loss reads joints,
    which touch vertices only through the 21 selector picks and the face
    landmark triangles.  This reduction makes the per-iteration forward
    independent of V:

      * ``J_regressor @ v_shaped`` is folded into per-beta joint bases
        (``J_template``/``J_shapedirs``/``J_exprdirs``/``J_kid_dir``),
        exact by linearity of the regression;
      * vertex-level arrays are restricted to the ~250 rows reachable from
        ``selector_ids`` and the (static + dynamic-contour) landmark
        triangles, with all index tables remapped.

    The returned model computes the identical ``joints`` (same float ops on
    the kept rows) while ``vertices`` has only the kept rows — callers that
    need full vertices (mask/mesh losses, final outputs) keep the original
    model.  SPIN extra joints (``extra_joint_regressor``, a dense [9, V]
    map over *posed* vertices) cannot be row-restricted; they are zeroed,
    so for SMPL only the OpenPose block of the 49-joint layout is exact —
    the same caveat as :func:`spin_joint_mapper_for_smpl` without the
    extra-regressor asset, and irrelevant to the fitting losses which read
    the first 25 joints only (reference smplify/loss.py:163).
    """
    reduced, _ = _reduce_for_vertex_rows(model, np.zeros((0,), np.int64))
    return reduced


def _reduce_for_vertex_rows(model: BodyModel, extra_vertex_ids):
    """Shared core of :func:`reduce_for_joints` / :func:`reduce_for_rows`:
    keep the joint-reachable rows plus ``extra_vertex_ids``; returns
    ``(reduced_model, vids)`` with ``vids`` the sorted kept row ids."""
    faces = np.asarray(model.faces)
    sel = np.asarray(model.selector_ids) if model.selector_ids is not None \
        else np.zeros((0,), np.int32)

    # Face rows the landmarks read, old-face-id -> new-face-row remap.
    fids = []
    if model.lmk_faces_idx is not None:
        fids.append(np.asarray(model.lmk_faces_idx).ravel())
    if model.dyn_lmk_faces_idx is not None and model.use_face_contour:
        fids.append(np.asarray(model.dyn_lmk_faces_idx).ravel())
    fids = (np.unique(np.concatenate(fids)) if fids
            else np.zeros((0,), np.int64))
    kept_faces = faces[fids]                              # [Fk, 3]

    # Vertex rows reachable from selectors + kept faces (+ caller-kept
    # rows), old->new remap.
    vids = np.unique(np.concatenate([
        sel.ravel(), kept_faces.ravel(),
        np.asarray(extra_vertex_ids, np.int64).ravel(),
    ]))
    vmap_ = np.full((model.num_verts,), -1, np.int64)
    vmap_[vids] = np.arange(len(vids))

    col3 = (vids[:, None] * 3 + np.arange(3)).ravel()     # basis columns

    def cols(a):
        return None if a is None else a[:, col3]

    def remap_faces(idx):
        pos = np.searchsorted(fids, np.asarray(idx).ravel())
        return jnp.asarray(pos.reshape(np.asarray(idx).shape), jnp.int32)

    # Fold the joint regression into the bases (host, float64 for accuracy).
    Jreg = np.asarray(model.J_regressor, np.float64)
    dt = model.v_template.dtype

    def fold(basis):
        if basis is None:
            return None
        b = np.asarray(basis, np.float64).reshape(
            basis.shape[0], model.num_verts, 3
        )
        return jnp.asarray(
            np.einsum("svc,jv->sjc", b, Jreg).reshape(basis.shape[0], -1), dt
        )

    J_template = jnp.asarray(
        Jreg @ np.asarray(model.v_template, np.float64), dt
    )
    J_kid = None
    if model.kid_shape_dir is not None:
        kd = np.asarray(model.kid_shape_dir, np.float64).reshape(-1, 3)
        J_kid = jnp.asarray((Jreg @ kd).reshape(-1), dt)

    return dataclasses.replace(
        model,
        v_template=model.v_template[vids],
        shapedirs=cols(model.shapedirs),
        posedirs=cols(model.posedirs),
        expr_dirs=cols(model.expr_dirs),
        kid_shape_dir=(
            None if model.kid_shape_dir is None
            else model.kid_shape_dir.reshape(-1, 3)[vids].reshape(-1)
        ),
        lbs_weights=model.lbs_weights[vids],
        J_regressor=jnp.zeros((model.num_joints, len(vids)), dt),
        faces=jnp.asarray(vmap_[kept_faces], jnp.int32),
        lmk_faces_idx=(
            None if model.lmk_faces_idx is None
            else remap_faces(model.lmk_faces_idx)
        ),
        # With the contour off, the dynamic faces are not in `fids`, so a
        # remap would produce garbage indices; drop the tables instead.
        dyn_lmk_faces_idx=(
            remap_faces(model.dyn_lmk_faces_idx)
            if model.dyn_lmk_faces_idx is not None and model.use_face_contour
            else None
        ),
        dyn_lmk_bary_coords=(
            model.dyn_lmk_bary_coords if model.use_face_contour else None
        ),
        selector_ids=(
            None if model.selector_ids is None
            else jnp.asarray(vmap_[sel], jnp.int32)
        ),
        # Dense [9, V] over posed vertices: not row-restrictable.  Kept as
        # zeros so the SPIN permutation stays shape-valid (rows >= 25 are
        # zero, the same caveat as spin_joint_mapper_for_smpl without the
        # asset); the OpenPose block the losses read is unaffected.
        extra_joint_regressor=(
            None if model.extra_joint_regressor is None
            else jnp.zeros((model.extra_joint_regressor.shape[0], len(vids)),
                           dt)
        ),
        J_template=J_template,
        J_shapedirs=fold(model.shapedirs),
        J_exprdirs=fold(model.expr_dirs),
        J_kid_dir=J_kid,
    ), vids


# ---------------------------------------------------------------------------
# Synthetic fixtures (tests / benchmarks without licensed assets)
# ---------------------------------------------------------------------------


def sphere_mesh(num_verts: int, rng):
    """A structured, well-conditioned closed triangle mesh with ~num_verts
    vertices: a UV-sphere grid squashed into a body-like ellipsoid with a
    smooth radial wobble.  Unlike a random triangulation (which is mostly
    sliver triangles whose unit normals rotate wildly under tiny vertex
    perturbations), this mesh has bounded aspect ratios — required by
    tests/benches of surface losses (vertex normals, Laplacian smoothness,
    displacement fitting), where mesh conditioning sets the Lyapunov rate
    of the optimization.

    Returns ``(verts [V, 3] float64, faces [F, 3] int32)`` with
    ``V = rows * cols + 2`` chosen as close to ``num_verts`` as possible.
    """
    rows = max(int(np.sqrt(max(num_verts - 2, 8) / 2)), 2)
    cols = max((num_verts - 2) // rows, 3)
    th = np.pi * (np.arange(1, rows + 1)) / (rows + 1)      # (0, pi)
    ph = 2 * np.pi * np.arange(cols) / cols
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack(
        [np.sin(T) * np.cos(P), np.cos(T), np.sin(T) * np.sin(P)], -1
    ).reshape(-1, 3)
    top = np.array([[0.0, 1.0, 0.0]])
    bot = np.array([[0.0, -1.0, 0.0]])
    verts = np.concatenate([top, pts, bot], axis=0)         # [V, 3]
    # body-ish ellipsoid + smooth low-frequency bumps (arms/legs stand-in)
    verts = verts * np.array([0.35, 0.9, 0.25])
    wob = 0.08 * np.sin(5.0 * verts[:, 1] + 2.0) \
        + 0.05 * np.cos(4.0 * verts[:, 0] + 1.0)
    verts = verts * (1.0 + wob[:, None])
    verts = verts + rng.normal(scale=0.002, size=verts.shape)

    def vid(r, c):
        return 1 + r * cols + (c % cols)

    faces = []
    for c in range(cols):                                   # caps
        faces.append([0, vid(0, c + 1), vid(0, c)])
        faces.append([len(verts) - 1, vid(rows - 1, c), vid(rows - 1, c + 1)])
    for r in range(rows - 1):                               # quad strips
        for c in range(cols):
            faces.append([vid(r, c), vid(r, c + 1), vid(r + 1, c)])
            faces.append([vid(r, c + 1), vid(r + 1, c + 1), vid(r + 1, c)])
    return verts.astype(np.float64), np.asarray(faces, np.int32)


def synthetic_model(
    model_type: str = "smpl",
    num_verts: int = 256,
    seed: int = 0,
    num_betas: int = 10,
    num_expressions: int = 10,
    num_hand_pca: int = 6,
    use_face_contour: bool = True,
    dtype=jnp.float32,
    mesh: str = "random",
) -> BodyModel:
    """A small, structurally-valid random body model for tests and benches.

    ``mesh='sphere'`` replaces the random point cloud + random
    triangulation with a structured closed surface (:func:`sphere_mesh`) —
    use it whenever surface quality matters (normals, smoothness,
    displacement fits); ``'random'`` keeps the historical generator that
    most fixtures were pinned against.

    Mirrors the real asset structure: normalized joint regressor rows,
    convex skinning weights concentrated on nearby joints, a plausible
    kinematic tree, PCA hand bases, face-landmark tables.
    """
    rng = np.random.default_rng(seed)
    if model_type == "smpl":
        J = 24
        parents = (-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                   16, 17, 18, 19, 20, 21)
    elif model_type == "smplh":
        J = 52
        body = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                16, 17, 18, 19]
        lhand = [20, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35]
        rhand = [21, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50]
        parents = tuple(body + lhand + rhand)
    elif model_type == "smplx":
        J = 55
        body = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                16, 17, 18, 19]
        head_extra = [15, 15, 15]                     # jaw, leye, reye
        lhand = [20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38]
        rhand = [21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53]
        parents = tuple(body + head_extra + lhand + rhand)
    else:
        raise ValueError(model_type)

    if mesh == "sphere":
        v_template, sphere_faces = sphere_mesh(num_verts, rng)
        V = v_template.shape[0]
    else:
        V = num_verts
        v_template = rng.normal(scale=0.3, size=(V, 3))
        sphere_faces = None
    # Rest joints as convex combos of vertices -> normalized regressor rows.
    Jreg = rng.random((J, V)) ** 8
    Jreg /= Jreg.sum(axis=1, keepdims=True)
    rest_joints = Jreg @ v_template
    # Skinning weights: soft assignment to the nearest few joints.
    d2 = ((v_template[:, None] - rest_joints[None]) ** 2).sum(-1)
    W = np.exp(-d2 * 20.0)
    W /= W.sum(axis=1, keepdims=True)

    S = num_betas
    shapedirs = rng.normal(scale=0.01, size=(S, V * 3))
    posedirs = rng.normal(scale=0.001, size=((J - 1) * 9, V * 3))
    # Random triangulation over vertices.  The first `lmk_pool` faces form a
    # clustered "head" region (vertices from a V//10 range): the real
    # SMPL-X landmark tables reference a few hundred unique faces whose
    # vertices all sit on the head, and tests/benches of the joints-only
    # reduction need that locality to be representative.
    F = max(2 * V, 64)

    def distinct_tris(n, pool):
        # three DISTINCT indices per face: real SMPL meshes have no
        # duplicate-vertex (zero-area) faces, and a degenerate face makes
        # the eps-guarded unit-normal gradient an amplified (~1/eps)
        # rounding-noise source that breaks cross-engine f64 parity of
        # the displacement stage (see losses/mesh.compute_vertex_normals)
        a = rng.integers(0, pool, size=n)
        b = (a + 1 + rng.integers(0, pool - 1, size=n)) % pool
        c = (a + 1 + rng.integers(0, pool - 1, size=n)) % pool
        while True:
            clash = c == b
            if not clash.any():
                break
            c[clash] = (
                a[clash] + 1 + rng.integers(0, pool - 1, size=clash.sum())
            ) % pool
        return np.stack([a, b, c], axis=1).astype(np.int32)

    if sphere_faces is not None:
        faces = sphere_faces
        F = faces.shape[0]
        lmk_pool = min(max(F // 16, 8), 256)
    else:
        faces = distinct_tris(F, V)
        lmk_pool = min(max(F // 16, 8), 256)
        head_verts = max(V // 10, 8)
        faces[:lmk_pool] = distinct_tris(lmk_pool, head_verts)

    is_x = model_type == "smplx"
    has_hands = model_type in ("smplh", "smplx")
    E = num_expressions if is_x else 0
    arr = lambda x: jnp.asarray(x, dtype=dtype)  # noqa: E731

    # Landmark tables draw from the clustered head-region faces above, as
    # the real SMPL-X asset does.
    lmk_faces = (
        rng.integers(0, lmk_pool, size=(51,)).astype(np.int32)
        if is_x else None
    )
    lmk_bary = None
    dyn_faces = dyn_bary = None
    if is_x:
        b = rng.random((51, 3))
        lmk_bary = b / b.sum(-1, keepdims=True)
        dyn_faces = rng.integers(0, lmk_pool, size=(79, 17)).astype(np.int32)
        db = rng.random((79, 17, 3))
        dyn_bary = db / db.sum(-1, keepdims=True)

    return BodyModel(
        v_template=arr(v_template),
        shapedirs=arr(shapedirs),
        posedirs=arr(posedirs),
        J_regressor=arr(Jreg),
        lbs_weights=arr(W),
        faces=jnp.asarray(faces),
        expr_dirs=arr(rng.normal(scale=0.005, size=(E, V * 3))) if is_x else None,
        hand_components_l=arr(rng.normal(size=(num_hand_pca, 45)) * 0.5)
        if has_hands else None,
        hand_components_r=arr(rng.normal(size=(num_hand_pca, 45)) * 0.5)
        if has_hands else None,
        hand_mean_l=arr(rng.normal(size=(45,)) * 0.05) if has_hands else None,
        hand_mean_r=arr(rng.normal(size=(45,)) * 0.05) if has_hands else None,
        lmk_faces_idx=jnp.asarray(lmk_faces) if is_x else None,
        lmk_bary_coords=arr(lmk_bary) if is_x else None,
        dyn_lmk_faces_idx=jnp.asarray(dyn_faces) if is_x else None,
        dyn_lmk_bary_coords=arr(dyn_bary) if is_x else None,
        extra_joint_regressor=None,
        selector_ids=jnp.asarray(
            rng.integers(0, V, size=(21,)).astype(np.int32)
        ),
        joint_mapper=jnp.asarray(
            smpl_to_openpose("smplx", use_face_contour=use_face_contour)
        ) if is_x else None,
        kid_shape_dir=None,
        model_type=model_type,
        parents=parents,
        neck_chain=_neck_chain(parents) if is_x else (),
        num_betas=num_betas,
        num_expressions=E,
        num_hand_pca=num_hand_pca,
        flat_hand_mean=False,
        use_face_contour=use_face_contour and is_x,
    )
