"""Faithful torch re-enactment of the reference SMPLify optimizer.

This module exists to *prove the north star*: the JAX engine must produce
the same converged fits as the reference implementation
(/root/reference/smplify/smplify.py:84-226).  Since the reference cannot run
here (CUDA/torch-1.2-era deps, licensed assets), we re-enact its exact
mathematical structure in torch-CPU — the same smplx forward pass, the same
per-view Python loss loop (loss.py:139-230), the same Adam parameter groups
including the jaw-never-optimized quirk (smplify.py:118,167-173) — driven by
the *identical* model data and observations the JAX engine sees.  Converged
vertices from both engines are then compared (see ``parity_fit.py`` and
``tests/test_parity.py``).

Everything here is written against the reference's published semantics, not
translated from its code: each function cites the behaviour it re-enacts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import torch


# ---------------------------------------------------------------------------
# Model data transfer: JAX BodyModel -> torch tensors
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TorchBodyModel:
    """The same body-model data as :class:`bodyfitting_tpu.models.BodyModel`,
    as torch tensors, plus the static metadata the forward pass needs."""

    v_template: torch.Tensor          # [V, 3]
    shapedirs: torch.Tensor           # [S, 3V]
    posedirs: torch.Tensor            # [(J-1)*9, 3V]
    J_regressor: torch.Tensor         # [J, V]
    lbs_weights: torch.Tensor         # [V, J]
    faces: torch.Tensor               # [F, 3] long
    expr_dirs: Optional[torch.Tensor]
    hand_components_l: Optional[torch.Tensor]
    hand_components_r: Optional[torch.Tensor]
    hand_mean_l: Optional[torch.Tensor]
    hand_mean_r: Optional[torch.Tensor]
    lmk_faces_idx: Optional[torch.Tensor]
    lmk_bary_coords: Optional[torch.Tensor]
    dyn_lmk_faces_idx: Optional[torch.Tensor]
    dyn_lmk_bary_coords: Optional[torch.Tensor]
    selector_ids: Optional[torch.Tensor]
    joint_mapper: Optional[torch.Tensor]
    extra_joint_regressor: Optional[torch.Tensor]  # [9, V] SPIN joints
    kid_shape_dir: Optional[torch.Tensor]          # [3V] SMIL blend dir
    model_type: str
    parents: tuple
    neck_chain: tuple
    num_hand_pca: int
    hand_use_pca: bool
    flat_hand_mean: bool
    use_face_contour: bool


def torch_model_from_jax(model, dtype=torch.float32) -> TorchBodyModel:
    """Copy a JAX :class:`BodyModel`'s arrays into torch tensors."""

    def t(x, as_long=False):
        if x is None:
            return None
        arr = np.asarray(x)
        tt = torch.from_numpy(np.ascontiguousarray(arr).copy())
        return tt.long() if as_long else tt.to(dtype)

    return TorchBodyModel(
        v_template=t(model.v_template),
        shapedirs=t(model.shapedirs),
        posedirs=t(model.posedirs),
        J_regressor=t(model.J_regressor),
        lbs_weights=t(model.lbs_weights),
        faces=t(model.faces, as_long=True),
        expr_dirs=t(model.expr_dirs),
        hand_components_l=t(model.hand_components_l),
        hand_components_r=t(model.hand_components_r),
        hand_mean_l=t(model.hand_mean_l),
        hand_mean_r=t(model.hand_mean_r),
        lmk_faces_idx=t(model.lmk_faces_idx, as_long=True),
        lmk_bary_coords=t(model.lmk_bary_coords),
        dyn_lmk_faces_idx=t(model.dyn_lmk_faces_idx, as_long=True),
        dyn_lmk_bary_coords=t(model.dyn_lmk_bary_coords),
        selector_ids=t(model.selector_ids, as_long=True),
        joint_mapper=t(model.joint_mapper, as_long=True),
        extra_joint_regressor=t(model.extra_joint_regressor),
        kid_shape_dir=t(model.kid_shape_dir),
        model_type=model.model_type,
        parents=tuple(model.parents),
        neck_chain=tuple(model.neck_chain),
        num_hand_pca=model.num_hand_pca,
        hand_use_pca=model.hand_use_pca,
        flat_hand_mean=model.flat_hand_mean,
        use_face_contour=model.use_face_contour,
    )


# ---------------------------------------------------------------------------
# smplx-semantics forward pass in torch
# ---------------------------------------------------------------------------


def batch_rodrigues(aa: torch.Tensor) -> torch.Tensor:
    """Axis-angle [N,3] -> rotation matrices [N,3,3] via the quaternion
    route (reference utils/geometry.py:60-97 semantics)."""
    angle = torch.linalg.norm(aa + 1e-8, dim=-1, keepdim=True)
    axis = aa / angle
    half = angle * 0.5
    w = torch.cos(half)
    xyz = torch.sin(half) * axis
    x, y, z = xyz.unbind(-1)
    w = w.squeeze(-1)
    return torch.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        dim=-1,
    ).reshape(aa.shape[:-1] + (3, 3))


def full_pose_aa(md: TorchBodyModel, p: Dict[str, torch.Tensor]) -> torch.Tensor:
    """Assemble the [J*3] axis-angle pose vector, smplx layout
    (reference smplify/smplify.py:179-187 argument order)."""
    if md.model_type == "smpl":
        return torch.cat([p["global_orient"], p["body_pose"]])

    def hand(coeffs, comps, mean):
        # full [45] axis-angle when hand_use_pca=False, like the JAX model
        aa = (coeffs @ comps[: coeffs.shape[-1]]
              if md.hand_use_pca else coeffs)
        if not md.flat_hand_mean:
            aa = aa + mean
        return aa

    lhand = hand(p["left_hand_pose"], md.hand_components_l, md.hand_mean_l)
    rhand = hand(p["right_hand_pose"], md.hand_components_r, md.hand_mean_r)
    if md.model_type == "smplh":
        return torch.cat([p["global_orient"], p["body_pose"], lhand, rhand])
    return torch.cat([
        p["global_orient"], p["body_pose"], p["jaw_pose"], p["leye_pose"],
        p["reye_pose"], lhand, rhand,
    ])


def forward(md: TorchBodyModel, p: Dict[str, torch.Tensor]):
    """smplx-semantics forward: blendshapes, joint regression, kinematic
    chain, LBS, selector joints, face landmarks, joint mapping.

    Mirrors the behaviour the reference gets from ``smplx.create(...)`` at
    smplify/smplify.py:57-80 (the smplx pip package), on which the JAX
    :func:`bodyfitting_tpu.models.body_model.forward` is also modelled.
    Returns ``(vertices [V,3], mapped_joints [M,3], full_pose [J*3])``.
    """
    V = md.v_template.shape[0]
    pose = full_pose_aa(md, p)

    betas = p["betas"]
    shape_betas = betas[:-1] if md.kid_shape_dir is not None else betas
    v_shaped = md.v_template + (shape_betas @ md.shapedirs).reshape(V, 3)
    if md.expr_dirs is not None and "expression" in p:
        v_shaped = v_shaped + (p["expression"] @ md.expr_dirs).reshape(V, 3)
    if md.kid_shape_dir is not None:
        v_shaped = v_shaped + betas[-1] * md.kid_shape_dir.reshape(V, 3)

    rest_joints = md.J_regressor @ v_shaped                    # [J, 3]
    rot = batch_rodrigues(pose.reshape(-1, 3))                 # [J, 3, 3]
    eye = torch.eye(3, dtype=rot.dtype)
    pose_feature = (rot[1:] - eye).reshape(-1)
    v_posed = v_shaped + (pose_feature @ md.posedirs).reshape(V, 3)

    # kinematic chain
    J = rot.shape[0]
    parents = md.parents
    rel = [rest_joints[0]]
    for j in range(1, J):
        rel.append(rest_joints[j] - rest_joints[parents[j]])
    world = [None] * J
    for j in range(J):
        T = torch.cat([
            torch.cat([rot[j], rel[j][:, None]], dim=1),
            torch.tensor([[0.0, 0.0, 0.0, 1.0]], dtype=rot.dtype),
        ], dim=0)
        world[j] = T if parents[j] == -1 else world[parents[j]] @ T
    world = torch.stack(world)                                 # [J, 4, 4]
    posed_joints = world[:, :3, 3]
    correction = torch.einsum("jpq,jq->jp", world[:, :3, :3], rest_joints)
    A = torch.cat([
        world[:, :3, :3],
        (world[:, :3, 3] - correction)[:, :, None],
    ], dim=2)                                                  # [J, 3, 4]

    T = (md.lbs_weights @ A.reshape(J, 12)).reshape(V, 3, 4)
    verts = torch.einsum("vij,vj->vi", T[:, :, :3], v_posed) + T[:, :, 3]

    joints = posed_joints
    if md.selector_ids is not None:
        joints = torch.cat([joints, verts[md.selector_ids]], dim=0)
    if md.model_type == "smplx" and md.lmk_faces_idx is not None:
        lmk_faces = md.lmk_faces_idx
        lmk_bary = md.lmk_bary_coords
        if md.use_face_contour:
            chain = list(md.neck_chain)
            rots = batch_rodrigues(pose.reshape(-1, 3)[chain])
            relrot = rots[0]
            for i in range(1, rots.shape[0]):
                relrot = rots[i] @ relrot
            y_angle = -torch.atan2(
                -relrot[2, 0],
                torch.sqrt(relrot[0, 0] ** 2 + relrot[1, 0] ** 2),
            ) * (180.0 / np.pi)
            y_rot = torch.round(torch.clamp(y_angle, max=39.0)).long()
            neg = y_rot < 0
            below = y_rot < -39
            neg_vals = torch.where(
                below, torch.tensor(78), 39 - y_rot
            )
            idx = torch.where(neg, neg_vals, y_rot)
            lmk_faces = torch.cat([lmk_faces, md.dyn_lmk_faces_idx[idx]])
            lmk_bary = torch.cat(
                [lmk_bary, md.dyn_lmk_bary_coords[idx]], dim=0
            )
        tri_verts = verts[md.faces[lmk_faces]]                 # [L, 3, 3]
        landmarks = torch.einsum("lvc,lv->lc", tri_verts, lmk_bary)
        joints = torch.cat([joints, landmarks], dim=0)
    if md.model_type == "smpl" and md.extra_joint_regressor is not None:
        # SPIN: 9 regressed joints appended before the 49-joint permute
        # (reference models/smpl.py:69-83)
        joints = torch.cat([joints, md.extra_joint_regressor @ verts], dim=0)
    if md.joint_mapper is not None:
        joints = joints[md.joint_mapper]
    return verts, joints, pose


# ---------------------------------------------------------------------------
# The reference loss, exactly as structured (per-view Python loop)
# ---------------------------------------------------------------------------


def gmof(x, sigma):
    """Geman-McClure robustifier (reference loss.py:45-51)."""
    x2 = x ** 2
    s2 = sigma ** 2
    return (s2 * x2) / (s2 + x2)


def reprojection_loss(cord, cord_gt, conf, scale_coeff, sigma):
    """conf^2-weighted gmof reprojection error (reference loss.py:132-136)."""
    err = gmof((cord_gt - cord) / scale_coeff, sigma)
    return ((conf ** 2) * err.sum(dim=-1)).sum(dim=-1)


def angle_prior(pose69):
    """Knee/elbow exponential penalty (reference loss.py:54-61)."""
    idx = [55 - 3, 58 - 3, 12 - 3, 15 - 3]
    signs = torch.tensor([1.0, -1.0, -1.0, -1.0], dtype=pose69.dtype)
    return torch.exp(pose69[idx] * signs) ** 2


def gmm_prior_nll(pose69, means, precisions, log_nll_weights):
    """Max-mixture NLL: min_k 0.5 d^T P_k d - log w'_k
    (reference prior.py:181-196)."""
    diff = pose69[None, :] - means                             # [K, D]
    quad = torch.einsum("kj,kij,ki->k", diff, precisions, diff)
    return (0.5 * quad - log_nll_weights).min()


def multiview_keypoint_loss(
    w2cs, Ks, keypoints, model_joints, body_pose, betas,
    gmm, *, imsize=512.0, sigma=100.0, pose_prior_weight=4.78,
    angle_prior_weight=15.2, shape_prior_weight=5.0, use_hand_face=True,
):
    """The reference's multi-view loss with its per-view Python loop
    (loss.py:139-230): body(25) + hands(21x2) + face(68) reprojection,
    each view-summed then divided by the view count, plus GMM / angle /
    shape priors."""
    n_views = len(w2cs)
    scale_coeff = imsize / 1024.0
    body_l, hand_l, face_l = [], [], []
    nb, nh = 25, 21
    for i in range(n_views):                  # the reference's view loop
        R, t = w2cs[i][:3, :3], w2cs[i][:3, 3]
        cam = model_joints @ R.T + t
        proj = cam @ Ks[i].T
        proj = proj[:, :2] / proj[:, 2:3]
        gt, conf = keypoints[i][:, :2], keypoints[i][:, 2]
        body_l.append(reprojection_loss(
            proj[:nb], gt[:nb], conf[:nb], scale_coeff, sigma))
        if use_hand_face:
            hand_l.append(reprojection_loss(
                proj[nb:nb + nh], gt[nb:nb + nh], conf[nb:nb + nh],
                scale_coeff, sigma))
            hand_l.append(reprojection_loss(
                proj[nb + nh:nb + 2 * nh], gt[nb + nh:nb + 2 * nh],
                conf[nb + nh:nb + 2 * nh], scale_coeff, sigma))
            face_l.append(reprojection_loss(
                proj[nb + 2 * nh:], gt[nb + 2 * nh:], conf[nb + 2 * nh:],
                scale_coeff, sigma))

    loss_2d = torch.stack(body_l).sum() / n_views
    terms = {"body_loss": loss_2d}
    if use_hand_face:
        hand = torch.stack(hand_l).sum() / n_views
        face = torch.stack(face_l).sum() / n_views
        loss_2d = loss_2d + hand + face
        terms["hand_loss"] = hand
        terms["face_loss"] = face

    pose69 = body_pose
    if pose69.shape[-1] < 69:                 # reference loss.py:207
        pose69 = torch.cat(
            [pose69, torch.zeros(69 - pose69.shape[-1], dtype=pose69.dtype)]
        )
    pose_prior_loss = (pose_prior_weight ** 2) * gmm_prior_nll(
        pose69, *gmm
    )
    angle_prior_loss = (angle_prior_weight ** 2) * angle_prior(pose69).sum()
    shape_prior_loss = (shape_prior_weight ** 2) * (betas ** 2).sum()
    total = loss_2d + pose_prior_loss + angle_prior_loss + shape_prior_loss
    terms.update(
        reprojection_loss=loss_2d, pose_prior_loss=pose_prior_loss,
        angle_prior_loss=angle_prior_loss, shape_prior_loss=shape_prior_loss,
    )
    return total, terms


# ---------------------------------------------------------------------------
# Mask (silhouette) loss — reference smplify/loss.py:85-130
# ---------------------------------------------------------------------------


def multiview_mask_loss(
    contours, contour_valid, masks, mask_w2cs, mask_Ks, verts,
    *, vertex_stride=4, epsilon=10.0, imsize=512.0,
):
    """The reference's ``multview_mask_loss`` (loss.py:85-130) on padded
    contour tensors: per contour pixel, distance to the nearest *inside*
    projected (every-4th) SMPL vertex, weighted ``epsilon`` x when the
    matched vertex lands outside the mask, plus the differentiable
    ``grid_sample(1 - mask)`` stay-inside term (loss.py:123-127) — computed
    here with torch's own ``cdist``/``grid_sample``, i.e. a genuinely
    independent arithmetic route from the JAX engine's one-hot matmuls
    (:func:`bodyfitting_tpu.losses.silhouette.silhouette_loss`).

    ``contour_valid`` carries the arc-length-resampling weights (see
    ``losses.silhouette.resample_contours``) so both engines evaluate the
    identical objective.  Matched distances are recomputed through a
    differentiable gather with the same ``+1e-12`` guard as the JAX form
    (the selection itself is piecewise-constant, so the gradient matches
    the reference's backprop-through-cdist).
    """
    import torch.nn.functional as F

    pts3d = verts[::vertex_stride]
    total_icp = verts.new_zeros(())
    total_binary = verts.new_zeros(())
    for i in range(len(masks)):
        w2c, K, mask = mask_w2cs[i], mask_Ks[i], masks[i]
        cam = pts3d @ w2c[:3, :3].T + w2c[:3, 3]
        pr = cam @ K.T
        proj = pr[:, :2] / pr[:, 2:3]
        inside = (
            (proj[:, 0] >= 0) & (proj[:, 0] < imsize)
            & (proj[:, 1] >= 0) & (proj[:, 1] < imsize)
        )
        with torch.no_grad():
            d = torch.cdist(contours[i], proj)                # [P, M]
            d = torch.where(inside[None, :], d, torch.full_like(d, 1e9))
            idx = torch.argmin(d, dim=1)
            in_match = inside[idx]
        matched = proj[idx]                                   # [P, 2] (grad)
        mindist = torch.sqrt(
            ((contours[i] - matched) ** 2).sum(-1) + 1e-12
        )
        mindist = torch.where(
            in_match, mindist, torch.zeros_like(mindist)
        )
        H, W = mask.shape
        with torch.no_grad():
            mx = matched[:, 0].long().clamp(0, W - 1)
            my = matched[:, 1].long().clamp(0, H - 1)
            outside_mask = (mask[my, mx] < 0.1).to(mindist.dtype)
        coeff = outside_mask * (epsilon - 1.0) + 1.0
        total_icp = total_icp + (mindist * coeff * contour_valid[i]).sum()

        # stay-inside: grid_sample(1-mask) with zero padding, the
        # reference's own op (loss.py:123-127).  The reference pins
        # torch==1.2.0 (requirements.txt:2), whose grid_sample predates
        # the align_corners argument and uses align_corners=True
        # semantics (the default flipped to False in torch 1.3) — so
        # True is the reference-as-pinned behaviour.
        uv = (proj / imsize * 2.0 - 1.0).reshape(1, -1, 1, 2)
        comp = F.grid_sample(
            (1.0 - mask)[None, None], uv, mode="bilinear",
            padding_mode="zeros", align_corners=True,
        )
        total_binary = total_binary + comp.sum()
    return total_icp + total_binary * epsilon


# ---------------------------------------------------------------------------
# Exact nearest point-on-mesh — reference mesh_grid CUDA kernel semantics
# (mesh_grid_kernel.cu:240-353), candidate-enumeration algorithm
# ---------------------------------------------------------------------------


def _closest_on_tris(p, a, b, c):
    """Closest point to each ``p [Q,1,3]`` on each triangle ``a/b/c
    [1,F,3]`` -> ``[Q,F,3]``.

    Candidate enumeration (plane projection when its barycentrics are all
    non-negative, else the best of the three clamped edge projections) — a
    deliberately different decomposition from the JAX engine's branchless
    Voronoi-region form (ops/nearest.py), so the two routes cross-check.
    """
    def seg(s0, s1):
        d = s1 - s0
        t = ((p - s0) * d).sum(-1) / (d * d).sum(-1).clamp_min(1e-30)
        return s0 + t.clamp(0.0, 1.0).unsqueeze(-1) * d

    pe = torch.stack([seg(a, b), seg(b, c), seg(c, a)], dim=-2)  # [Q,F,3,3]
    d2e = ((p.unsqueeze(-2) - pe) ** 2).sum(-1)                  # [Q,F,3]
    k = d2e.argmin(-1)
    best_edge = torch.gather(
        pe, -2, k[..., None, None].expand(*k.shape, 1, 3)
    ).squeeze(-2)                                                # [Q,F,3]

    n = torch.cross(b - a, c - a, dim=-1)                        # [1,F,3]
    nn = (n * n).sum(-1)
    h = ((p - a) * n).sum(-1) / nn.clamp_min(1e-30)
    pin = p - h.unsqueeze(-1) * n                                # [Q,F,3]
    w0 = (torch.cross(c - b, pin - b, dim=-1) * n).sum(-1)
    w1 = (torch.cross(a - c, pin - c, dim=-1) * n).sum(-1)
    w2 = (torch.cross(b - a, pin - a, dim=-1) * n).sum(-1)
    interior = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (nn > 1e-30)
    return torch.where(interior.unsqueeze(-1), pin, best_edge)


def nearest_points_on_mesh(points, scan_verts, scan_faces,
                           point_chunk=1024, face_chunk=8192, prune=True):
    """Exact nearest point + face index on a triangle mesh (the quantity
    the reference's CUDA grid walk returns, mesh_grid.cpp:54 ->
    mesh_grid_kernel.cu:240-353).  Non-differentiable by contract (the
    reference's autograd backward is disabled; callers detach —
    utils/mesh_grid_searcher.py:17-49, loss.py:240).

    Returns ``(closest [Q,3], face_idx [Q] long)``.

    Tie-breaking matches ``ops.nearest.nearest_point_on_mesh``: among all
    faces within ``best + 32 eps (best + bbox_diag^2)`` of the minimum
    (queries in an edge's Voronoi region are equidistant from both
    incident faces), the LOWEST face index wins, so both engines report
    the same face for the normal loss regardless of rounding order.

    ``prune=True`` (default) first discards faces whose AABB lower-bound
    distance provably exceeds a per-query upper bound (the nearest
    face-vertex) plus the tie threshold's margin, then runs the identical
    ``_closest_on_tris`` arithmetic on the surviving candidates — the
    result is bit-identical to the brute-force path (asserted by
    ``tests/test_parity.py::test_nearest_oracle_pruned_bit_identical``)
    at ~20x less arithmetic, which is
    what makes multi-seed f64 parity studies affordable on one CPU core.

    Chunk knobs: ``point_chunk`` caps the query-chunk size on BOTH paths
    (the pruned path additionally shrinks it so its [Qc, F] transients
    stay ~30M elements); ``face_chunk`` applies only to ``prune=False``
    (the pruned path never materializes per-face-chunk transients).
    """
    if prune:
        return _nearest_points_on_mesh_pruned(
            points, scan_verts, scan_faces, max_point_chunk=point_chunk
        )
    with torch.no_grad():
        tri = scan_verts[scan_faces]                             # [F,3,3]
        Q = points.shape[0]
        F_ = tri.shape[0]
        ext = scan_verts.max(0).values - scan_verts.min(0).values
        diag2 = (ext * ext).sum()
        eps = torch.finfo(points.dtype).eps
        out_pts = torch.empty_like(points)
        out_idx = torch.empty(Q, dtype=torch.long)
        for q0 in range(0, Q, point_chunk):
            p = points[q0:q0 + point_chunk].unsqueeze(1)         # [Qc,1,3]
            best_d2 = None
            d2_chunks = []                     # kept for the tie pass
            for f0 in range(0, F_, face_chunk):
                t = tri[f0:f0 + face_chunk]
                cp = _closest_on_tris(
                    p, t[None, :, 0], t[None, :, 1], t[None, :, 2]
                )                                                # [Qc,Fc,3]
                d2 = ((p - cp) ** 2).sum(-1)                     # [Qc,Fc]
                d2_chunks.append(d2)
                dmin, _ = d2.min(dim=1)
                best_d2 = dmin if best_d2 is None \
                    else torch.minimum(best_d2, dmin)
            thresh = best_d2 + 32.0 * eps * (best_d2 + diag2)
            low = torch.full_like(out_idx[q0:q0 + p.shape[0]], 2**60)
            for fi, f0 in enumerate(range(0, F_, face_chunk)):
                d2 = d2_chunks[fi]
                fidx = torch.arange(f0, f0 + d2.shape[1])[None, :]
                cand = torch.where(
                    d2 <= thresh[:, None], fidx,
                    torch.full_like(fidx, 2**60),
                )
                low = torch.minimum(low, cand.min(dim=1).values)
            tri_tb = tri[low]                                    # [Qc,3,3]
            pt = _closest_on_tris(
                p[:, 0, :].unsqueeze(1),
                tri_tb[:, None, 0], tri_tb[:, None, 1], tri_tb[:, None, 2],
            )[:, 0, :]
            out_pts[q0:q0 + p.shape[0]] = pt
            out_idx[q0:q0 + p.shape[0]] = low
        return out_pts, out_idx


def _nearest_points_on_mesh_pruned(points, scan_verts, scan_faces,
                                   max_point_chunk=1024):
    """AABB-pruned exact nearest (see :func:`nearest_points_on_mesh`).

    Per query chunk: (1) upper bound ``ub`` = min squared distance to any
    face's first vertex (a real point on the mesh); (2) lower bound per
    face = squared distance to the face's AABB; (3) candidates = faces
    with ``lb <= ub + margin`` where the margin dominates both float
    rounding of lb/ub (few-eps relative) and the tie threshold
    ``32 eps (best + diag^2)`` the brute-force path scans with — so every
    face the brute force could select survives pruning; (4) the original
    ``_closest_on_tris`` + tie-break arithmetic on the candidates only.
    """
    with torch.no_grad():
        tri = scan_verts[scan_faces]                             # [F,3,3]
        Q, F_ = points.shape[0], tri.shape[0]
        lo = tri.min(dim=1).values                               # [F,3]
        hi = tri.max(dim=1).values
        v0 = tri[:, 0]                                           # [F,3]
        ext = scan_verts.max(0).values - scan_verts.min(0).values
        diag2 = (ext * ext).sum()
        eps = torch.finfo(points.dtype).eps
        out_pts = torch.empty_like(points)
        out_idx = torch.empty(Q, dtype=torch.long)
        # [Qc, F] transients bound the chunk size (~30M f64 elements);
        # the caller's point_chunk is respected as an upper bound
        point_chunk = max(
            32, min(max_point_chunk, int(3e7) // max(F_, 1))
        )
        for q0 in range(0, Q, point_chunk):
            pq = points[q0:q0 + point_chunk]                     # [Qc,3]
            Qc = pq.shape[0]
            ub = ((pq[:, None, :] - v0[None]) ** 2).sum(-1).min(1).values
            clamped = torch.clamp(pq[:, None, :], lo[None], hi[None])
            lb = ((clamped - pq[:, None, :]) ** 2).sum(-1)       # [Qc,F]
            margin = 256.0 * eps * (ub + diag2)
            cand = lb <= (ub + margin)[:, None]                  # [Qc,F]
            K = int(cand.sum(1).max())
            # candidate columns first, preserving ascending face order
            order = torch.argsort(~cand, dim=1, stable=True)[:, :K]
            padmask = torch.gather(cand, 1, order)               # [Qc,K]
            tri_c = tri[order]                                   # [Qc,K,3,3]
            cp = _closest_on_tris(
                pq.unsqueeze(1), tri_c[..., 0, :], tri_c[..., 1, :],
                tri_c[..., 2, :],
            )                                                    # [Qc,K,3]
            d2 = ((pq.unsqueeze(1) - cp) ** 2).sum(-1)           # [Qc,K]
            d2 = torch.where(padmask, d2, torch.full_like(d2, float("inf")))
            best_d2 = d2.min(dim=1).values
            thresh = best_d2 + 32.0 * eps * (best_d2 + diag2)
            fcand = torch.where(
                d2 <= thresh[:, None], order,
                torch.full_like(order, 2**60),
            )
            low = fcand.min(dim=1).values
            tri_tb = tri[low]
            pt = _closest_on_tris(
                pq.unsqueeze(1),
                tri_tb[:, None, 0], tri_tb[:, None, 1], tri_tb[:, None, 2],
            )[:, 0, :]
            out_pts[q0:q0 + Qc] = pt
            out_idx[q0:q0 + Qc] = low
        return out_pts, out_idx


# ---------------------------------------------------------------------------
# Mesh-fitting losses — reference smplify/loss.py:233-288
# ---------------------------------------------------------------------------


def point_cloud_loss(points, closest):
    """Frobenius norm of the residual to detached closest points — the
    reference's ``torch.norm(points - closest.detach(), p=2)`` then
    ``mean`` of the scalar (loss.py:233-242), with the JAX engine's
    ``+1e-20`` sqrt guard so both engines share one formula."""
    diff = points.reshape(-1, 3) - closest.detach()
    return torch.sqrt((diff * diff).sum() + 1e-20)


def normal_loss(point_normals, scan_face_normals, face_idx):
    """``mean(1 - <closest-face normal, point normal>)`` with the scan's
    *unnormalised* face cross products, exactly as the reference passes
    them (smplify.py:149, loss.py:260-271)."""
    closest_fn = scan_face_normals[face_idx]
    return (1.0 - (closest_fn * point_normals.reshape(-1, 3)).sum(-1)).mean()


def normal_laplacian_smoothness(normals, faces):
    """1-hop normal MSE over triangle edges (reference loss.py:273-288)."""
    na, nb, nc = normals[faces[:, 0]], normals[faces[:, 1]], normals[faces[:, 2]]
    mse = lambda x, y: ((x - y) ** 2).sum(-1)  # noqa: E731
    return (mse(na, nb) + mse(nc, na) + mse(nb, nc)).mean()


def compute_vertex_normals(verts, faces):
    """Reference ``compute_normal_torch`` (io_utils.py:409-428): unit face
    normals (``/(|n|+1e-8)``) scatter-summed per vertex, renormalised —
    the same formula as the JAX ``losses.mesh.compute_vertex_normals``."""
    tris = verts[faces]
    fn = torch.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0], dim=-1)
    fn = fn / (fn.norm(dim=-1, keepdim=True) + 1e-8)
    vn = torch.zeros_like(verts)
    for k in range(3):
        vn = vn.index_add(0, faces[:, k], fn)
    return vn / (vn.norm(dim=-1, keepdim=True) + 1e-8)


def compute_face_normals(verts, faces):
    """Unnormalised face cross products (reference smplify.py:148-149)."""
    tris = verts[faces]
    return torch.cross(
        tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0], dim=-1
    )


# ---------------------------------------------------------------------------
# The reference optimization loop
# ---------------------------------------------------------------------------


def smplify_fit(
    md: TorchBodyModel,
    w2cs: np.ndarray,            # [Vw, 4, 4]
    Ks: np.ndarray,              # [Vw, 3, 3]
    keypoints: np.ndarray,       # [Vw, K, 3]
    gmm_arrays,                  # (means, precisions, log_nll_weights) np
    *,
    constant_scale: float = 0.3,
    num_iters: int = 600,
    step_size: float = 1e-2,
    imsize: float = 512.0,
    init_betas: Optional[np.ndarray] = None,
    init_global_orient: Optional[np.ndarray] = None,
    init_body_pose: Optional[np.ndarray] = None,
    num_betas: int = 10,
    num_expressions: int = 10,
    dtype=torch.float32,
    use_mask: bool = False,
    mask_data: Optional[dict] = None,
    use_mesh: bool = False,
    scan: Optional[dict] = None,
    displacement: bool = False,
    mask_weight: float = 5.0,
    pc_weight: float = 5.0,
    disp_lr: float = 5e-2,
):
    """Re-enact the reference optimization loop (smplify/smplify.py:84-250).

    Structure preserved exactly: zero-initialized hand/face poses and
    translation, unit scale (smplify.py:117-128); Adam with lr=0.1 groups
    for global_transl and body_scale, lr=step_size for everything else,
    with jaw_pose requires_grad **but omitted from opt_params** so it never
    moves (smplify.py:118,167-174); 600 iterations of forward -> per-view
    keypoint loss -> backward -> step (smplify.py:177-213); joints/vertices
    scaled ``(x + transl) * body_scale * constant_scale`` (smplify.py:189-190).

    Staged terms (smplify.py:196-210): after iteration ``num_iters // 3``,
    the mask loss (x ``mask_weight``) and/or the point-cloud loss
    (``/ scan_height * imsize``, x ``pc_weight``) join the objective.
    ``mask_data`` = dict(contours [Vm,P,2], contour_valid [Vm,P],
    masks [Vm,H,W], w2cs [Vm,4,4], Ks [Vm,3,3]); ``scan`` = dict(verts
    [N,3], faces [F,3]).  With ``displacement=True`` (and use_mesh) a
    second ``num_iters`` Adam(lr=``disp_lr``) stage fits per-vertex
    displacements with ICP + normal + Laplacian losses combined as
    ``icp + (nl + sm) * constant_scale * 0.1`` (smplify.py:228-247).

    Returns a dict matching the reference output schema (smplify.py:216-226)
    plus the per-iteration total-loss trace, with vertices/joints computed
    from the *final* parameters (one extra forward vs the reference's
    pre-last-step snapshot; documented divergence shared with the JAX engine).
    """
    dt = dtype
    nb_pose = 69 if md.model_type == "smpl" else 63
    use_hand_face = md.model_type == "smplx"

    def init_param(val, shape):
        if val is None:
            x = torch.zeros(shape, dtype=dt)
        else:
            x = torch.as_tensor(np.asarray(val), dtype=dt).clone()
        x.requires_grad_(True)
        return x

    body_pose = init_param(init_body_pose, (nb_pose,))
    betas = init_param(init_betas, (num_betas,))
    global_orient = init_param(init_global_orient, (3,))
    expression = init_param(None, (num_expressions,)) \
        if use_hand_face else None
    jaw_pose = init_param(None, (3,))
    leye_pose = init_param(None, (3,))
    reye_pose = init_param(None, (3,))
    left_hand_pose = init_param(None, (md.num_hand_pca,))
    right_hand_pose = init_param(None, (md.num_hand_pca,))
    global_transl = init_param(None, (3,))
    body_scale = torch.ones(1, dtype=dt, requires_grad=True)

    opt_params = [
        {"params": [global_transl], "lr": 0.1},
        {"params": [body_scale], "lr": 0.1},
        {"params": [body_pose]}, {"params": [betas]},
        {"params": [global_orient]},
        {"params": [leye_pose]}, {"params": [reye_pose]},
        {"params": [left_hand_pose]}, {"params": [right_hand_pose]},
    ]
    # NOTE: jaw_pose (and expression) deliberately absent, as in the
    # reference (smplify.py:167-173); face keypoints still enter the loss.
    optimizer = torch.optim.Adam(opt_params, lr=step_size, betas=(0.9, 0.999))

    w2cs_t = [torch.as_tensor(w, dtype=dt) for w in w2cs]
    Ks_t = [torch.as_tensor(k, dtype=dt) for k in Ks]
    kps_t = [torch.as_tensor(k, dtype=dt) for k in keypoints]
    gmm = tuple(torch.as_tensor(np.asarray(g), dtype=dt) for g in gmm_arrays)

    if use_mask:
        m_contours = torch.as_tensor(
            np.asarray(mask_data["contours"]), dtype=dt)
        m_valid = torch.as_tensor(
            np.asarray(mask_data["contour_valid"]), dtype=dt)
        m_masks = torch.as_tensor(np.asarray(mask_data["masks"]), dtype=dt)
        m_w2cs = torch.as_tensor(np.asarray(mask_data["w2cs"]), dtype=dt)
        m_Ks = torch.as_tensor(np.asarray(mask_data["Ks"]), dtype=dt)
    if use_mesh:
        scan_verts = torch.as_tensor(np.asarray(scan["verts"]), dtype=dt)
        scan_faces = torch.as_tensor(
            np.asarray(scan["faces"]), dtype=torch.long)
        # reference smplify.py:150-151: height along y
        scan_height = float(
            (scan_verts.max(0).values - scan_verts.min(0).values)[1]
        )

    def params_dict():
        d = dict(
            betas=betas, global_orient=global_orient, body_pose=body_pose,
            jaw_pose=jaw_pose, leye_pose=leye_pose, reye_pose=reye_pose,
            left_hand_pose=left_hand_pose, right_hand_pose=right_hand_pose,
        )
        if expression is not None:
            d["expression"] = expression
        return d

    trace = []
    term_trace = []
    gate = num_iters // 3
    for i in range(num_iters):
        verts, joints, _ = forward(md, params_dict())
        scale = body_scale * constant_scale
        model_joints = (joints + global_transl) * scale
        loss, terms = multiview_keypoint_loss(
            w2cs_t, Ks_t, kps_t, model_joints, body_pose, betas, gmm,
            imsize=imsize, use_hand_face=use_hand_face,
        )
        if (use_mask or use_mesh) and i > gate:
            body_vertices = (verts + global_transl) * scale
            if use_mask:
                mask_l = multiview_mask_loss(
                    m_contours, m_valid, m_masks, m_w2cs, m_Ks,
                    body_vertices, imsize=imsize,
                )
                loss = loss + mask_weight * mask_l
                terms["mask_loss"] = mask_l
            if use_mesh:
                closest, _ = nearest_points_on_mesh(
                    body_vertices.detach(), scan_verts, scan_faces
                )
                pc_l = point_cloud_loss(body_vertices, closest) \
                    / scan_height * imsize
                loss = loss + pc_weight * pc_l
                terms["pc_loss"] = pc_l
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        trace.append(float(loss.detach()))
        term_trace.append({k: float(v.detach()) for k, v in terms.items()})

    with torch.no_grad():
        verts, joints, full_pose = forward(md, params_dict())
        scale = body_scale * constant_scale
        body_vertices_final = (verts + global_transl) * scale
        result = {
            "vertices": body_vertices_final.numpy(),
            "joints": ((joints + global_transl) * scale).numpy(),
            "pose": body_pose.numpy(),
            "betas": betas.numpy(),
            "global_orient": global_orient.numpy(),
            "global_transl": (global_transl * body_scale).numpy(),
            "scale": body_scale.numpy(),
            "full_pose": full_pose.numpy(),
            "loss_trace": np.asarray(trace),
            "term_trace": term_trace,
        }

    if displacement and use_mesh:
        # Stage 2 (smplify.py:228-247): per-vertex displacement to the scan.
        # Like the JAX engine (fitting/smplify.fit), the body vertices come
        # from the *final* parameters (documented divergence from the
        # reference's pre-last-step snapshot, shared by both engines).
        bv = body_vertices_final.detach()
        disp = torch.zeros_like(bv, requires_grad=True)
        d_opt = torch.optim.Adam([disp], lr=disp_lr, betas=(0.9, 0.999))
        scan_fn = compute_face_normals(scan_verts, scan_faces)
        cs = torch.as_tensor(constant_scale, dtype=dt)
        disp_trace = []
        for _ in range(num_iters):
            deformed = bv + disp
            deformed_norms = compute_vertex_normals(deformed, md.faces)
            closest, face_idx = nearest_points_on_mesh(
                deformed.detach(), scan_verts, scan_faces
            )
            icp = point_cloud_loss(deformed, closest)
            nl = normal_loss(deformed_norms, scan_fn, face_idx)
            sm = normal_laplacian_smoothness(deformed_norms, md.faces)
            loss = icp + (nl + sm) * cs * 0.1
            d_opt.zero_grad()
            loss.backward()
            d_opt.step()
            disp_trace.append(float(loss.detach()))
        result["displacement"] = disp.detach().numpy()
        result["disp_loss_trace"] = np.asarray(disp_trace)

    return result
