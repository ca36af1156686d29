"""Slow, loop-based numpy implementation of the SMPL formulation.

Written directly from the SMPL paper's equations (Loper et al., SIGGRAPH
Asia 2015) with explicit per-joint/per-vertex loops, deliberately NOT
sharing code with the vectorised JAX implementation — used as the oracle
in differential tests.
"""

import numpy as np


def rodrigues_np(aa):
    """One axis-angle vector [3] -> rotation matrix [3,3] (Rodrigues)."""
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    K = np.array([
        [0, -k[2], k[1]],
        [k[2], 0, -k[0]],
        [-k[1], k[0], 0],
    ])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def lbs_np(
    v_template, shapedirs, posedirs, J_regressor, weights, parents,
    betas, full_pose_aa, expr_dirs=None, expression=None,
):
    """Single-frame SMPL forward with loops.

    shapedirs/posedirs/expr_dirs given as [S, 3V]-style flattened bases
    (same storage as the JAX model), v_template [V,3].
    """
    V = v_template.shape[0]
    J = J_regressor.shape[0]

    # 1. Shape blendshapes.
    v_shaped = v_template.copy()
    for s in range(len(betas)):
        v_shaped = v_shaped + betas[s] * shapedirs[s].reshape(V, 3)
    if expr_dirs is not None and expression is not None:
        for e in range(len(expression)):
            v_shaped = v_shaped + expression[e] * expr_dirs[e].reshape(V, 3)

    # 2. Rest joints.
    joints_rest = J_regressor @ v_shaped

    # 3. Per-joint rotation matrices and pose blendshapes.
    pose = np.asarray(full_pose_aa, dtype=np.float64).reshape(J, 3)
    R = np.stack([rodrigues_np(pose[j]) for j in range(J)])
    pose_feature = np.concatenate(
        [(R[j] - np.eye(3)).reshape(-1) for j in range(1, J)]
    )
    v_posed = v_shaped.copy()
    for p in range(len(pose_feature)):
        v_posed = v_posed + pose_feature[p] * posedirs[p].reshape(V, 3)

    # 4. Kinematic chain (world transforms).
    G = [None] * J
    for j in range(J):
        T = np.eye(4)
        T[:3, :3] = R[j]
        if parents[j] == -1:
            T[:3, 3] = joints_rest[j]
            G[j] = T
        else:
            T[:3, 3] = joints_rest[j] - joints_rest[parents[j]]
            G[j] = G[parents[j]] @ T
    posed_joints = np.stack([G[j][:3, 3] for j in range(J)])

    # 5. Remove rest-pose joint locations ("inverse bind").
    A = []
    for j in range(J):
        Gj = G[j].copy()
        Gj[:3, 3] -= Gj[:3, :3] @ joints_rest[j]
        A.append(Gj)

    # 6. Per-vertex skinning.
    verts = np.zeros_like(v_posed)
    for v in range(V):
        T = np.zeros((4, 4))
        for j in range(J):
            T += weights[v, j] * A[j]
        verts[v] = T[:3, :3] @ v_posed[v] + T[:3, 3]
    return verts, posed_joints
