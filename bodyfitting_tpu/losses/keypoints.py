"""Multi-view 2D keypoint reprojection losses, fully batched over views.

Functional re-design of the reference loss library (smplify/loss.py:45-230):
where the reference loops over cameras in Python (loss.py:156), these take a
padded view axis and reduce with confidence/view masks, so the whole
multi-view loss is one fused XLA computation that ``vmap``s over frames.

Keypoint tensor convention: ``[num_views, K, 3]`` with columns ``(u, v,
confidence)``; padding views/joints carry confidence 0, which zeroes their
contribution exactly like the reference's confidence weighting (loss.py:134).
For SMPL-X the face block must already be in model order (51 inner + 17
contour), i.e. OpenPose face JSONs get the FACE_MAPPING permutation applied
at load time (reference smplify/loss.py:20,178).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.constants import NUM_BODY_KP, NUM_HAND_KP
from bodyfitting_tpu.ops.camera import perspective_projection

# Body-pose indices (global orient excluded) and signs of the knee/elbow
# angle prior (reference smplify/loss.py:54-61): left/right elbow z, left/
# right knee x, signed so that natural bending decreases the penalty.
# numpy on purpose: a module-level jnp.array would run a device op at
# import time, committing the JAX backend before callers can pin a
# platform (CLAUDE.md: config.update must precede any array op).
_ANGLE_PRIOR_IDXS = np.array([55 - 3, 58 - 3, 12 - 3, 15 - 3])
_ANGLE_PRIOR_SIGNS = np.array([1.0, -1.0, -1.0, -1.0], np.float32)


def gmof(x: jax.Array, sigma: float) -> jax.Array:
    """Geman-McClure robustifier (reference loss.py:45-51)."""
    x2 = x * x
    s2 = sigma * sigma
    return (s2 * x2) / (s2 + x2)


def reprojection_loss(
    cord: jax.Array, cord_gt: jax.Array, conf: jax.Array,
    scale_coeff: float, sigma: float,
) -> jax.Array:
    """Confidence-weighted robust 2D error, summed over joints.

    cord/cord_gt: ``[..., K, 2]``; conf: ``[..., K]``.  Matches reference
    loss.py:132-136: ``sum_k conf_k^2 * sum_xy gmof((gt-pred)/scale)``.
    """
    err = gmof((cord_gt - cord) / scale_coeff, sigma).sum(axis=-1)
    return (conf * conf * err).sum(axis=-1)


def angle_prior(body_pose: jax.Array) -> jax.Array:
    """Exponential penalty on unnatural knee/elbow bending (loss.py:54-61)."""
    sel = body_pose[..., _ANGLE_PRIOR_IDXS] * _ANGLE_PRIOR_SIGNS
    return jnp.exp(sel) ** 2


def multiview_keypoint_loss(
    w2cs: jax.Array,
    Ks: jax.Array,
    keypoints: jax.Array,
    view_mask: jax.Array,
    model_joints: jax.Array,
    body_pose69: jax.Array,
    betas: jax.Array,
    pose_prior_fn,
    *,
    imsize: float = 512.0,
    sigma: float = 100.0,
    pose_prior_weight: float = 4.78,
    angle_prior_weight: float = 15.2,
    shape_prior_weight: float = 5.0,
    use_hand_face: bool = False,
    num_views_used=None,
    view_chunk: int = 0,
) -> tuple[jax.Array, dict]:
    """Total multi-view keypoint objective for one frame.

    Args:
      w2cs: ``[Vw, 4, 4]`` world-to-camera transforms.
      Ks: ``[Vw, 3, 3]`` intrinsics.
      keypoints: ``[Vw, K, 3]`` (u, v, conf); K = 25, or 135 with hands+face.
      view_mask: ``[Vw]`` 1.0 for real views, 0.0 for padding.
      num_views_used: denominator of the per-view sums — the reference
        divides by ``len(use_frames)``, the number of views *with images*
        (loss.py:197), which can be smaller than the padded axis.  Pass
        that count (scalar, possibly traced) for exact parity; defaults
        to the padded view count.
      model_joints: ``[J, 3]`` posed joints, first 25 in OpenPose body order,
        then 21+21 hand and 68 face keypoints when ``use_hand_face``.
      body_pose69: ``[69]`` body pose; SMPL-X's 63 must be zero-padded to 69
        by the caller's wrapper (reference loss.py:207).
      betas: ``[S]`` shape coefficients.
      pose_prior_fn: callable ``[69] -> scalar`` negative log-likelihood.
      view_chunk: when > 0 and a divisor of ``Vw``, accumulate the
        per-view reprojection terms over blocks of ``view_chunk`` views
        with a rematerialized ``lax.scan`` body instead of one vmap over
        all views.  Mathematically identical (a re-associated sum); the
        point is memory: under frame-batched ``vmap`` the all-views
        transient is ``[B, Vw, K, 2]`` per iteration and stops staying
        on-chip at long sequences (B >= ~600) — chunking caps it at
        ``[B, view_chunk, K, 2]`` and the checkpointed body recomputes
        projections in the backward pass (cheap next to the LBS forward).

    Returns ``(scalar_loss, dict_of_terms)``.
    """
    scale_coeff = imsize / 1024.0
    num_views = (
        num_views_used if num_views_used is not None else w2cs.shape[0]
    )

    def per_view(w2c, K, kp):
        proj = perspective_projection(
            model_joints[None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
        )[0]
        gt, conf = kp[..., :2], kp[..., 2]
        nb = NUM_BODY_KP
        body = reprojection_loss(
            proj[:nb], gt[:nb], conf[:nb], scale_coeff, sigma
        )
        if not use_hand_face:
            return body, jnp.zeros(()), jnp.zeros(())
        nh = NUM_HAND_KP
        lh = reprojection_loss(
            proj[nb:nb + nh], gt[nb:nb + nh], conf[nb:nb + nh],
            scale_coeff, sigma,
        )
        rh = reprojection_loss(
            proj[nb + nh:nb + 2 * nh], gt[nb + nh:nb + 2 * nh],
            conf[nb + nh:nb + 2 * nh], scale_coeff, sigma,
        )
        face = reprojection_loss(
            proj[nb + 2 * nh:], gt[nb + 2 * nh:], conf[nb + 2 * nh:],
            scale_coeff, sigma,
        )
        return body, lh + rh, face

    Vw = w2cs.shape[0]
    if view_chunk and 0 < view_chunk < Vw and Vw % view_chunk == 0:
        nc = Vw // view_chunk

        @jax.checkpoint
        def chunk_sums(w2c_c, K_c, kp_c, vm_c):
            b, h, f = jax.vmap(per_view)(w2c_c, K_c, kp_c)
            return (
                jnp.sum(b * vm_c), jnp.sum(h * vm_c), jnp.sum(f * vm_c),
            )

        def scan_body(acc, blk):
            b, h, f = chunk_sums(*blk)
            return (acc[0] + b, acc[1] + h, acc[2] + f), None

        blocks = (
            w2cs.reshape(nc, view_chunk, 4, 4),
            Ks.reshape(nc, view_chunk, 3, 3),
            keypoints.reshape(nc, view_chunk, *keypoints.shape[1:]),
            view_mask.reshape(nc, view_chunk),
        )
        (body_sum, hand_sum, face_sum), _ = jax.lax.scan(
            scan_body,
            (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
            blocks,
        )
        body_loss = body_sum / num_views
        hand_loss = hand_sum / num_views
        face_loss = face_sum / num_views
    else:
        body_l, hand_l, face_l = jax.vmap(per_view)(w2cs, Ks, keypoints)
        body_loss = jnp.sum(body_l * view_mask) / num_views
        hand_loss = jnp.sum(hand_l * view_mask) / num_views
        face_loss = jnp.sum(face_l * view_mask) / num_views
    loss_2d = body_loss
    if use_hand_face:
        loss_2d = loss_2d + hand_loss + face_loss

    pose_prior_loss = (pose_prior_weight ** 2) * pose_prior_fn(body_pose69)
    angle_prior_loss = (angle_prior_weight ** 2) * angle_prior(
        body_pose69
    ).sum(axis=-1)
    shape_prior_loss = (shape_prior_weight ** 2) * jnp.sum(betas ** 2, axis=-1)

    total = loss_2d + pose_prior_loss + angle_prior_loss + shape_prior_loss
    terms = {
        "reprojection_loss": loss_2d,
        "body_loss": body_loss,
        "hand_loss": hand_loss,
        "face_loss": face_loss,
        "pose_prior_loss": pose_prior_loss,
        "angle_prior_loss": angle_prior_loss,
        "shape_prior_loss": shape_prior_loss,
    }
    return total, terms
