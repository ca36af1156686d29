"""OpenPose body/hand/face networks in Flax (the in-repo keypoint detector).

The reference vendors a PyTorch reimplementation of CMU OpenPose
(/root/reference/openpose/model.py) as a fallback for the external binary;
here the published architectures — the VGG19-prefix backbone with 6 CPM
refinement stages producing 38 PAF + 19 heatmap channels (body), the
22-channel hand network, and the 71-channel face network (which the
reference's fallback lacks — the binary provides it via ``--face``) — are
Flax modules whose layer names match the released ``body_pose_model.pth``
/ ``hand_pose_model.pth`` (and face-port) checkpoints, so the public
weights convert directly (OIHW -> HWIO).

With converted weights, :mod:`bodyfitting_tpu.models.openpose_infer` is a
drop-in replacement for the OpenPose binary: it writes the same per-image
keypoint JSONs the fitting pipeline ingests.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _Conv(nn.Module):
    features: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.features, (self.kernel, self.kernel),
            padding=self.kernel // 2, name="conv",
        )(x)
        return nn.relu(y) if self.relu else y


def _pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class BodyPoseNet(nn.Module):
    """Input ``[B, H, W, 3]`` (x/256 - 0.5) -> (paf ``[B,H/8,W/8,38]``,
    heatmap ``[B,H/8,W/8,19]``)."""

    @nn.compact
    def __call__(self, x):
        # --- backbone (torch 'model0') -----------------------------------
        spec0 = [
            ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool",),
            ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool",),
            ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
            ("conv3_4", 256, 3), ("pool",),
            ("conv4_1", 512, 3), ("conv4_2", 512, 3),
            ("conv4_3_CPM", 256, 3), ("conv4_4_CPM", 128, 3),
        ]
        for s in spec0:
            if s[0] == "pool":
                x = _pool(x)
            else:
                x = _Conv(s[1], s[2], name=s[0])(x)
        feat = x

        def branch(stage, L, out_ch):
            def run(inp):
                y = inp
                if stage == 1:
                    for i in range(1, 4):
                        y = _Conv(128, 3, name=f"conv5_{i}_CPM_L{L}")(y)
                    y = _Conv(512, 1, name=f"conv5_4_CPM_L{L}")(y)
                    y = _Conv(out_ch, 1, relu=False,
                              name=f"conv5_5_CPM_L{L}")(y)
                else:
                    for i in range(1, 6):
                        y = _Conv(128, 7,
                                  name=f"Mconv{i}_stage{stage}_L{L}")(y)
                    y = _Conv(128, 1, name=f"Mconv6_stage{stage}_L{L}")(y)
                    y = _Conv(out_ch, 1, relu=False,
                              name=f"Mconv7_stage{stage}_L{L}")(y)
                return y
            return run

        paf = branch(1, 1, 38)(feat)
        hm = branch(1, 2, 19)(feat)
        for stage in range(2, 7):
            inp = jnp.concatenate([paf, hm, feat], axis=-1)   # 185 ch
            paf = branch(stage, 1, 38)(inp)
            hm = branch(stage, 2, 19)(inp)
        return paf, hm


class HandPoseNet(nn.Module):
    """Input ``[B, H, W, 3]`` -> heatmaps ``[B, H/8, W/8, 22]``."""

    @nn.compact
    def __call__(self, x):
        spec0 = [
            ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool",),
            ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool",),
            ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
            ("conv3_4", 256, 3), ("pool",),
            ("conv4_1", 512, 3), ("conv4_2", 512, 3), ("conv4_3", 512, 3),
            ("conv4_4", 512, 3), ("conv5_1", 512, 3), ("conv5_2", 512, 3),
            ("conv5_3_CPM", 128, 3),
        ]
        for s in spec0:
            if s[0] == "pool":
                x = _pool(x)
            else:
                x = _Conv(s[1], s[2], name=s[0])(x)
        feat = x
        y = _Conv(512, 1, name="conv6_1_CPM")(feat)
        y = _Conv(22, 1, relu=False, name="conv6_2_CPM")(y)
        for stage in range(2, 7):
            inp = jnp.concatenate([y, feat], axis=-1)          # 150 ch
            for i in range(1, 6):
                inp = _Conv(128, 7, name=f"Mconv{i}_stage{stage}")(inp)
            inp = _Conv(128, 1, name=f"Mconv6_stage{stage}")(inp)
            y = _Conv(22, 1, relu=False, name=f"Mconv7_stage{stage}")(inp)
        return y


class FacePoseNet(nn.Module):
    """Input ``[B, H, W, 3]`` -> heatmaps ``[B, H/8, W/8, 71]``.

    The published CMU OpenPose face network (``pose_iter_116000``
    deploy prototxt): full VGG19 prefix through ``conv5_2`` plus
    ``conv5_3_CPM``, a 1x1 stage-1 head, and 5 refinement stages over
    ``concat(prev, feat)`` — 70 face keypoints + background.  This is the
    net behind the binary's ``--face`` flag the reference invokes
    (/root/reference/apps/genebody_fitting.py:148); the reference's
    in-repo fallback lacks it entirely.
    """

    @nn.compact
    def __call__(self, x):
        spec0 = [
            ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool",),
            ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool",),
            ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
            ("conv3_4", 256, 3), ("pool",),
            ("conv4_1", 512, 3), ("conv4_2", 512, 3), ("conv4_3", 512, 3),
            ("conv4_4", 512, 3), ("conv5_1", 512, 3), ("conv5_2", 512, 3),
            ("conv5_3_CPM", 128, 3),
        ]
        for s in spec0:
            if s[0] == "pool":
                x = _pool(x)
            else:
                x = _Conv(s[1], s[2], name=s[0])(x)
        feat = x
        y = _Conv(512, 1, name="conv6_1_CPM")(feat)
        y = _Conv(71, 1, relu=False, name="conv6_2_CPM")(y)
        for stage in range(2, 7):
            inp = jnp.concatenate([y, feat], axis=-1)          # 199 ch
            for i in range(1, 6):
                inp = _Conv(128, 7, name=f"Mconv{i}_stage{stage}")(inp)
            inp = _Conv(128, 1, name=f"Mconv6_stage{stage}")(inp)
            y = _Conv(71, 1, relu=False, name=f"Mconv7_stage{stage}")(inp)
        return y


def convert_openpose_torch(state_dict: dict, variables: dict) -> dict:
    """Map a released OpenPose .pth state dict onto the Flax tree.

    The torch checkpoints key conv layers as ``<block>.<layer>.weight``
    (the reference strips the block prefix, openpose/util.py:35-39); the
    Flax modules are named exactly ``<layer>``, so matching is by the
    trailing layer name.
    """
    import flax

    from bodyfitting_tpu.tools.manifests import (
        expected_openpose_state_dict,
        normalize_openpose_keys,
        verify_or_raise,
    )

    required, optional = expected_openpose_state_dict(variables)
    verify_or_raise(
        normalize_openpose_keys(state_dict), required, optional,
        "OpenPose checkpoint",
    )
    sd = {}
    for k, v in state_dict.items():
        name = k.split(".")[-2] if "." in k else k
        leaf = k.split(".")[-1]
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                         else v)
        sd[(name, leaf)] = arr

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for path, val in flat.items():
        layer = path[-3]            # ('params', '<layer>', 'conv', leaf)
        leaf = path[-1]
        if leaf == "kernel":
            t = sd[(layer, "weight")].transpose(2, 3, 1, 0)
        else:
            t = sd[(layer, "bias")]
        assert t.shape == val.shape, (path, t.shape, val.shape)
        out[path] = jnp.asarray(t)
    return flax.traverse_util.unflatten_dict(out)


def init_body_net(rng_key=None):
    model = BodyPoseNet()
    variables = model.init(
        rng_key or jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )
    return model, variables


def init_hand_net(rng_key=None):
    model = HandPoseNet()
    variables = model.init(
        rng_key or jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )
    return model, variables


def load_body_net(checkpoint_path: Optional[str] = None):
    model, variables = init_body_net()
    if checkpoint_path is not None:
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=False)
        variables = convert_openpose_torch(sd, variables)
    return model, variables


def load_hand_net(checkpoint_path: Optional[str] = None):
    model, variables = init_hand_net()
    if checkpoint_path is not None:
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=False)
        variables = convert_openpose_torch(sd, variables)
    return model, variables


def init_face_net(rng_key=None):
    model = FacePoseNet()
    variables = model.init(
        rng_key or jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )
    return model, variables


def load_face_net(checkpoint_path: Optional[str] = None):
    """Face net, optionally from a torch port of ``pose_iter_116000``
    (same trailing-layer-name convention as body/hand)."""
    model, variables = init_face_net()
    if checkpoint_path is not None:
        import torch

        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=False)
        variables = convert_openpose_torch(sd, variables)
    return model, variables
