"""HMR (ResNet-50 + iterative-error-feedback head) in Flax.

The initialization network that seeds SMPLify (reference models/hmr.py,
used only at smplify/body_fitting.py:57-75).  Faithful architecture:
ResNet-50 bottleneck backbone, then 3 IEF iterations of
``fc1(1024) -> fc2(1024) -> (decpose 24*6d, decshape 10, deccam 3)``
starting from the mean parameters, residual-updated each iteration.

Includes a converter from the reference's torch checkpoint
(``data/model_checkpoint.pt``, config.py:6) into the Flax parameter tree —
name-mapped and OIHW->HWIO transposed — so the released SPIN weights drop
in.  Without a checkpoint, SMPLify's multi-view fitting also converges
from the mean-pose init (the HMR seed only saves iterations), which is the
asset-free default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.ops.rotations import rot6d_to_rotmat

NPOSE = 24 * 6


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=True, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class HMR(nn.Module):
    """Input: ``[B, 224, 224, 3]`` ImageNet-normalised NHWC images."""

    layers: Sequence[int] = (3, 4, 6, 3)
    n_iter: int = 3

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        init_pose: jax.Array,
        init_shape: jax.Array,
        init_cam: jax.Array,
    ):
        B = x.shape[0]
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        for li, (p, n) in enumerate(zip(planes, self.layers)):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                down = bi == 0  # first block always projects (or stride)
                y = Bottleneck(
                    p, stride=stride, downsample=down,
                    name=f"layer{li + 1}_{bi}",
                )(y)

        xf = jnp.mean(y, axis=(1, 2))                    # global avg pool

        pose, shape, cam = init_pose, init_shape, init_cam
        fc1 = nn.Dense(1024, name="fc1")
        fc2 = nn.Dense(1024, name="fc2")
        decpose = nn.Dense(NPOSE, name="decpose")
        decshape = nn.Dense(10, name="decshape")
        deccam = nn.Dense(3, name="deccam")
        for _ in range(self.n_iter):
            xc = jnp.concatenate([xf, pose, shape, cam], axis=1)
            xc = fc1(xc)
            xc = fc2(xc)
            pose = decpose(xc) + pose
            shape = decshape(xc) + shape
            cam = deccam(xc) + cam

        rotmat = rot6d_to_rotmat(pose.reshape(B, 24, 6))
        return rotmat, shape, cam


def load_mean_params(path: Optional[str] = None):
    """``smpl_mean_params.npz`` -> (pose6d [144], shape [10], cam [3]).

    Without the asset, a neutral init: identity 6d rotations, zero shape,
    weak-perspective cam [0.9, 0, 0].
    """
    if path is not None:
        d = np.load(path)
        return (
            d["pose"].astype(np.float32),
            d["shape"].astype(np.float32),
            d["cam"].astype(np.float32),
        )
    # identity rotation in the reshape(3, 2) column layout: a1=[1,0,0],
    # a2=[0,1,0] interleaved row-wise
    ident6d = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32), 24)
    return ident6d, np.zeros(10, np.float32), np.array(
        [0.9, 0.0, 0.0], np.float32
    )


def init_hmr(rng_key, layers=(3, 4, 6, 3)):
    model = HMR(layers=layers)
    pose, shape, cam = load_mean_params()
    dummy = jnp.zeros((1, 224, 224, 3))
    variables = model.init(
        rng_key, dummy, jnp.asarray(pose)[None], jnp.asarray(shape)[None],
        jnp.asarray(cam)[None],
    )
    return model, variables


def hmr_forward(model, variables, images, mean_params=None):
    """Run HMR: ``images [B,224,224,3]`` -> (rotmat [B,24,3,3], shape, cam)."""
    pose, shape, cam = (
        mean_params if mean_params is not None else load_mean_params()
    )
    B = images.shape[0]
    return model.apply(
        variables, images,
        jnp.broadcast_to(jnp.asarray(pose), (B, NPOSE)),
        jnp.broadcast_to(jnp.asarray(shape), (B, 10)),
        jnp.broadcast_to(jnp.asarray(cam), (B, 3)),
    )


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_torch_checkpoint(state_dict: dict, variables: dict) -> dict:
    """Map the reference torch HMR state_dict onto the Flax variable tree.

    Accepts the raw ``model.state_dict()`` or a SPIN-style wrapper dict
    with a ``'model'`` key.  Conv weights are transposed OIHW -> HWIO.
    """
    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    from bodyfitting_tpu.tools.manifests import (
        expected_hmr_state_dict,
        verify_or_raise,
    )

    required, optional = expected_hmr_state_dict(variables)
    verify_or_raise(state_dict, required, optional, "SPIN HMR checkpoint")
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}

    def torch_prefix(mods: tuple) -> str:
        """Flax module path (collection/leaf stripped) -> torch name prefix."""
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
        return prefix

    for path, val in flat.items():
        col = path[0]
        leaf = path[-1]
        prefix = torch_prefix(path[1:-1])
        if col == "params":
            if leaf == "kernel" and val.ndim == 4:      # conv HWIO
                t = sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)
            elif leaf == "kernel":                      # dense [in, out]
                t = sd[f"{prefix}.weight"].T
            elif leaf == "scale":                       # batchnorm gamma
                t = sd[f"{prefix}.weight"]
            else:                                       # bias / beta
                t = sd[f"{prefix}.bias"]
        else:  # batch_stats
            key = "running_mean" if leaf == "mean" else "running_var"
            t = sd[f"{prefix}.{key}"]
        assert t.shape == val.shape, (path, t.shape, val.shape)
        out[path] = jnp.asarray(t)

    return flax.traverse_util.unflatten_dict(out)


def load_torch_checkpoint(path: str, variables: dict) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torch_checkpoint(ckpt, variables)
