"""LBAM image inpainting network in Flax.

The reference uses LBAM (Xie et al. ICCV'19, "Image Inpainting with
Learnable Bidirectional Attention Maps") to fill unseen UV-texture regions
(/root/reference/models/inpaint.py, invoked at texture_fitting.py:191-218).
This is the same published architecture: a 7-level encoder whose features
are gated by learnable asymmetric-gaussian activations of mask features
(forward attention), a 6-level reverse mask branch on ``1 - mask``, and a
decoder whose skip-concatenated features are gated by the concatenated
forward+reverse attention maps.

Transposed convolutions reproduce torch ``ConvTranspose2d`` semantics
exactly (input dilation + (k-1-p) padding + spatially-flipped kernel), so
the released ``LBAM_NoBN_ParisStreetView.pth`` weights convert directly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GaussActivation(nn.Module):
    """Asymmetric gaussian gate g_A (reference inpaint.py:76-104)."""

    a_init: float = 1.1
    mu_init: float = 2.0
    sigma1_init: float = 1.0
    sigma2_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        a = self.param("a", lambda k: jnp.asarray(self.a_init))
        mu = self.param("mu", lambda k: jnp.asarray(self.mu_init))
        s1 = self.param("sigma1", lambda k: jnp.asarray(self.sigma1_init))
        s2 = self.param("sigma2", lambda k: jnp.asarray(self.sigma2_init))
        a = jnp.clip(a, 1.01, 6.0)
        mu = jnp.clip(mu, 0.1, 3.0)
        s1 = jnp.clip(s1, 0.5, 2.0)
        s2 = jnp.clip(s2, 0.5, 2.0)
        left = a * jnp.exp(-s1 * (x - mu) ** 2)
        right = 1 + (a - 1) * jnp.exp(-s2 * (x - mu) ** 2)
        return jnp.where(x < mu, left, right)


def mask_update(x, alpha: float = 0.8):
    """relu(x)^alpha (reference inpaint.py:107-118)."""
    return jnp.maximum(x, 0.0) ** alpha


class TorchConv(nn.Module):
    """4x4/stride-2/pad-1 conv, bias-free (LBAM default)."""

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=self.padding,
            use_bias=False, name="conv",
        )(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d-equivalent: lhs-dilated conv with flipped kernel.

    Param ``kernel`` has shape [k, k, in, out] (torch's (in,out,k,k)
    transposed (2,3,0,1) at conversion time).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel, self.stride, self.padding
        w = self.param(
            "kernel",
            nn.initializers.normal(0.02),
            (k, k, x.shape[-1], self.features),
        )
        return jax.lax.conv_general_dilated(
            x, jnp.flip(w, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ForwardAttention(nn.Module):
    """Encoder level: feature conv gated by mask-feature attention
    (reference inpaint.py:187-261)."""

    features: int

    @nn.compact
    def __call__(self, feats, masks):
        conv_f = TorchConv(self.features, name="conv")(feats)
        # masks are 3-channel at every level (the reference's 4-vs-3
        # in-channel switch is handled by Flax shape inference)
        conv_m = TorchConv(self.features, name="maskConv")(masks)
        attn = GaussActivation(1.1, 2.0, 1.0, 1.0, name="gauss")(conv_m)
        out = nn.leaky_relu(conv_f * attn, 0.2)
        return out, mask_update(conv_m), conv_f, attn


class ReverseMaskConv(nn.Module):
    """Reverse mask branch level (reference inpaint.py:121-141)."""

    features: int

    @nn.compact
    def __call__(self, masks):
        m = TorchConv(self.features, name="reverseMaskConv")(masks)
        attn = GaussActivation(1.1, 1.0, 0.5, 0.5, name="gauss")(m)
        return attn, mask_update(m)


class ReverseAttention(nn.Module):
    """Decoder level: deconv, skip concat, attention gate, leaky relu
    (reference inpaint.py:144-184; bn disabled as in the NoBN release)."""

    features: int

    @nn.compact
    def __call__(self, ec_skip, dc_feats, attn_map):
        up = TorchConvTranspose(self.features, name="conv")(dc_feats)
        cat = jnp.concatenate([ec_skip, up], axis=-1)
        return nn.leaky_relu(cat * attn_map, 0.2)


class LBAM(nn.Module):
    """Full generator: ``(image+mask 4ch, mask 3ch) -> inpainted rgb``."""

    out_channels: int = 3

    @nn.compact
    def __call__(self, input_imgs, masks):
        ec_chans = [64, 128, 256, 512, 512, 512, 512]
        feats, mu = input_imgs, masks
        skips, fmaps = [], []
        for i, ch in enumerate(ec_chans):
            feats, mu, skip, fmap = ForwardAttention(
                ch, name=f"ec{i + 1}"
            )(feats, mu)
            skips.append(skip)
            fmaps.append(fmap)

        rmaps = []
        rmu = 1.0 - masks
        for i, ch in enumerate([64, 128, 256, 512, 512, 512]):
            rmap, rmu = ReverseMaskConv(ch, name=f"reverseConv{i + 1}")(rmu)
            rmaps.append(rmap)

        dc = feats                                 # ec7 output
        dec_chans = [512, 512, 512, 256, 128, 64]
        for i, ch in enumerate(dec_chans):
            lvl = 6 - i                            # attention level 6..1
            attn = jnp.concatenate(
                [fmaps[lvl - 1], rmaps[lvl - 1]], axis=-1
            )
            dc = ReverseAttention(ch, name=f"dc{i + 1}")(
                skips[lvl - 1], dc, attn
            )
        out = TorchConvTranspose(self.out_channels, name="dc7")(dc)
        return (jnp.tanh(out) + 1.0) / 2.0


def convert_lbam_torch(state_dict: dict, variables: dict) -> dict:
    """Map the released LBAM state dict onto the Flax tree."""
    import flax

    from bodyfitting_tpu.tools.manifests import (
        expected_lbam_state_dict,
        verify_or_raise,
    )

    required, optional = expected_lbam_state_dict(variables)
    verify_or_raise(state_dict, required, optional, "LBAM checkpoint")
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v)
        for k, v in state_dict.items()
    }
    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for path, val in flat.items():
        mods = path[1:]                       # drop 'params'
        name = mods[0]
        if name.startswith("ec"):
            # ec{i}.{conv|maskConv|gauss}
            sub = mods[1]
            if sub == "gauss":
                key = f"{name}.conv.activationFuncG_A.{mods[-1]}"
            else:
                key = f"{name}.conv.{sub}.weight"
            t = sd[key]
            if mods[-1] == "kernel":
                t = t.transpose(2, 3, 1, 0)   # OIHW -> HWIO
        elif name.startswith("reverseConv"):
            sub = mods[1]
            if sub == "gauss":
                key = f"{name}.activationFuncG_A.{mods[-1]}"
                t = sd[key]
            else:
                t = sd[f"{name}.reverseMaskConv.weight"].transpose(
                    2, 3, 1, 0
                )
        elif name == "dc7":
            t = sd["dc7.weight"].transpose(2, 3, 0, 1)  # (in,out,k,k)->kkio
        elif name.startswith("dc"):
            t = sd[f"{name}.conv.weight"].transpose(2, 3, 0, 1)
        else:
            raise KeyError(path)
        assert t.shape == tuple(val.shape), (path, t.shape, val.shape)
        out[path] = jnp.asarray(t)
    return flax.traverse_util.unflatten_dict(out)


class Inpainter:
    """Reference-compatible wrapper (inpaint.py:7-49): fills masked
    regions and composites with the unmasked input."""

    def __init__(self, checkpoint_path: Optional[str] = None):
        self.model = LBAM()
        self.variables = self.model.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 4)),
            jnp.zeros((1, 64, 64, 3)),
        )
        if checkpoint_path is not None:
            import torch

            sd = torch.load(checkpoint_path, map_location="cpu",
                            weights_only=False)
            self.variables = convert_lbam_torch(sd, self.variables)
        # weights as jit ARGUMENTS, not closures: embedding the LBAM
        # parameters as program constants trips the remote-compile
        # tunnel's size limit (CLAUDE.md, HTTP 413)
        apply_jit = jax.jit(self.model.apply)
        self._apply = lambda img, m: apply_jit(self.variables, img, m)

    def __call__(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """image uint8 [H,W,3], mask uint8 [H,W,3] (255 = region to fill).

        Returns float [H,W,3] in [0,1], like the reference wrapper.
        """
        img = np.asarray(image, np.float32) / 255.0
        m = (np.asarray(mask, np.float32) / 255.0 >= 0.5).astype(np.float32)
        keep = 1.0 - m                               # 1 = known pixels
        inp = np.concatenate(
            [img * keep, keep[..., :1]], axis=-1
        )[None]
        out = np.asarray(
            self._apply(jnp.asarray(inp), jnp.asarray(keep[None]))
        )[0]
        return out * m + img * keep
