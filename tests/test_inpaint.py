"""LBAM inpainter: differential test vs an independent torch build.

The torch model below implements the published LBAM generator compactly
and is used to validate BOTH the Flax architecture (incl. the torch
ConvTranspose2d-equivalent deconvolution) and the weight converter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bodyfitting_tpu.models import inpaint as lbam

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402


class TGauss(tnn.Module):
    def __init__(self, a, mu, s1, s2):
        super().__init__()
        self.a = tnn.Parameter(torch.tensor(a))
        self.mu = tnn.Parameter(torch.tensor(mu))
        self.sigma1 = tnn.Parameter(torch.tensor(s1))
        self.sigma2 = tnn.Parameter(torch.tensor(s2))

    def forward(self, x):
        a = self.a.clamp(1.01, 6.0)
        mu = self.mu.clamp(0.1, 3.0)
        s1 = self.sigma1.clamp(0.5, 2.0)
        s2 = self.sigma2.clamp(0.5, 2.0)
        left = a * torch.exp(-s1 * (x - mu) ** 2)
        right = 1 + (a - 1) * torch.exp(-s2 * (x - mu) ** 2)
        return torch.where(x < mu, left, right)


def mupd(x):
    return tF.relu(x) ** 0.8


class TFwd(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()

        class Inner(tnn.Module):
            pass

        self.conv = Inner()
        self.conv.conv = tnn.Conv2d(cin, cout, 4, 2, 1, bias=False)
        self.conv.maskConv = tnn.Conv2d(
            3 if cin == 4 else cin, cout, 4, 2, 1, bias=False
        )
        self.conv.activationFuncG_A = TGauss(1.1, 2.0, 1.0, 1.0)

    def forward(self, f, m):
        cf = self.conv.conv(f)
        cm = self.conv.maskConv(m[:, :3] if f.shape[1] == 4 else m)
        attn = self.conv.activationFuncG_A(cm)
        return tF.leaky_relu(cf * attn, 0.2), mupd(cm), cf, attn


class TRev(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.reverseMaskConv = tnn.Conv2d(cin, cout, 4, 2, 1, bias=False)
        self.activationFuncG_A = TGauss(1.1, 1.0, 0.5, 0.5)

    def forward(self, m):
        mm = self.reverseMaskConv(m)
        return self.activationFuncG_A(mm), mupd(mm)


class TDec(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=False)

    def forward(self, skip, dc, attn):
        up = self.conv(dc)
        return tF.leaky_relu(torch.cat([skip, up], 1) * attn, 0.2)


class TLBAM(tnn.Module):
    def __init__(self):
        super().__init__()
        chans = [4, 64, 128, 256, 512, 512, 512, 512]
        for i in range(7):
            setattr(self, f"ec{i + 1}", TFwd(chans[i], chans[i + 1]))
        rchans = [3, 64, 128, 256, 512, 512, 512]
        for i in range(6):
            setattr(self, f"reverseConv{i + 1}",
                    TRev(rchans[i], rchans[i + 1]))
        self.dc1 = TDec(512, 512)
        self.dc2 = TDec(1024, 512)
        self.dc3 = TDec(1024, 512)
        self.dc4 = TDec(1024, 256)
        self.dc5 = TDec(512, 128)
        self.dc6 = TDec(256, 64)
        self.dc7 = tnn.ConvTranspose2d(128, 3, 4, 2, 1, bias=False)

    def forward(self, x, masks):
        f, mu = x, masks
        skips, fmaps = [], []
        for i in range(7):
            f, mu, skip, fmap = getattr(self, f"ec{i + 1}")(f, mu)
            skips.append(skip)
            fmaps.append(fmap)
        rmaps, rmu = [], 1 - masks
        for i in range(6):
            rmap, rmu = getattr(self, f"reverseConv{i + 1}")(rmu)
            rmaps.append(rmap)
        dc = f
        for i in range(6):
            lvl = 6 - i
            attn = torch.cat([fmaps[lvl - 1], rmaps[lvl - 1]], 1)
            dc = getattr(self, f"dc{i + 1}")(skips[lvl - 1], dc, attn)
        return (torch.tanh(self.dc7(dc)) + 1) / 2


def test_flax_lbam_matches_torch():
    torch.manual_seed(0)
    tmodel = TLBAM().eval()
    inp = lbam.Inpainter()
    converted = lbam.convert_lbam_torch(tmodel.state_dict(),
                                        inp.variables)

    rng = np.random.default_rng(0)
    H = 128
    img = rng.uniform(size=(1, H, H, 4)).astype(np.float32)
    mask = rng.integers(0, 2, size=(1, H, H, 1)).astype(np.float32)
    mask3 = np.repeat(mask, 3, axis=-1)
    img[..., 3:] = mask

    got = np.asarray(
        inp.model.apply(converted, jnp.asarray(img), jnp.asarray(mask3))
    )
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask3.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_inpainter_composites_known_pixels():
    rng = np.random.default_rng(1)
    inp = lbam.Inpainter()
    img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    mask = np.zeros((64, 64, 3), np.uint8)
    mask[20:40, 20:40] = 255
    out = inp(img, mask)
    assert out.shape == (64, 64, 3)
    # unmasked pixels are passed through exactly
    np.testing.assert_allclose(
        out[:10, :10], img[:10, :10] / 255.0, atol=1e-6
    )
    assert np.isfinite(out).all()
