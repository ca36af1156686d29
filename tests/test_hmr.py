"""HMR tests: differential vs an independently-written torch reference.

The torch model below is written directly from the published SPIN/HMR
architecture (ResNet-50 bottleneck + 3-iteration IEF head) and is used to
validate BOTH the Flax architecture and the torch->flax weight converter:
random torch weights are converted, and both nets must produce identical
outputs on the same input.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bodyfitting_tpu.models import hmr as hmr_flax

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchHMR(tnn.Module):
    def __init__(self, layers=(2, 2, 2, 2)):
        super().__init__()
        self.inplanes = 64
        npose = 24 * 6
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.fc1 = tnn.Linear(512 * 4 + npose + 13, 1024)
        self.fc2 = tnn.Linear(1024, 1024)
        self.decpose = tnn.Linear(1024, npose)
        self.decshape = tnn.Linear(1024, 10)
        self.deccam = tnn.Linear(1024, 3)

    def _make_layer(self, planes, blocks, stride=1):
        down = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        layers = [TorchBottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x, init_pose, init_shape, init_cam, n_iter=3):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        xf = y.mean(dim=(2, 3))
        pose, shape, cam = init_pose, init_shape, init_cam
        for _ in range(n_iter):
            xc = torch.cat([xf, pose, shape, cam], 1)
            xc = self.fc2(self.fc1(xc))
            pose = self.decpose(xc) + pose
            shape = self.decshape(xc) + shape
            cam = self.deccam(xc) + cam
        return pose, shape, cam


@pytest.mark.parametrize(
    "layers",
    [
        (2, 2, 2, 2),                     # shrunken resnet, fast loop
        pytest.param((3, 4, 6, 3), marks=pytest.mark.slow),  # real ResNet-50
    ],
)
def test_flax_matches_torch_with_converted_weights(layers):
    torch.manual_seed(0)
    tmodel = TorchHMR(layers).eval()
    # randomize batchnorm running stats so the test exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    import jax

    model, variables = (
        hmr_flax.HMR(layers=layers),
        None,
    )
    pose0, shape0, cam0 = hmr_flax.load_mean_params()
    x = np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(
        np.float32
    )
    variables = model.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(pose0)[None].repeat(2, 0),
        jnp.asarray(shape0)[None].repeat(2, 0),
        jnp.asarray(cam0)[None].repeat(2, 0),
    )
    converted = hmr_flax.convert_torch_checkpoint(
        tmodel.state_dict(), variables
    )

    rotmat, shape, cam = hmr_flax.hmr_forward(
        model, converted, jnp.asarray(x)
    )

    with torch.no_grad():
        tpose, tshape, tcam = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(pose0)[None].repeat(2, 1),
            torch.from_numpy(shape0)[None].repeat(2, 1),
            torch.from_numpy(cam0)[None].repeat(2, 1),
        )

    np.testing.assert_allclose(
        np.asarray(shape), tshape.numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(cam), tcam.numpy(), atol=2e-3, rtol=1e-3
    )
    # compare the pose through the 6d -> rotmat head
    from bodyfitting_tpu.ops.rotations import rot6d_to_rotmat

    want_rot = np.asarray(
        rot6d_to_rotmat(jnp.asarray(tpose.numpy().reshape(2, 24, 6)))
    )
    np.testing.assert_allclose(np.asarray(rotmat), want_rot, atol=5e-3)


def test_mean_params_fallback_is_identity_pose():
    pose, shape, cam = hmr_flax.load_mean_params()
    from bodyfitting_tpu.ops.rotations import rot6d_to_rotmat

    m = np.asarray(rot6d_to_rotmat(jnp.asarray(pose.reshape(24, 6))))
    np.testing.assert_allclose(
        m, np.broadcast_to(np.eye(3), (24, 3, 3)), atol=1e-6
    )
    assert shape.sum() == 0
