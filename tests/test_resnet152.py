"""resnet152 trunk: torch-oracle parity + ResNetEncoder integration.

The oracle rebuilds torchvision's ``ResNet(Bottleneck, layers)`` eval
forward in torch (torchvision itself is not installed here) with attribute
names matching torchvision's exactly, so its ``state_dict()`` uses the same
flat key namespace ``fmri_tpu.models.resnet152.load_resnet152_npz`` reads
(``conv1.weight``, ``layer1.0.conv1.weight``, ``layer2.0.downsample.0.weight``
...).  BN running stats are randomized so a mis-consumed tensor cannot hide
behind identity statistics.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
from torch import nn
import torch.nn.functional as F

from fmri_tpu.models import resnet152 as r152


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(y + identity)


class ResNetTrunk(nn.Module):
    """torchvision ``ResNet`` minus the ``fc`` head (= ``children()[:-1]``,
    the slice the reference keeps at ``vae_gan.py:666-668``)."""

    def __init__(self, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.max_pool2d(h, 3, 2, 1)
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        return torch.mean(h, dim=(2, 3))


def _randomize(model, rng):
    with torch.no_grad():
        for name, p in model.named_parameters():
            std = 1.0 / np.sqrt(np.prod(p.shape[1:])) if p.ndim == 4 else 0.1
            base = 1.0 if name.endswith("bn1.weight") else 0.0
            p.copy_(torch.from_numpy(
                (base + rng.normal(0, std, tuple(p.shape))).astype(np.float32)))
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.1, m.num_features).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.num_features).astype(np.float32)))


def test_trunk_matches_torch_oracle():
    layers = (1, 1, 1, 1)  # resnet geometry, test-sized depth
    rng = np.random.default_rng(0)
    oracle = ResNetTrunk(layers).eval()
    _randomize(oracle, rng)

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    np.savez("/tmp/resnet_test.npz", **sd)
    params = r152.load_resnet152_npz.__wrapped__("/tmp/resnet_test.npz")

    x = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(r152.resnet_trunk(params, jnp.asarray(
        x.transpose(0, 2, 3, 1)), layers))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_full_resnet152_key_coverage_and_shape():
    """Every key of a full-depth (3,8,36,3) state dict is consumed and the
    trunk emits the reference's 2048-d feature (``vae_gan.py:677``)."""
    layers = r152.RESNET152_LAYERS
    model = ResNetTrunk(layers)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez("/tmp/resnet152_full.npz", **sd)
    params = r152.load_resnet152_npz.__wrapped__("/tmp/resnet152_full.npz")
    want = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert set(params) == want
    out = r152.resnet_trunk(params, jnp.zeros((1, 64, 64, 3)), layers)
    assert out.shape == (1, 2048)


def test_resnet_encoder_with_pretrained_trunk():
    """ResNetEncoder(trunk_fn=...) consumes the frozen features and emits
    latent-dim (mu, logvar) like the from-scratch trunk path."""
    import jax
    from fmri_tpu.configs.presets import get_config
    from fmri_tpu.models import ResNetEncoder

    layers = (1, 1, 1, 1)
    oracle = ResNetTrunk(layers).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    np.savez("/tmp/resnet_enc.npz", **sd)
    trunk = r152.resnet152_trunk_fn("/tmp/resnet_enc.npz", layers)

    c = get_config("tiny").model
    m = ResNetEncoder(c, trunk_fn=trunk)
    x = jnp.ones((2, c.image_size, c.image_size, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    mu, logvar = m.apply(vars_, x, train=False)
    assert mu.shape == (2, c.latent_dim) and logvar.shape == (2, c.latent_dim)
    # no trunk parameters live in the Flax tree (frozen pretrained features)
    assert not any("Conv" in k for k in vars_["params"])
