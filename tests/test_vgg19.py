"""VGG19 feature extractor: torch-oracle parity + loss routing.

The reference taps torchvision's pretrained ``vgg19().features``
(``/root/reference/train/train_utils.py:131-178``); torchvision is not
installed here, so the oracle is a torch ``nn.Sequential`` rebuilt to the
exact cfg-"E" layout, loaded with the same random state dict the JAX side
reads from an npz.
"""

import numpy as np
import pytest
import jax.numpy as jnp

VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def _torch_vgg19_features():
    import torch.nn as nn

    layers, cin = [], 3
    for c in VGG_CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, c, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = c
    return nn.Sequential(*layers)


def _random_state_dict(rng):
    sd, cin, i = {}, 3, 0
    for c in VGG_CFG:
        if c == "M":
            i += 1
            continue
        std = 1.0 / np.sqrt(cin * 9)
        sd[f"{i}.weight"] = rng.normal(0, std, (c, cin, 3, 3)).astype(np.float32)
        sd[f"{i}.bias"] = rng.normal(0, 0.05, c).astype(np.float32)
        cin = c
        i += 2  # conv + relu
    return sd


@pytest.fixture(scope="module")
def vgg_npz(tmp_path_factory):
    sd = _random_state_dict(np.random.default_rng(0))
    path = str(tmp_path_factory.mktemp("vgg") / "vgg19_features.npz")
    np.savez(path, **sd)
    return path


def test_torch_oracle_all_taps(vgg_npz):
    import torch

    from fmri_tpu.losses.vgg19 import TAPS, load_vgg19_npz, vgg19_features

    raw = np.load(vgg_npz)
    model = _torch_vgg19_features().eval()
    model.load_state_dict({k: torch.from_numpy(raw[k]) for k in raw.files},
                          strict=True)
    params = load_vgg19_npz(vgg_npz)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    x_nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    with torch.no_grad():
        tx = torch.from_numpy(x)
        for depth, upto in TAPS.items():
            ref = model[:upto](tx).numpy()
            got = np.transpose(
                np.asarray(vgg19_features(params, x_nhwc, upto)), (0, 3, 1, 2))
            assert got.shape == ref.shape, (depth, got.shape, ref.shape)
            assert np.max(np.abs(got - ref)) < 1e-4, (
                f"tap {depth}: max |delta| = {np.max(np.abs(got - ref)):.2e}")


def test_whole_model_prefix_accepted(vgg_npz, tmp_path):
    """An export of the whole vgg19 state_dict (``features.N.*`` keys plus
    ``classifier.*``) loads identically."""
    from fmri_tpu.losses.vgg19 import load_vgg19_npz, vgg19_features

    raw = np.load(vgg_npz)
    prefixed = {f"features.{k}": raw[k] for k in raw.files}
    prefixed["classifier.0.weight"] = np.zeros((10, 10), np.float32)
    path = str(tmp_path / "whole.npz")
    np.savez(path, **prefixed)

    x = jnp.asarray(np.random.default_rng(2)
                    .normal(0, 1, (1, 16, 16, 3)).astype(np.float32))
    a = vgg19_features(load_vgg19_npz(vgg_npz), x, 9)
    b = vgg19_features(load_vgg19_npz(path), x, 9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_losses_route_to_real_vgg(vgg_npz, monkeypatch):
    """With FMRI_TPU_VGG19_NPZ exported, feature_loss / feature_cosine_loss
    tap real VGG activations (different from the proxy, zero on identical
    normalized inputs)."""
    from fmri_tpu.losses.aux_losses import (
        feature_cosine_loss, feature_loss, norm_image_prediction,
        proxy_feature_fn,
    )

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    monkeypatch.delenv("FMRI_TPU_VGG19_NPZ", raising=False)
    proxy_val = float(feature_loss(a, b))
    monkeypatch.setenv("FMRI_TPU_VGG19_NPZ", vgg_npz)
    real_val = float(feature_loss(a, b))
    assert real_val > 0.0 and abs(real_val - proxy_val) > 1e-6

    # perfect reconstruction -> zero feature distance through the real net
    assert float(feature_loss(a, norm_image_prediction(a))) < 1e-5
    # the 5-tap cosine loss of an image with itself is exactly -5
    np.testing.assert_allclose(float(feature_cosine_loss(a, a)), -5.0,
                               atol=1e-5)
    # explicit feature_fn still wins over the env var
    explicit = float(feature_loss(a, b, feature_fn=lambda x: proxy_feature_fn(x, 2)))
    np.testing.assert_allclose(explicit, proxy_val, rtol=1e-6)
