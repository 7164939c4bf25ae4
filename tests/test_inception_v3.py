"""Inception-v3 forward: torch-oracle parity, key coverage, IS integration.

Generates a random state dict with the exact torchvision ``inception_v3``
key/shape structure and asserts numerical parity of
``inception_v3_logits`` against a torch reconstruction of torchvision's
architecture (``tests/inception_torch_oracle.py`` — torchvision itself is
not installed here).  BN stats and affine params are randomized so a
mis-consumed tensor or a pool-semantics bug (e.g. torch's
count-includes-pad average pool) cannot hide behind identity stats.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp


def _basic_conv(sd, name, cin, cout, kh, kw, rng):
    # ~unit-gain init keeps 20-conv-deep activations O(1) so the parity
    # tolerance is meaningful end to end.
    std = 1.0 / np.sqrt(cin * kh * kw)
    sd[f"{name}.conv.weight"] = rng.normal(0, std, (cout, cin, kh, kw)).astype(np.float32)
    sd[f"{name}.bn.weight"] = rng.normal(1.0, 0.1, cout).astype(np.float32)
    sd[f"{name}.bn.bias"] = rng.normal(0.0, 0.1, cout).astype(np.float32)
    sd[f"{name}.bn.running_mean"] = rng.normal(0.0, 0.1, cout).astype(np.float32)
    sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    sd[f"{name}.bn.num_batches_tracked"] = np.zeros((), np.int64)


def make_state_dict(rng) -> dict:
    sd = {}
    bc = lambda *a: _basic_conv(sd, *a, rng=rng)
    # stem
    bc("Conv2d_1a_3x3", 3, 32, 3, 3)
    bc("Conv2d_2a_3x3", 32, 32, 3, 3)
    bc("Conv2d_2b_3x3", 32, 64, 3, 3)
    bc("Conv2d_3b_1x1", 64, 80, 1, 1)
    bc("Conv2d_4a_3x3", 80, 192, 3, 3)
    # InceptionA
    for n, cin, pool in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                         ("Mixed_5d", 288, 64)):
        bc(f"{n}.branch1x1", cin, 64, 1, 1)
        bc(f"{n}.branch5x5_1", cin, 48, 1, 1)
        bc(f"{n}.branch5x5_2", 48, 64, 5, 5)
        bc(f"{n}.branch3x3dbl_1", cin, 64, 1, 1)
        bc(f"{n}.branch3x3dbl_2", 64, 96, 3, 3)
        bc(f"{n}.branch3x3dbl_3", 96, 96, 3, 3)
        bc(f"{n}.branch_pool", cin, pool, 1, 1)
    # InceptionB
    bc("Mixed_6a.branch3x3", 288, 384, 3, 3)
    bc("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1)
    bc("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3)
    bc("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)
    # InceptionC
    for n, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                  ("Mixed_6e", 192)):
        bc(f"{n}.branch1x1", 768, 192, 1, 1)
        bc(f"{n}.branch7x7_1", 768, c7, 1, 1)
        bc(f"{n}.branch7x7_2", c7, c7, 1, 7)
        bc(f"{n}.branch7x7_3", c7, 192, 7, 1)
        bc(f"{n}.branch7x7dbl_1", 768, c7, 1, 1)
        bc(f"{n}.branch7x7dbl_2", c7, c7, 7, 1)
        bc(f"{n}.branch7x7dbl_3", c7, c7, 1, 7)
        bc(f"{n}.branch7x7dbl_4", c7, c7, 7, 1)
        bc(f"{n}.branch7x7dbl_5", c7, 192, 1, 7)
        bc(f"{n}.branch_pool", 768, 192, 1, 1)
    # aux head (must be skipped by the loader)
    bc("AuxLogits.conv0", 768, 128, 1, 1)
    # InceptionD
    bc("Mixed_7a.branch3x3_1", 768, 192, 1, 1)
    bc("Mixed_7a.branch3x3_2", 192, 320, 3, 3)
    bc("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1)
    bc("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    bc("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    bc("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)
    # InceptionE
    for n, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        bc(f"{n}.branch1x1", cin, 320, 1, 1)
        bc(f"{n}.branch3x3_1", cin, 384, 1, 1)
        bc(f"{n}.branch3x3_2a", 384, 384, 1, 3)
        bc(f"{n}.branch3x3_2b", 384, 384, 3, 1)
        bc(f"{n}.branch3x3dbl_1", cin, 448, 1, 1)
        bc(f"{n}.branch3x3dbl_2", 448, 384, 3, 3)
        bc(f"{n}.branch3x3dbl_3a", 384, 384, 1, 3)
        bc(f"{n}.branch3x3dbl_3b", 384, 384, 3, 1)
        bc(f"{n}.branch_pool", cin, 192, 1, 1)
    sd["fc.weight"] = rng.normal(0, 0.02, (1000, 2048)).astype(np.float32)
    sd["fc.bias"] = rng.normal(0, 0.1, 1000).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    rng = np.random.default_rng(0)
    sd = make_state_dict(rng)
    path = str(tmp_path_factory.mktemp("inception") / "inception_v3.npz")
    np.savez(path, **sd)
    return path


def test_logits_shape_and_key_coverage(weights_npz):
    from fmri_tpu.metrics.inception_v3 import _load_params, inception_v3_logits

    params = _load_params(weights_npz)
    assert not any(k.startswith("AuxLogits") for k in params)
    assert not any(k.endswith("num_batches_tracked") for k in params)
    # 75x75 is torchvision's minimum input; cheap to compile
    x = jnp.zeros((2, 75, 75, 3))
    logits = inception_v3_logits(params, x)
    assert logits.shape == (2, 1000)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_torch_oracle_logits_parity(weights_npz):
    """Logits parity vs a torch rebuild of torchvision's forward.

    The reference scores IS with torchvision's pretrained inception_v3
    (``train/train_utils.py:848-881``); this pins the JAX forward to those
    semantics so IS becomes exact the moment real weights land in the npz.
    75x75 (torchvision's minimum input) still drives every block — the
    deepest maps shrink to 1x1, where pool edge semantics bite hardest.
    """
    import torch

    from inception_torch_oracle import InceptionV3Oracle
    from fmri_tpu.metrics.inception_v3 import _load_params, inception_v3_logits

    raw = np.load(weights_npz)
    sd = {k: torch.from_numpy(raw[k]) for k in raw.files
          if not k.startswith("AuxLogits")}
    model = InceptionV3Oracle().eval()
    model.load_state_dict(sd, strict=True)

    rng = np.random.default_rng(7)
    x = rng.normal(0.0, 1.0, (2, 3, 75, 75)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    got = np.asarray(inception_v3_logits(
        _load_params(weights_npz), jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))))
    assert np.max(np.abs(got - ref)) < 1e-4, (
        f"max |delta| = {np.max(np.abs(got - ref)):.2e}")


def test_inception_score_with_weights(weights_npz, monkeypatch):
    from fmri_tpu.metrics.inception import inception_score, is_proxy
    import fmri_tpu.metrics.inception_v3 as iv3

    # avoid the 299x299 CPU compile: resize to 75 in the test
    monkeypatch.setenv("FMRI_TPU_INCEPTION_NPZ", weights_npz)

    orig = iv3.classify_with_weights

    def small(npz, images, batch_size=32):
        import jax

        p = iv3._load_params(npz)
        imgs = jax.image.resize(images, (images.shape[0], 75, 75, 3), "bilinear")
        probs = jax.nn.softmax(iv3.inception_v3_logits(p, imgs), axis=-1)
        return np.asarray(probs)

    monkeypatch.setattr(iv3, "classify_with_weights", small)
    assert not is_proxy()
    imgs = jnp.asarray(np.random.default_rng(1)
                       .uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32))
    mean, std, proxy = inception_score(imgs, splits=2)
    assert proxy is False
    assert np.isfinite(mean) and np.isfinite(std) and mean >= 1.0 - 1e-3
