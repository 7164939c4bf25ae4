"""Auxiliary losses from the reference's shared library — available but unused
by the main trainers (``train/train_utils.py:72-264``), kept for capability
parity with the Beliy-style self-supervision experiments.

All functions take NHWC images / [B, V] voxel vectors and are pure jax.
The reference's VGG19-feature losses (``train_utils.py:131-178``) wrap
torchvision's *pretrained* VGG19; pretrained weights are not shippable in this
offline build, so the feature extractor is pluggable three ways, checked in
order: (1) pass any ``feature_fn(images) -> activations``; (2) export the
torchvision VGG19 ``features`` weights to an npz and set
``FMRI_TPU_VGG19_NPZ`` — the losses then tap the exact reference layers
(``fmri_tpu.losses.vgg19``, same contract as the pluggable Inception scorer);
(3) fall back to a deterministic fixed-seed conv proxy.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _cosine_rows(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Row-wise cosine similarity over flattened trailing dims
    (``nn.CosineSimilarity(dim=1)``)."""
    a = a.reshape(a.shape[0], -1)
    b = b.reshape(b.shape[0], -1)
    num = jnp.sum(a * b, axis=1)
    den = jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1)
    return num / jnp.maximum(den, eps)


def voxel_loss(y_pred: jax.Array, y_true: jax.Array, alpha: float = 1.0) -> jax.Array:
    """MSE + (1 - mean cosine) in voxel space (``VoxelLoss.forward``,
    ``train_utils.py:95-96``; Beliy et al. 2019).  ``alpha`` kept for API
    parity (the reference stores but does not apply it)."""
    del alpha
    mse = jnp.mean((y_pred - y_true) ** 2)
    return mse + (1.0 - jnp.mean(_cosine_rows(y_pred, y_true)))


def image_loss(y_pred: jax.Array, y_true: jax.Array,
               mean: Sequence[float] = (0.485, 0.456, 0.406),
               std: Sequence[float] = (0.229, 0.224, 0.225)) -> jax.Array:
    """Pixel MSE with the prediction re-normalized to the target statistics
    (``ImageLoss.forward`` + ``norm_image_prediction``,
    ``train_utils.py:116-129,217-231``)."""
    y_pred = norm_image_prediction(y_pred, mean, std)
    return jnp.mean((y_pred - y_true) ** 2)


def norm_image_prediction(img: jax.Array,
                          mean: Sequence[float] = (0.485, 0.456, 0.406),
                          std: Sequence[float] = (0.229, 0.224, 0.225)) -> jax.Array:
    """Per-channel standardize then re-color with (mean, std)
    (``train_utils.py:217-231``).  NHWC."""
    mu = jnp.mean(img, axis=(1, 2), keepdims=True)
    sd = jnp.std(img, axis=(1, 2), keepdims=True) + 1e-8
    normed = (img - mu) / sd
    return normed * jnp.asarray(std, img.dtype) + jnp.asarray(mean, img.dtype)


@lru_cache(maxsize=2)
def _proxy_feature_params(channels: tuple, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    params = []
    cin = 3
    for cout in channels:
        w = rng.normal(0.0, (2.0 / (9 * cin)) ** 0.5, (3, 3, cin, cout))
        params.append(jnp.asarray(w, jnp.float32))
        cin = cout
    return tuple(params)


def proxy_feature_fn(images: jax.Array, depth: int = 2) -> jax.Array:
    """Deterministic random conv features standing in for VGG19 taps."""
    from fmri_tpu.ops.conv import conv2d

    x = images
    for w in _proxy_feature_params((32, 64, 128, 128, 128))[:depth]:
        x = jax.nn.relu(conv2d(x, w, stride=2, padding=1))
    return x


def _default_feature_fn(depth: int) -> Callable:
    """Real VGG19 tap when ``FMRI_TPU_VGG19_NPZ`` is exported, else proxy."""
    from fmri_tpu.losses.vgg19 import vgg19_npz_path, vgg19_tap_fn

    if vgg19_npz_path() is not None:
        return vgg19_tap_fn(depth)
    return lambda x: proxy_feature_fn(x, depth)


def feature_loss(y_pred: jax.Array, y_true: jax.Array,
                 feature_fn: Optional[Callable] = None,
                 depth: int = 2,
                 mean: Sequence[float] = (0.485, 0.456, 0.406),
                 std: Sequence[float] = (0.229, 0.224, 0.225)) -> jax.Array:
    """RMSE between feature activations (``ImageLoss.vgg_loss``,
    ``train_utils.py:131-159``; conv1/conv2 taps map to ``depth`` 1/2)."""
    if feature_fn is None:
        feature_fn = _default_feature_fn(depth)
    y_pred = norm_image_prediction(y_pred, mean, std)
    fp = feature_fn(y_pred)
    ft = feature_fn(y_true)
    return jnp.sqrt(jnp.mean((fp - ft) ** 2))


def feature_cosine_loss(y_pred: jax.Array, y_true: jax.Array,
                        feature_fn: Optional[Callable] = None,
                        depths: Sequence[int] = (1, 2, 3, 4, 5)) -> jax.Array:
    """Negative summed cosine similarity over multiple feature depths
    (``ImageLoss.vgg_cosine_loss``, ``train_utils.py:161-178`` — five VGG19
    taps, ``fmri_tpu.losses.vgg19.TAPS``)."""
    total = 0.0
    for d in depths:
        fn = feature_fn or _default_feature_fn(d)
        total += -jnp.mean(_cosine_rows(fn(y_pred), fn(y_true)))
    return total


# ------------------------- total-variation family -------------------------
# Reference ``train_utils.py:243-264``; NHWC here.


def total_variation_loss(x: jax.Array) -> jax.Array:
    a = jnp.sqrt(jnp.abs(x[:, :-1, :-1, :] - x[:, 1:, :-1, :]) + 1e-12)
    b = jnp.sqrt(jnp.abs(x[:, :-1, :-1, :] - x[:, :-1, 1:, :]) + 1e-12)
    return jnp.mean((a + b) ** 1.25)


def total_variation_l1(x: jax.Array) -> jax.Array:
    a = jnp.abs(x[:, :-1, :-1, :] - x[:, 1:, :-1, :])
    b = jnp.abs(x[:, :-1, :-1, :] - x[:, :-1, 1:, :])
    return jnp.mean(a + b)


def total_variation_l2(x: jax.Array) -> jax.Array:
    a = (x[:, :-1, :-1, :] - x[:, 1:, :-1, :]) ** 2
    b = (x[:, :-1, :-1, :] - x[:, :-1, 1:, :]) ** 2
    return jnp.mean(jnp.sqrt(a + b + 1e-12))
