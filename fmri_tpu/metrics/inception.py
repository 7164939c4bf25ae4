"""Pluggable Inception-Score classifier.

The reference computes IS with torchvision's pretrained Inception-v3
(``train/train_utils.py:819-881``).  Pretrained Inception weights are not
shippable inside this offline build, so the scorer is pluggable:

  * If ``FMRI_TPU_INCEPTION_NPZ`` points at an ``.npz`` of InceptionV3
    parameters exported for :class:`InceptionV3Stub`, those are used.
  * Otherwise a deterministic fixed-seed conv classifier (``ProxyClassifier``)
    produces class probabilities.  The resulting number is a *proxy IS* —
    self-consistent across runs of this framework (useful as a relative
    regression signal) but not comparable to published Inception-v3 IS values.
    ``evaluate()`` labels it ``is_proxy`` accordingly.

The IS formula itself (softmax entropy over splits) is exact — see
``fmri_tpu.metrics.quality.inception_score_from_probs``.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fmri_tpu.metrics.quality import inception_score_from_probs


class ProxyClassifier(nn.Module):
    """Small fixed-seed conv net standing in for Inception-v3's 1000-way head."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, 3] in [-1, 1]
        for feats in (32, 64, 128):
            x = nn.Conv(feats, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes)(x)
        return nn.softmax(x, axis=-1)


@lru_cache(maxsize=1)
def _cpu_device():
    """Host CPU device if the platform config allows one, else None (an
    explicit ``jax_platforms`` list without 'cpu' disables the backend)."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


@lru_cache(maxsize=1)
def _proxy():
    # The proxy prefers the host CPU backend: it is a tiny host-side metric,
    # and on the tunneled TPU platform the first compile of a fresh program
    # costs minutes of warmup (measured: ~100-190s for this 6-op net) — far
    # more than the classification itself is worth.  When no CPU backend is
    # available it falls back to the default device (just slower, not wrong).
    import contextlib

    cpu = _cpu_device()
    ctx = (lambda: jax.default_device(cpu)) if cpu else contextlib.nullcontext

    with ctx():
        model = ProxyClassifier()
        variables = model.init(jax.random.key(1234), jnp.zeros((1, 75, 75, 3)))
    fn = jax.jit(lambda imgs: model.apply(variables, imgs))

    def run(imgs):
        with ctx():
            if cpu is not None:
                imgs = jax.device_put(imgs, cpu)
            return fn(imgs)

    return run


def classify(images: jax.Array) -> np.ndarray:
    """images: [B, H, W, 3] in [-1, 1] -> probs [B, 1000]."""
    npz = os.environ.get("FMRI_TPU_INCEPTION_NPZ")
    if npz and os.path.exists(npz):
        from fmri_tpu.metrics.inception_v3 import classify_with_weights

        return classify_with_weights(npz, images)
    # Proxy path: feed images at their native resolution.  (The reference
    # upsamples to 299 for Inception-v3; the proxy net is resolution-agnostic.
    # Everything here stays on the host CPU backend: on the tunneled TPU
    # platform each *eager* op's first execution pays a ~10s mini-compile
    # round trip, which made this metric cost minutes for no benefit.)
    return np.asarray(_proxy()(np.asarray(images)))


def inception_score(images: jax.Array, splits: int = 1):
    """Inception Score of images (NHWC, [-1, 1]); proxy-backed unless real
    weights are configured (see module docstring).  Returns
    ``(mean, std, is_proxy)`` — mean/std over splits like the reference
    (``train_utils.py:879-881``)."""
    probs = classify(images)
    mean, std = inception_score_from_probs(probs, splits=splits)  # pure numpy
    return mean, std, is_proxy()


def is_proxy() -> bool:
    npz = os.environ.get("FMRI_TPU_INCEPTION_NPZ")
    return not (npz and os.path.exists(npz))
