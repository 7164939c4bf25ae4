"""Pure-JAX VGG19 ``features`` trunk over exported torchvision weights.

The reference's ``ImageLoss.vgg_loss`` / ``vgg_cosine_loss``
(``/root/reference/train/train_utils.py:131-178``) tap torchvision's
*pretrained* ``vgg19().features`` sequential at fixed indices:
``conv1`` = ``features[:4]`` (through relu1_2), ``conv2`` = ``features[:9]``
(through relu2_2), and the cosine loss sums taps ``[:4] [:9] [:14] [:18]
[:23]`` (``train_utils.py:164-165``).  Pretrained weights are not shippable
in this offline build, so this module mirrors the pluggable-Inception
contract (``fmri_tpu.metrics.inception_v3``): export once on any machine
with torchvision access —

    import numpy as np, torchvision
    m = torchvision.models.vgg19(weights="IMAGENET1K_V1").features.eval()
    np.savez("vgg19_features.npz",
             **{k: v.numpy() for k, v in m.state_dict().items()})

then point ``FMRI_TPU_VGG19_NPZ`` at the file.  Keys may carry the
whole-model ``features.`` prefix or not; conv kernels are transposed
OIHW->HWIO at load.  Layout is NHWC internally.

Torch-oracle parity of the sequential (random weights, all five taps) is
asserted in ``tests/test_vgg19.py``.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIM = ("NHWC", "HWIO", "NHWC")

# torchvision vgg19 `features` layout: conv indices and the maxpool positions.
# Sequential index -> op: "C<out>" conv(3x3, pad 1) + bias, "R" relu, "M"
# maxpool(2, 2).  (torchvision cfg "E": 64 64 M 128 128 M 256x4 M 512x4 M
# 512x4 M, with a ReLU after every conv.)
_OPS: tuple = ()


def _build_ops():
    ops = []
    for c in (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"):
        if c == "M":
            ops.append("M")
        else:
            ops.append(f"C{c}")
            ops.append("R")
    return tuple(ops)


_OPS = _build_ops()

# The five tap depths the reference uses (train_utils.py:131-178): sequential
# slice end-indices; TAPS[d] for the pluggable ``depth`` arguments 1..5.
TAPS = {1: 4, 2: 9, 3: 14, 4: 18, 5: 23}


def vgg19_features(params: Dict[str, jnp.ndarray], x: jax.Array,
                   upto: int) -> jax.Array:
    """Run ``features[:upto]`` (torchvision sequential semantics) on NHWC
    ``x``.  ``params`` keys are ``"<i>.weight"`` / ``"<i>.bias"`` with HWIO
    kernels (see ``load_vgg19_npz``)."""
    for i, op in enumerate(_OPS[:upto]):
        if op == "M":
            x = lax.reduce_window(x, -jnp.inf, lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        elif op == "R":
            x = jax.nn.relu(x)
        else:
            x = lax.conv_general_dilated(
                x, params[f"{i}.weight"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=DIM) + params[f"{i}.bias"]
    return x


@lru_cache(maxsize=1)
def load_vgg19_npz(npz_path: str) -> Dict[str, jnp.ndarray]:
    raw = np.load(npz_path)
    params: Dict[str, jnp.ndarray] = {}
    for k in raw.files:
        name = k[len("features."):] if k.startswith("features.") else k
        if not name.split(".")[0].isdigit():
            continue  # classifier.* etc. from a whole-model export
        v = raw[k]
        if name.endswith(".weight") and v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
        params[name] = jnp.asarray(v)
    return params


def vgg19_npz_path() -> str | None:
    """The export location, or None when only the proxy extractor exists."""
    return os.environ.get("FMRI_TPU_VGG19_NPZ") or None


def vgg19_tap_fn(depth: int, npz_path: str | None = None):
    """``feature_fn`` for ``fmri_tpu.losses.feature_loss`` /
    ``feature_cosine_loss``: real VGG19 activations at the reference's tap
    ``depth`` (1..5, see ``TAPS``)."""
    path = npz_path or vgg19_npz_path()
    if path is None:
        raise ValueError("no VGG19 npz: set FMRI_TPU_VGG19_NPZ or pass npz_path")
    params = load_vgg19_npz(path)
    upto = TAPS[depth]
    return lambda images: vgg19_features(params, images, upto)
