"""Pure-JAX torchvision-resnet152 trunk over exported pretrained weights.

The reference's ``ResNet_VAE`` encoder (dead code upstream,
``/root/reference/models/vae_gan.py:658-702``) wraps torchvision's
*pretrained* ``resnet152`` with the classifier head removed
(``vae_gan.py:661-668``: ``list(resnet.children())[:-1]`` — everything
through the global average pool, emitting a 2048-d feature).  Pretrained
weights are not shippable in this offline build, so this module follows the
same pluggable contract as ``fmri_tpu.metrics.inception_v3`` and
``fmri_tpu.losses.vgg19``: export once on any machine with torchvision —

    import numpy as np, torchvision
    m = torchvision.models.resnet152(weights="IMAGENET1K_V1").eval()
    np.savez("resnet152.npz",
             **{k: v.numpy() for k, v in m.state_dict().items()})

then point ``FMRI_TPU_RESNET152_NPZ`` at the file and construct
``ResNetEncoder(cfg, trunk_fn=resnet152_trunk_fn())``.  Without the export,
``ResNetEncoder`` falls back to its compact from-scratch residual trunk.

The trunk runs in eval mode (BatchNorm uses the exported running stats) and
its weights are closed-over constants, not Flax params — the pretrained
trunk is a frozen feature extractor; only the head on top of it trains.
Layout is NHWC; conv kernels are transposed OIHW->HWIO at load.

Torch-oracle parity (random weights + running stats, bottleneck geometry)
is asserted in ``tests/test_resnet152.py``.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIM = ("NHWC", "HWIO", "NHWC")

# torchvision resnet152: Bottleneck blocks per stage; planes 64/128/256/512,
# expansion 4 (final feature width 2048).
RESNET152_LAYERS: Tuple[int, int, int, int] = (3, 8, 36, 3)
_BN_EPS = 1e-5


def _bn(p: Dict[str, jnp.ndarray], prefix: str, x: jax.Array) -> jax.Array:
    """Eval-mode BatchNorm2d over the exported running statistics."""
    scale = p[f"{prefix}.weight"] * lax.rsqrt(p[f"{prefix}.running_var"]
                                              + _BN_EPS)
    return x * scale + (p[f"{prefix}.bias"]
                        - p[f"{prefix}.running_mean"] * scale)


def _conv(x: jax.Array, w: jax.Array, stride: int, padding: int) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=DIM)


def resnet_trunk(params: Dict[str, jnp.ndarray], x: jax.Array,
                 layers: Tuple[int, ...] = RESNET152_LAYERS) -> jax.Array:
    """conv1 .. layer4 .. global-avg-pool on NHWC ``x`` -> [B, 512*4].

    Mirrors torchvision's ``ResNet(Bottleneck, layers)`` eval forward
    (the reference consumes it via ``children()[:-1]``,
    ``vae_gan.py:666-668``).
    """
    h = _conv(x, params["conv1.weight"], 2, 3)
    h = jax.nn.relu(_bn(params, "bn1", h))
    h = lax.reduce_window(h, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            pre = f"layer{li}.{b}"
            stride = 2 if (b == 0 and li > 1) else 1
            identity = h
            y = jax.nn.relu(_bn(params, f"{pre}.bn1",
                                _conv(h, params[f"{pre}.conv1.weight"], 1, 0)))
            y = jax.nn.relu(_bn(params, f"{pre}.bn2",
                                _conv(y, params[f"{pre}.conv2.weight"],
                                      stride, 1)))
            y = _bn(params, f"{pre}.bn3",
                    _conv(y, params[f"{pre}.conv3.weight"], 1, 0))
            if f"{pre}.downsample.0.weight" in params:
                identity = _bn(params, f"{pre}.downsample.1",
                               _conv(h, params[f"{pre}.downsample.0.weight"],
                                     stride, 0))
            h = jax.nn.relu(y + identity)
    return jnp.mean(h, axis=(1, 2))


@lru_cache(maxsize=1)
def load_resnet152_npz(npz_path: str) -> Dict[str, jnp.ndarray]:
    raw = np.load(npz_path)
    params: Dict[str, jnp.ndarray] = {}
    for k in raw.files:
        if k.startswith("fc.") or k.endswith("num_batches_tracked"):
            continue  # classifier head is dropped by the reference
        v = raw[k]
        if k.endswith(".weight") and v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
        params[k] = jnp.asarray(v)
    return params


def resnet152_npz_path() -> str | None:
    """The export location, or None when only the from-scratch trunk exists."""
    return os.environ.get("FMRI_TPU_RESNET152_NPZ") or None


def resnet152_trunk_fn(npz_path: str | None = None,
                       layers: Tuple[int, ...] = RESNET152_LAYERS):
    """``trunk_fn`` for ``fmri_tpu.models.ResNetEncoder``: frozen pretrained
    features [B, 2048] from exported torchvision resnet152 weights."""
    path = npz_path or resnet152_npz_path()
    if path is None:
        raise ValueError(
            "no resnet152 npz: set FMRI_TPU_RESNET152_NPZ or pass npz_path")
    params = load_resnet152_npz(path)
    return lambda images: resnet_trunk(params, images, layers)
