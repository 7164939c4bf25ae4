"""Pure-JAX Inception-v3 forward over exported torchvision weights.

The reference computes Inception Score with torchvision's pretrained
``inception_v3(pretrained=True, transform_input=False)``
(``train/train_utils.py:848-858``).  Pretrained weights are not shippable in
this offline build, so this module implements the exact torchvision
architecture as a pure function over a *flat parameter dict keyed by the
torchvision ``state_dict`` names* — export once on any machine with
torchvision access:

    import numpy as np, torchvision
    m = torchvision.models.inception_v3(pretrained=True, aux_logits=True).eval()
    np.savez("inception_v3.npz",
             **{k: v.numpy() for k, v in m.state_dict().items()})

then point ``FMRI_TPU_INCEPTION_NPZ`` at the file.  Layout is NHWC internally;
conv kernels are transposed OIHW->HWIO at load time.  BatchNorm eps matches
torchvision's 0.001; aux-classifier weights are ignored.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DIM = ("NHWC", "HWIO", "NHWC")
BN_EPS = 0.001


def _conv_bn(p: Dict[str, jnp.ndarray], name: str, x, stride=1, padding=(0, 0)):
    """torchvision ``BasicConv2d``: conv(no bias) + BN(eps 1e-3) + relu."""
    w = p[f"{name}.conv.weight"]
    if isinstance(padding, int):
        padding = (padding, padding)
    x = lax.conv_general_dilated(
        x, w, (stride, stride),
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=DIM)
    mean = p[f"{name}.bn.running_mean"]
    var = p[f"{name}.bn.running_var"]
    gamma = p[f"{name}.bn.weight"]
    beta = p[f"{name}.bn.bias"]
    x = (x - mean) * gamma * lax.rsqrt(var + BN_EPS) + beta
    return jax.nn.relu(x)


def _conv_bn_hw(p, name, x, padding_hw):
    """BasicConv2d with asymmetric (ph, pw) padding (1x7 / 7x1 / 1x3 / 3x1)."""
    w = p[f"{name}.conv.weight"]
    x = lax.conv_general_dilated(
        x, w, (1, 1), [(padding_hw[0], padding_hw[0]),
                       (padding_hw[1], padding_hw[1])],
        dimension_numbers=DIM)
    mean = p[f"{name}.bn.running_mean"]
    var = p[f"{name}.bn.running_var"]
    x = (x - mean) * p[f"{name}.bn.weight"] * lax.rsqrt(var + BN_EPS) \
        + p[f"{name}.bn.bias"]
    return jax.nn.relu(x)


def _maxpool(x, k=3, s=2):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
                             "VALID")


def _avgpool_same(x, k=3):
    """torchvision's branch pools are ``F.avg_pool2d(k=3, s=1, p=1)`` with the
    torch default ``count_include_pad=True``: the divisor is k*k everywhere,
    including edge windows that overlap the zero padding (verified against
    the torch oracle in ``tests/test_inception_v3.py``)."""
    summed = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, 1, 1, 1),
                               "SAME")
    return summed / float(k * k)


def _inception_a(p, n, x):
    b1 = _conv_bn(p, f"{n}.branch1x1", x)
    b5 = _conv_bn(p, f"{n}.branch5x5_1", x)
    b5 = _conv_bn(p, f"{n}.branch5x5_2", b5, padding=2)
    b3 = _conv_bn(p, f"{n}.branch3x3dbl_1", x)
    b3 = _conv_bn(p, f"{n}.branch3x3dbl_2", b3, padding=1)
    b3 = _conv_bn(p, f"{n}.branch3x3dbl_3", b3, padding=1)
    bp = _conv_bn(p, f"{n}.branch_pool", _avgpool_same(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, n, x):
    b3 = _conv_bn(p, f"{n}.branch3x3", x, stride=2)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_3", bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _inception_c(p, n, x):
    b1 = _conv_bn(p, f"{n}.branch1x1", x)
    b7 = _conv_bn(p, f"{n}.branch7x7_1", x)
    b7 = _conv_bn_hw(p, f"{n}.branch7x7_2", b7, (0, 3))
    b7 = _conv_bn_hw(p, f"{n}.branch7x7_3", b7, (3, 0))
    bd = _conv_bn(p, f"{n}.branch7x7dbl_1", x)
    bd = _conv_bn_hw(p, f"{n}.branch7x7dbl_2", bd, (3, 0))
    bd = _conv_bn_hw(p, f"{n}.branch7x7dbl_3", bd, (0, 3))
    bd = _conv_bn_hw(p, f"{n}.branch7x7dbl_4", bd, (3, 0))
    bd = _conv_bn_hw(p, f"{n}.branch7x7dbl_5", bd, (0, 3))
    bp = _conv_bn(p, f"{n}.branch_pool", _avgpool_same(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, n, x):
    b3 = _conv_bn(p, f"{n}.branch3x3_1", x)
    b3 = _conv_bn(p, f"{n}.branch3x3_2", b3, stride=2)
    b7 = _conv_bn(p, f"{n}.branch7x7x3_1", x)
    b7 = _conv_bn_hw(p, f"{n}.branch7x7x3_2", b7, (0, 3))
    b7 = _conv_bn_hw(p, f"{n}.branch7x7x3_3", b7, (3, 0))
    b7 = _conv_bn(p, f"{n}.branch7x7x3_4", b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _inception_e(p, n, x):
    b1 = _conv_bn(p, f"{n}.branch1x1", x)
    b3 = _conv_bn(p, f"{n}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _conv_bn_hw(p, f"{n}.branch3x3_2a", b3, (0, 1)),
        _conv_bn_hw(p, f"{n}.branch3x3_2b", b3, (1, 0)),
    ], axis=-1)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn_hw(p, f"{n}.branch3x3dbl_3a", bd, (0, 1)),
        _conv_bn_hw(p, f"{n}.branch3x3dbl_3b", bd, (1, 0)),
    ], axis=-1)
    bp = _conv_bn(p, f"{n}.branch_pool", _avgpool_same(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_v3_logits(p: Dict[str, jnp.ndarray], x: jax.Array) -> jax.Array:
    """x: [B, 299, 299, 3] (ImageNet-normalized like torchvision's eval path,
    transform_input=False) -> logits [B, 1000]."""
    x = _conv_bn(p, "Conv2d_1a_3x3", x, stride=2)
    x = _conv_bn(p, "Conv2d_2a_3x3", x)
    x = _conv_bn(p, "Conv2d_2b_3x3", x, padding=1)
    x = _maxpool(x)
    x = _conv_bn(p, "Conv2d_3b_1x1", x)
    x = _conv_bn(p, "Conv2d_4a_3x3", x)
    x = _maxpool(x)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(p, n, x)
    x = _inception_b(p, "Mixed_6a", x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(p, n, x)
    x = _inception_d(p, "Mixed_7a", x)
    for n in ("Mixed_7b", "Mixed_7c"):
        x = _inception_e(p, n, x)
    x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
    return x @ p["fc.weight"].T + p["fc.bias"]


@lru_cache(maxsize=1)
def _load_params(npz_path: str):
    raw = np.load(npz_path)
    params: Dict[str, jnp.ndarray] = {}
    for k in raw.files:
        if k.startswith("AuxLogits") or k.endswith("num_batches_tracked"):
            continue
        v = raw[k]
        if k.endswith("conv.weight"):
            v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
        params[k] = jnp.asarray(v)
    return params


def classify_with_weights(npz_path: str, images: jax.Array,
                          batch_size: int = 32) -> np.ndarray:
    """images: [B, H, W, 3] in [-1, 1] -> softmax probs [B, 1000], matching
    the reference's upsample-to-299 + Inception-v3 pass
    (``train_utils.py:848-866``)."""
    p = _load_params(npz_path)

    @jax.jit
    def run(batch):
        batch = jax.image.resize(
            batch, (batch.shape[0], 299, 299, 3), "bilinear")
        return jax.nn.softmax(inception_v3_logits(p, batch), axis=-1)

    out = []
    n = images.shape[0]
    for i in range(0, n, batch_size):
        chunk = images[i : i + batch_size]
        if chunk.shape[0] < batch_size:  # pad to the compiled batch shape
            pad = batch_size - chunk.shape[0]
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out.append(np.asarray(run(chunk))[: batch_size - pad])
        else:
            out.append(np.asarray(run(chunk)))
    return np.concatenate(out)
