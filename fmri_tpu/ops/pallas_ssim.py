"""Pallas TPU kernel for windowed SSIM statistics.

The XLA path (``fmri_tpu.metrics.quality.ssim``) issues six depthwise
convolutions per SSIM call — each re-reads its input from HBM
(``train_utils.py:390-401`` does the same with grouped ``F.conv2d``).  This
kernel computes the whole SSIM map in **one pass per (image, channel)**: the
padded inputs are read once into VMEM, the five windowed moments (x, y, x²,
y², xy) are produced by a separable 11-tap gaussian implemented as static
shift-accumulate (VPU ops entirely in VMEM), and the SSIM map is written out
directly — no intermediate HBM traffic.

Grid: (B, C).  Block = one padded channel plane.  On non-TPU backends the
kernel runs in interpreter mode (tests), so the API is usable everywhere.

Forward-only (a metric, like the reference's use at ``train_utils.py:740``):
no custom VJP is defined.  For a differentiable SSIM (e.g. as a loss) use
``fmri_tpu.metrics.quality.ssim``, whose depthwise convs are XLA-differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C1 = 0.01**2
C2 = 0.03**2


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Normalized 1D gaussian — same taps as
    ``fmri_tpu.metrics.quality.gaussian_window`` (kept local to avoid a
    circular import between ops and metrics)."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return g / g.sum()


def _separable_blur(p, g, h, w):
    """Valid-mode separable correlation with static shift-accumulate.

    p: [h + 2*pad, w + 2*pad] padded plane -> [h, w] blurred plane.
    """
    k = len(g)
    # row pass: contract the second axis
    rows = g[0] * p[:, 0:w]
    for t in range(1, k):
        rows = rows + g[t] * p[:, t : t + w]
    # col pass: contract the first axis
    out = g[0] * rows[0:h, :]
    for t in range(1, k):
        out = out + g[t] * rows[t : t + h, :]
    return out


def _ssim_kernel(x_ref, y_ref, out_ref, *, g, h, w):
    x = x_ref[0, 0]
    y = y_ref[0, 0]
    mu1 = _separable_blur(x, g, h, w)
    mu2 = _separable_blur(y, g, h, w)
    xx = _separable_blur(x * x, g, h, w)
    yy = _separable_blur(y * y, g, h, w)
    xy = _separable_blur(x * y, g, h, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = xx - mu1_sq
    s2 = yy - mu2_sq
    s12 = xy - mu12
    score = ((2.0 * mu12 + C1) * (2.0 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    out_ref[0, 0] = score


@functools.partial(jax.jit, static_argnames=("window_size", "size_average",
                                             "interpret"))
def ssim_pallas(img1: jax.Array, img2: jax.Array, window_size: int = 11,
                size_average: bool = True, interpret: bool | None = None):
    """Drop-in for :func:`fmri_tpu.metrics.quality.ssim` (same math: gaussian
    sigma=1.5, zero padding of ``window_size//2``, C1/C2 without the dynamic
    range factor — ``train_utils.py:345-425``).

    img1/img2: [B, H, W, C] float32.
    """
    b, h, w, c = img1.shape
    real_size = min(window_size, h, w)
    pad = window_size // 2  # reference pads by window_size//2 (:376)
    g = tuple(float(v) for v in _gaussian_window(real_size))

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    # [B, C, H+2p, W+2p] zero-padded planes, channel-major so each grid cell
    # owns one contiguous plane.
    def prep(img):
        x = jnp.transpose(img, (0, 3, 1, 2)).astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))

    x = prep(img1)
    y = prep(img2)
    hp = h + 2 * pad - (real_size - 1)  # valid output height
    wp = w + 2 * pad - (real_size - 1)

    kernel = functools.partial(_ssim_kernel, g=g, h=hp, w=wp)
    block_in = pl.BlockSpec((1, 1, h + 2 * pad, w + 2 * pad),
                            lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    score = pl.pallas_call(
        kernel,
        grid=(b, c),
        in_specs=[block_in, block_in],
        out_specs=pl.BlockSpec((1, 1, hp, wp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), jnp.float32),
        interpret=interpret,
    )(x, y)

    if size_average:
        return jnp.mean(score)
    return jnp.mean(score, axis=(1, 2, 3))
