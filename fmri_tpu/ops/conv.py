"""Low-level convolution primitives, NHWC / TPU-native layouts.

The reference's conv geometry (PyTorch ``nn.Conv2d`` / ``nn.ConvTranspose2d``,
``models/vae_gan.py:18,46-53``) is reproduced as explicit ``lax`` calls so the
layout is NHWC end-to-end (TPU-friendly: the channel axis rides the 128-lane
dimension) instead of the reference's NCHW.

Transposed convolution is expressed as an input-dilated convolution — the exact
gradient-of-conv formulation — so XLA lowers it straight onto the MXU with no
scatter.  PyTorch's ``ConvTranspose2d(k, s, p, output_padding=op)`` produces
``(in-1)*s - 2p + k + op`` output pixels; the equivalent dilated conv uses
``lhs_dilation=s`` and per-edge padding ``(k-1-p, k-1-p+op)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels.
DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _cast_operands(x, kernel, compute_dtype):
    """Optionally run the MXU contraction in a lower precision (bfloat16 —
    the TPU-native fast path; the MXU accumulates fp32 internally).  Both
    operands must share a dtype, and the output is cast back to float32 at
    the op boundary so the rest of the graph (BatchNorm, losses) stays fp32
    — this also keeps the VJP dtype-consistent."""
    if compute_dtype is None:
        return x, kernel, False
    cd = jnp.dtype(compute_dtype)
    return x.astype(cd), kernel.astype(cd), True


def conv2d(x: jax.Array, kernel: jax.Array, stride: int = 1, padding: int = 0,
           compute_dtype=None, pallas_backward: bool = False,
           alt_backward: bool = False) -> jax.Array:
    """Standard strided conv, matching ``nn.Conv2d(k, s, p)`` shapes.

    x: [B, H, W, Cin]; kernel: [kh, kw, Cin, Cout].
    ``compute_dtype='bfloat16'`` feeds the MXU in bf16 (fp32 result).
    ``pallas_backward=True`` routes the weight grad through the Pallas
    tap-matmul kernel (``fmri_tpu.ops.pallas_dw``) instead of XLA's
    transpose-heavy conv-weight-grad lowering; forward and input grad are
    unchanged.  Gradient equivalence: ``tests/test_pallas_dw.py``.
    ``alt_backward=True`` instead swaps in the ``fmri_tpu.ops.conv_alt``
    algebraic rewrites where they apply (subpixel-phase dX for k5/p2 stride-2
    convs; patches dW for stride-1 convs with <=16 output channels — the
    per-op weak spots of XLA's stock backward, docs/design.md §8b); takes
    effect only where a rewrite exists, and ``pallas_backward`` wins if both
    are set.  Gradient equivalence: ``tests/test_conv_alt.py``.
    """
    k, co = kernel.shape[0], kernel.shape[-1]
    # pallas_dw supports stride 1 (any k/p) and the k5/p2 stride-2 geometry;
    # anything else falls back to the stock backward (same contract as
    # alt_backward below — flipping a ModelConfig flag must never crash an
    # out-of-scope layer).
    if pallas_backward and (stride == 1
                            or (stride == 2 and k == 5 and padding == 2)):
        return _conv2d_pdw(x, kernel, stride, padding, _dtype_key(compute_dtype))
    # The phase rewrite needs exact spatial halving (even H/W — res100's odd
    # 25x25 layer falls back to the stock backward).
    even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    if alt_backward and ((stride == 2 and k == 5 and padding == 2 and even)
                         or (stride == 1 and co <= 16)):
        return _conv2d_alt(x, kernel, stride, padding, _dtype_key(compute_dtype))
    x, kernel, cast_back = _cast_operands(x, kernel, compute_dtype)
    out = lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMSPEC,
    )
    return out.astype(jnp.float32) if cast_back else out


def _dtype_key(compute_dtype) -> str | None:
    """Hashable form of compute_dtype for custom_vjp nondiff args."""
    return None if compute_dtype is None else jnp.dtype(compute_dtype).name


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv2d_pdw(x, kernel, stride, padding, compute_dtype):
    return conv2d(x, kernel, stride, padding, compute_dtype)


def _conv2d_pdw_fwd(x, kernel, stride, padding, compute_dtype):
    return conv2d(x, kernel, stride, padding, compute_dtype), (x, kernel)


def _conv2d_pdw_bwd(stride, padding, compute_dtype, res, dy):
    from fmri_tpu.ops import pallas_dw as _pdw  # deferred: keeps import light

    x, kernel = res
    dx = jax.vjp(
        lambda xx: conv2d(xx, kernel, stride, padding, compute_dtype), x
    )[1](dy)[0]
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        xc, dyc = x.astype(cd), dy.astype(cd)
    else:
        xc, dyc = x, dy
    try:
        dw = _pdw.conv2d_dw(xc, dyc, stride=stride, padding=padding,
                            k=kernel.shape[0])
    except _pdw.VmemOverflow:  # geometry too large for a 1-sample tile
        dw = jax.vjp(
            lambda ww: conv2d(x, ww, stride, padding, compute_dtype), kernel
        )[1](dy)[0]
    return dx, dw.astype(kernel.dtype)


_conv2d_pdw.defvjp(_conv2d_pdw_fwd, _conv2d_pdw_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv2d_alt(x, kernel, stride, padding, compute_dtype):
    return conv2d(x, kernel, stride, padding, compute_dtype)


def _conv2d_alt_fwd(x, kernel, stride, padding, compute_dtype):
    return conv2d(x, kernel, stride, padding, compute_dtype), (x, kernel)


def _conv2d_alt_bwd(stride, padding, compute_dtype, res, dy):
    from fmri_tpu.ops import conv_alt as _alt  # deferred: keeps import light

    x, kernel = res
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        xc, kc, dyc = x.astype(cd), kernel.astype(cd), dy.astype(cd)
    else:
        xc, kc, dyc = x, kernel, dy
    if stride == 2:
        dx = _alt.conv2d_dx_phases(dyc, kc, x.shape[1:3], padding)
    else:
        dx = jax.vjp(
            lambda xx: conv2d(xx, kernel, stride, padding, compute_dtype), x
        )[1](dy)[0]
    if stride == 1 and kernel.shape[-1] <= 16:
        dw = _alt.conv2d_dw_patches(xc, dyc, padding, k=kernel.shape[0])
    else:
        dw = jax.vjp(
            lambda ww: conv2d(x, ww, stride, padding, compute_dtype), kernel
        )[1](dy)[0]
    return dx.astype(x.dtype), dw.astype(kernel.dtype)


_conv2d_alt.defvjp(_conv2d_alt_fwd, _conv2d_alt_bwd)


def conv2d_transpose(
    x: jax.Array,
    kernel: jax.Array,
    stride: int = 2,
    padding: int = 2,
    output_padding: int = 0,
    compute_dtype=None,
    pallas_backward: bool = False,
) -> jax.Array:
    """Transposed conv matching ``nn.ConvTranspose2d`` output geometry
    (``models/vae_gan.py:46-53``): out = (in-1)*stride - 2*padding + k + output_padding.

    No kernel flip happens here: this op computes a dilated *correlation*,
    while torch's deconv scatters its kernel (a dilated convolution).  Torch
    checkpoint interop exists — ``fmri_tpu/checkpoints/torch_import.py``
    (``_deconv``) performs the 180-degree spatial rotation once at conversion
    time, so adding a flip in this op would silently break import parity.
    """
    # pallas_dw's deconv dW derivation is specific to the k5/p2/s2 scatter
    # geometry; other geometries take the stock backward (see conv2d).
    if pallas_backward and (stride == 2 and padding == 2
                            and kernel.shape[0] == 5):
        return _deconv_pdw(x, kernel, stride, padding, output_padding,
                           _dtype_key(compute_dtype))
    k = kernel.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    x, kernel, cast_back = _cast_operands(x, kernel, compute_dtype)
    out = lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=[(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMSPEC,
    )
    return out.astype(jnp.float32) if cast_back else out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _deconv_pdw(x, kernel, stride, padding, output_padding, compute_dtype):
    return conv2d_transpose(x, kernel, stride, padding, output_padding,
                            compute_dtype)


def _deconv_pdw_fwd(x, kernel, stride, padding, output_padding, compute_dtype):
    out = conv2d_transpose(x, kernel, stride, padding, output_padding,
                           compute_dtype)
    return out, (x, kernel)


def _deconv_pdw_bwd(stride, padding, output_padding, compute_dtype, res, dy):
    from fmri_tpu.ops import pallas_dw as _pdw

    x, kernel = res
    dx = jax.vjp(
        lambda xx: conv2d_transpose(xx, kernel, stride, padding,
                                    output_padding, compute_dtype), x
    )[1](dy)[0]
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        xc, dyc = x.astype(cd), dy.astype(cd)
    else:
        xc, dyc = x, dy
    try:
        dw = _pdw.conv2d_transpose_dw(xc, dyc, stride=stride, padding=padding,
                                      output_padding=output_padding,
                                      k=kernel.shape[0])
    except _pdw.VmemOverflow:  # geometry too large for a 1-sample tile
        dw = jax.vjp(
            lambda ww: conv2d_transpose(x, ww, stride, padding,
                                        output_padding, compute_dtype), kernel
        )[1](dy)[0]
    return dx, dw.astype(kernel.dtype)


_deconv_pdw.defvjp(_deconv_pdw_fwd, _deconv_pdw_bwd)


def depthwise_conv2d(x: jax.Array, kernel: jax.Array, padding: int = 0) -> jax.Array:
    """Depthwise conv (feature_group_count = channels); used by windowed SSIM
    (reference ``train/train_utils.py:390-401`` uses grouped ``F.conv2d``).

    x: [B, H, W, C]; kernel: [kh, kw, 1, C].

    ``precision=HIGHEST`` is load-bearing: SSIM's variance terms are the
    cancellation ``E[x^2] - E[x]^2``, and on TPU the default conv precision
    feeds the MXU bf16 operands — the resulting sigma estimates go negative
    enough to push SSIM far above 1.
    """
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMSPEC,
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
