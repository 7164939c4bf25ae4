"""Pallas TPU weight-gradient kernels: tap-matmul dW without HBM transposes.

XLA's conv weight grad contracts over (batch, spatial), which its TPU
lowering implements with whole-tensor layout transposes through HBM; measured
on a v5e (``benchmarks/conv_breakdown.py``) the deconv weight grads of the
decoder run at 37-53% of peak and the 3-channel output conv at <12%, while
the forward convs run at 80-110%.  This module computes dW as a sum of 25
per-tap MXU matmuls accumulated in VMEM across a batch-tiled grid — no HBM
transpose ever materializes:

    dW[kh, kw] = sum over batch tiles of  X_tap(kh, kw)^T @ dY

where ``X_tap`` is a statically shifted slice of a (parity-split, padded)
input plane.  Stride-2 convs read X from 2x2 parity planes (the shifted
slice of a strided read becomes a contiguous slice of a parity plane);
transposed convs instead parity-split the *cotangent* (the scatter pattern
of ``ConvTranspose2d`` — reference ``models/vae_gan.py:38-60`` — touches
each output parity from a distinct kernel-tap subset).

Used by ``fmri_tpu.ops.conv`` through ``jax.custom_vjp`` when
``pallas_backward`` is enabled; gradient equivalence vs the XLA backward is
asserted in ``tests/test_pallas_dw.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working budget per program (bytes); leaves headroom of the ~16 MB for
# the fp32 accumulator output and Mosaic bookkeeping.
_VMEM_BUDGET = 13 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class VmemOverflow(Exception):
    """Raised at trace time when even a one-sample batch tile exceeds the
    VMEM budget — callers (``fmri_tpu.ops.conv``) catch this and fall back
    to the stock XLA weight grad, preserving the contract that flipping
    ``pallas_backward`` on an out-of-scope geometry must never crash."""


def _pick_tb(batch: int, bytes_per_sample: int) -> int:
    """Largest divisor of ``batch`` whose tile fits the VMEM budget.

    ``bytes_per_sample`` must count EVERYTHING proportional to the tile: the
    double-buffered input blocks plus the kernel's per-tap reshape temps —
    Mosaic's stack allocator keeps each unrolled tap's relayout copy live for
    the whole body (measured: a 16-sample disc-shape tile wanted 50.5 MB of
    scoped vmem, ~25x the tap temp + 2x the blocks), so undercounting OOMs
    at compile time on real hardware.
    """
    if bytes_per_sample > _VMEM_BUDGET:
        raise VmemOverflow(
            f"one-sample tile needs {bytes_per_sample} B > "
            f"{_VMEM_BUDGET} B VMEM budget")
    tb = max(1, min(batch, _VMEM_BUDGET // max(bytes_per_sample, 1)))
    while batch % tb:
        tb -= 1
    return tb


def _tap_matmul(lhs: jax.Array, rhs: jax.Array,
                taps: Tuple[Tuple[int, int, int, int], ...],
                oh: int, ow: int, swap: bool) -> jax.Array:
    """Core kernel: ``out[t] = sum_b lhs[lp, b, h0:h0+oh, w0:w0+ow]^T @ rhs[rq, b]``.

    lhs: [P, B, Hp, Wp, Ci]; rhs: [Q, B, oh, ow, Co]; taps: static
    (lp, rq, h0, w0) per kernel tap.  ``swap`` computes [t, Co, Ci] instead
    (better MXU lane utilization when Co < Ci, e.g. the 3-channel out conv).
    Accumulation is fp32 across a batch-tiled sequential grid.
    """
    p, b, hp, wp, ci = lhs.shape
    q, _, _, _, co = rhs.shape
    t = len(taps)
    esz = lhs.dtype.itemsize
    out_shape = (t, co, ci) if swap else (t, ci, co)
    # Per-sample VMEM bill: 2x double-buffered in-blocks + one live reshape
    # temp per unrolled tap (lhs-side a2) + one per distinct rhs plane (d2).
    n_rq = len({tap[1] for tap in taps})
    per_sample = (
        2 * (p * hp * wp * ci + q * oh * ow * co)   # in-blocks, double-buffered
        + t * oh * ow * ci                           # a2 copies, all taps live
        + n_rq * oh * ow * co                        # d2 copies
    ) * esz
    tb = _pick_tb(b, per_sample)

    def kernel(lhs_ref, rhs_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for ti, (lp, rq, h0, w0) in enumerate(taps):
            a = lhs_ref[lp, :, h0:h0 + oh, w0:w0 + ow, :]
            d = rhs_ref[rq]
            a2 = a.reshape(tb * oh * ow, ci)
            d2 = d.reshape(tb * oh * ow, co)
            x, y = (d2, a2) if swap else (a2, d2)
            out_ref[ti] += jax.lax.dot_general(
                x, y, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((p, tb, hp, wp, ci), lambda i: (0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, tb, oh, ow, co), lambda i: (0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=_interpret(),
    )(lhs, rhs)


def _maybe_swap(ci: int, co: int) -> bool:
    # compute [Co, Ci] when Co is lane-starved and Ci is not
    return co < 64 <= ci


def conv2d_dw(x: jax.Array, dy: jax.Array, stride: int, padding: int,
              k: int = 5) -> jax.Array:
    """Weight grad of ``conv2d(x, w, stride, padding)``: [k, k, Ci, Co].

    stride 1 or 2; geometry matches ``fmri_tpu.ops.conv.conv2d``.
    """
    b, h, w, ci = x.shape
    _, oh, ow, co = dy.shape
    if stride == 1:
        # single plane, padded by `padding` both sides; tap start = (kh, kw)
        # taps read rows [kh, kh+oh) with kh <= k-1, so the plane needs
        # exactly oh+k-1 rows: high pad = oh+k-1-h-padding (NOT +padding —
        # that over-allocates p zero rows/cols per plane and inflates the
        # _pick_tb VMEM estimate)
        xp = jnp.pad(x, ((0, 0), (padding, oh + k - 1 - h - padding),
                         (padding, ow + k - 1 - w - padding),
                         (0, 0)))
        planes = xp[None]
        taps = tuple((0, 0, kh, kw) for kh in range(k) for kw in range(k))
    elif stride == 2:
        # parity planes: plane p holds x rows p, p+2, ... shifted by the
        # conv padding; tap (kh, kw) reads plane (kh%2, kw%2) at start kh//2
        # (derivation in the module docstring; padding must be 2, k 5)
        assert padding == 2 and k == 5, (padding, k)
        hp = 2 * oh + 4
        wp = 2 * ow + 4
        xp = jnp.pad(x, ((0, 0), (2, hp - 2 - h), (2, wp - 2 - w), (0, 0)))
        planes = jnp.stack(
            [xp[:, ph::2, pw::2][:, :oh + 2, :ow + 2]
             for ph in range(2) for pw in range(2)])
        taps = tuple((2 * (kh % 2) + (kw % 2), 0, kh // 2, kw // 2)
                     for kh in range(k) for kw in range(k))
    else:
        raise NotImplementedError(f"stride {stride}")
    swap = _maybe_swap(ci, co)
    out = _tap_matmul(planes, dy[None], taps, oh, ow, swap)
    if swap:
        out = out.transpose(0, 2, 1)
    return out.reshape(k, k, ci, co)


def conv2d_transpose_dw(x: jax.Array, dy: jax.Array, stride: int = 2,
                        padding: int = 2, output_padding: int = 0,
                        k: int = 5) -> jax.Array:
    """Weight grad of ``conv2d_transpose(x, w, ...)``: [k, k, Ci, Co].

    The deconv scatters each input pixel to a 2x2-parity output pattern, so
    dW tap (kh, kw) contracts the (kh%2, kw%2) parity plane of the cotangent
    with x shifted by (kh%2 + kh - 2)//2 (geometry of
    ``fmri_tpu.ops.conv.conv2d_transpose``: lo = k-1-padding, out =
    (in-1)*stride - 2*padding + k + output_padding).
    """
    assert stride == 2 and padding == 2 and k == 5, (stride, padding, k)
    b, h, w, ci = x.shape
    _, oh, ow, co = dy.shape
    # pad the cotangent to the full 2h x 2w scatter grid (output_padding=0
    # produces one fewer row/col; the padded row contributes zero)
    dyp = jnp.pad(dy, ((0, 0), (0, 2 * h - oh), (0, 2 * w - ow), (0, 0)))
    planes_dy = jnp.stack(
        [dyp[:, ph::2, pw::2] for ph in range(2) for pw in range(2)])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))[None]

    def start(kh):  # slice start into xp (1 + dh)
        return 1 + ((kh % 2) + kh - 2) // 2

    taps = tuple((0, 2 * (kh % 2) + (kw % 2), start(kh), start(kw))
                 for kh in range(k) for kw in range(k))
    swap = _maybe_swap(ci, co)
    out = _tap_matmul(xp, planes_dy, taps, h, w, swap)
    if swap:
        out = out.transpose(0, 2, 1)
    return out.reshape(k, k, ci, co)
