"""Pallas TPU kernels for the train-mode BatchNorm backward.

The round-1 step profile attributes 16.6% of the flagship step to
``convert_reduce_fusion`` — the BatchNorm backward's channel reductions
(docs/design.md §8).  The backward is information-theoretically two passes
over (x, dy):

    pass 1 (reduce):   s_dy = sum dy,   s_dyx = sum dy * xhat
    pass 2 (apply):    dx = gamma*inv/M * (M*dy - s_dy - xhat * s_dyx)

with ``xhat = (x - mu) * inv`` recomputed on the fly (cheaper than saving a
third full tensor).  These kernels implement exactly that: one VMEM-resident
dual-reduction kernel (both sums in a single read of x and dy) and one
elementwise apply kernel, each a 1-D grid over row tiles of the
``[M, C] = [B*H*W, C]`` flattening.  Inputs may be bf16 (halving the HBM
bill — the dominant cost); all arithmetic accumulates fp32.

``batch_norm_train`` wraps forward + backward in a ``jax.custom_vjp`` with
BatchNorm semantics matching ``flax.linen.BatchNorm`` (biased variance,
train mode); gradient equivalence vs plain autodiff is asserted in
``tests/test_pallas_bn.py``.  Wired into the model via
``fmri_tpu.models.nets`` when ``ModelConfig.pallas_bn`` is set (reference
BN usage: ``models/vae_gan.py:22,55`` — BatchNorm2d after every conv).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_tile(m: int, c: int, n_bufs: int, esz: int) -> int | None:
    """Largest power-of-two row tile whose ``n_bufs`` double-buffered
    [tm, C] blocks fit the VMEM budget (lane padding counted: C pads to a
    multiple of 128).  Mosaic requires the sublane block dim be a multiple
    of 8 or the full array — so the cap is rounded DOWN to a power of two
    before the divisibility walk (the raw cap can carry odd factors that a
    power-of-two m never sheds).  Returns ``None`` when no admissible tile
    exists (no tile >=8 divides m and the whole array overflows the budget
    — e.g. m=62500 at the reference res100 batch): callers must fall back
    to the XLA backward rather than emit a block Mosaic will reject."""
    c_pad = max(128, -(-c // 128) * 128)
    per_row = n_bufs * 2 * c_pad * esz
    cap = max(8, min(m, _VMEM_BUDGET // per_row))
    tm = 1 << (cap.bit_length() - 1)
    while m % tm and tm > 8:
        tm //= 2
    if tm >= 8 and m % tm == 0:
        return tm
    return m if m * per_row // 2 <= _VMEM_BUDGET else None


def bn_bwd_reduce(x: jax.Array, dy: jax.Array, mu: jax.Array,
                  inv: jax.Array) -> jax.Array:
    """Both backward sums in ONE pass over (x, dy): returns [2, C] fp32 with
    row 0 = sum(dy), row 1 = sum(dy * xhat)."""
    m, c = x.shape
    tm = _row_tile(m, c, n_bufs=2, esz=x.dtype.itemsize)
    assert tm is not None, (m, c)  # callers pre-check via _tileable

    def kernel(mu_ref, inv_ref, x_ref, dy_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        xhat = (x_ref[:].astype(jnp.float32) - mu_ref[:]) * inv_ref[:]
        dyf = dy_ref[:].astype(jnp.float32)
        out_ref[0, :] += jnp.sum(dyf, axis=0)
        out_ref[1, :] += jnp.sum(dyf * xhat, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=_interpret(),
    )(mu[None], inv[None], x, dy)


def bn_bwd_apply(x: jax.Array, dy: jax.Array, mu: jax.Array, inv: jax.Array,
                 gamma: jax.Array, sums: jax.Array,
                 a0: jax.Array, a1: jax.Array) -> jax.Array:
    """dx = gamma*inv/M * (M*dy - s_dy - xhat*s_dyx) + a0 + a1*xhat.

    The affine tail (a0, a1 — [C] rows) carries the cotangents of the
    (mu, var) outputs: d mu/dx = 1/M and d var/dx = 2(x-mu)/M fold into
    a0 = ct_mu/M and a1 = 2*ct_var/(M*inv) on the xhat basis.  fp32 out.
    """
    m, c = x.shape
    tm = _row_tile(m, c, n_bufs=3, esz=max(x.dtype.itemsize, 4))
    assert tm is not None, (m, c)  # callers pre-check via _tileable

    def kernel(mu_ref, inv_ref, coef_ref, sums_ref, aff_ref, x_ref, dy_ref,
               out_ref):
        xhat = (x_ref[:].astype(jnp.float32) - mu_ref[:]) * inv_ref[:]
        dyf = dy_ref[:].astype(jnp.float32)
        mf = jnp.float32(m)
        out_ref[:] = (coef_ref[:] * (
            mf * dyf - sums_ref[0, :] - xhat * sums_ref[1, :])
            + aff_ref[0, :] + aff_ref[1, :] * xhat)

    coef = (gamma * inv / m)[None]
    aff = jnp.stack([a0, a1])
    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.float32),
        interpret=_interpret(),
    )(mu[None], inv[None], coef, sums, aff, x, dy)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                     eps: float = 1e-5):
    """Train-mode BatchNorm over the leading axes of NHWC ``x`` (biased
    variance, flax semantics).  Returns (y, mu, var) — callers feed mu/var
    into the running-stat EMA exactly as with ``flax.linen.BatchNorm``.
    Statistics always accumulate fp32 (flax promotes before reducing; a
    bf16 reduction over ~1e6 rows would corrupt them), so y is fp32."""
    red = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=red, dtype=jnp.float32)
    var = jnp.var(x.astype(jnp.float32), axis=red)
    inv = jax.lax.rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mu) * inv * gamma + beta
    return y, mu, var


def _bn_fwd(x, gamma, beta, eps):
    out = batch_norm_train(x, gamma, beta, eps)
    _, mu, var = out
    inv = jax.lax.rsqrt(var + eps)
    return out, (x, gamma, mu, inv)


def _bn_bwd(eps, res, cts):
    x, gamma, mu, inv = res
    dy, ct_mu, ct_var = cts  # all three outputs are differentiable
    shape = x.shape
    c = shape[-1]
    m = x.size // c
    x2 = x.reshape(-1, c)
    dy2 = dy.reshape(-1, c).astype(x2.dtype)
    # mu/var cotangents fold into an affine tail on the xhat basis:
    # d mu/dx = 1/M; d var/dx = 2(x-mu)/M = 2*xhat/(inv*M).
    a0 = (ct_mu / m).astype(jnp.float32)
    a1 = (2.0 * ct_var / (m * inv)).astype(jnp.float32)
    if (_row_tile(m, c, n_bufs=2, esz=x2.dtype.itemsize) is None
            or _row_tile(m, c, n_bufs=3, esz=max(x2.dtype.itemsize, 4))
            is None):
        # no Mosaic-admissible tiling for this geometry: identical math in
        # plain XLA (correct, just without the fused single-pass reduction)
        xf = x2.astype(jnp.float32)
        dyf = dy2.astype(jnp.float32)
        xhat = (xf - mu) * inv
        s_dy = dyf.sum(0)
        s_dyx = (dyf * xhat).sum(0)
        dx = (gamma * inv / m) * (m * dyf - s_dy - xhat * s_dyx) \
            + a0 + a1 * xhat
        dgamma, dbeta = s_dyx, s_dy
    else:
        sums = bn_bwd_reduce(x2, dy2, mu, inv)
        dx = bn_bwd_apply(x2, dy2, mu, inv, gamma, sums, a0, a1)
        dgamma = sums[1]
        dbeta = sums[0]
    return dx.reshape(shape).astype(x.dtype), dgamma, dbeta


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)
