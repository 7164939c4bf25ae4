"""Gradient equivalence of the Pallas tap-matmul weight-grad kernels.

``fmri_tpu.ops.pallas_dw`` computes conv / deconv weight grads as per-tap MXU
matmuls (no HBM transposes).  Here each kernel is checked against the ground
truth ``jax.grad`` of the corresponding forward in ``fmri_tpu.ops.conv`` —
the same XLA backward the training steps used before the Pallas path existed.
Runs in Pallas interpret mode on the CPU test platform (the kernels detect
the backend); the real-TPU compile path is exercised by
``benchmarks/conv_breakdown.py --pallas``.

Geometry under test mirrors every hot conv of the model zoo
(reference ``models/vae_gan.py:11-60``): k=5, padding=2, stride 1 and 2 convs
and the stride-2 deconv with output_padding 0 and 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmri_tpu.ops import conv as conv_ops
from fmri_tpu.ops import pallas_dw


def _xla_dw(fwd, x, w, dy):
    return jax.grad(lambda ww: jnp.vdot(fwd(x, ww), dy))(w)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize(
    "b,h,ci,co,stride",
    [
        (2, 8, 3, 4, 1),    # stride-1 (output conv geometry)
        (3, 8, 64, 3, 1),   # swap path: co < 64 <= ci
        (2, 8, 3, 4, 2),    # stride-2 encoder/disc geometry
        (3, 16, 64, 5, 2),  # swap path under stride 2
        (2, 10, 4, 6, 2),   # even-but-not-pow2 spatial
    ],
)
def test_conv2d_dw_matches_xla(b, h, ci, co, stride):
    k0, k1, k2 = jax.random.split(jax.random.key(hash((b, h, ci, stride)) % 2**31), 3)
    x = _rand(k0, (b, h, h, ci))
    w = _rand(k1, (5, 5, ci, co)) * 0.1
    fwd = lambda xx, ww: conv_ops.conv2d(xx, ww, stride=stride, padding=2)
    dy = _rand(k2, fwd(x, w).shape)

    want = _xla_dw(fwd, x, w, dy)
    got = pallas_dw.conv2d_dw(x, dy, stride=stride, padding=2)
    assert got.shape == want.shape == (5, 5, ci, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize(
    "b,h,ci,co,output_padding",
    [
        (2, 4, 4, 3, 1),    # decoder geometry: doubles spatial
        (2, 5, 3, 4, 1),
        (2, 4, 4, 3, 0),    # output_padding=0 (one fewer row/col)
        (3, 4, 64, 5, 1),   # swap path
    ],
)
def test_conv2d_transpose_dw_matches_xla(b, h, ci, co, output_padding):
    k0, k1, k2 = jax.random.split(
        jax.random.key(hash((b, h, ci, co, output_padding)) % 2**31), 3)
    x = _rand(k0, (b, h, h, ci))
    w = _rand(k1, (5, 5, ci, co)) * 0.1
    fwd = lambda xx, ww: conv_ops.conv2d_transpose(
        xx, ww, stride=2, padding=2, output_padding=output_padding)
    dy = _rand(k2, fwd(x, w).shape)

    want = _xla_dw(fwd, x, w, dy)
    got = pallas_dw.conv2d_transpose_dw(
        x, dy, stride=2, padding=2, output_padding=output_padding)
    assert got.shape == want.shape == (5, 5, ci, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"])
def test_conv2d_custom_vjp_matches_xla(compute_dtype):
    """``conv2d(pallas_backward=True)`` must deliver the same (dx, dw) as the
    plain XLA path: dx is routed through XLA either way (bitwise), dw through
    the Pallas kernel (same operand dtypes, fp32 accumulation)."""
    k0, k1, k2 = jax.random.split(jax.random.key(11), 3)
    x = _rand(k0, (2, 8, 8, 6))
    w = _rand(k1, (5, 5, 6, 4)) * 0.1
    kwargs = dict(stride=2, padding=2, compute_dtype=compute_dtype)
    dy = _rand(k2, conv_ops.conv2d(x, w, **kwargs).shape)

    def loss(fn):
        return lambda xx, ww: jnp.vdot(fn(xx, ww), dy)

    ref = jax.grad(loss(lambda xx, ww: conv_ops.conv2d(xx, ww, **kwargs)),
                   argnums=(0, 1))(x, w)
    got = jax.grad(loss(lambda xx, ww: conv_ops.conv2d(
        xx, ww, pallas_backward=True, **kwargs)), argnums=(0, 1))(x, w)
    tol = dict(rtol=2e-5, atol=2e-4) if compute_dtype is None else \
        dict(rtol=0.03, atol=0.05)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)  # dx: same XLA path
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), **tol)


@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"])
def test_conv2d_transpose_custom_vjp_matches_xla(compute_dtype):
    k0, k1, k2 = jax.random.split(jax.random.key(13), 3)
    x = _rand(k0, (2, 4, 4, 6))
    w = _rand(k1, (5, 5, 6, 4)) * 0.1
    kwargs = dict(stride=2, padding=2, output_padding=1,
                  compute_dtype=compute_dtype)
    dy = _rand(k2, conv_ops.conv2d_transpose(x, w, **kwargs).shape)

    def loss(fn):
        return lambda xx, ww: jnp.vdot(fn(xx, ww), dy)

    ref = jax.grad(loss(lambda xx, ww: conv_ops.conv2d_transpose(
        xx, ww, **kwargs)), argnums=(0, 1))(x, w)
    got = jax.grad(loss(lambda xx, ww: conv_ops.conv2d_transpose(
        xx, ww, pallas_backward=True, **kwargs)), argnums=(0, 1))(x, w)
    tol = dict(rtol=2e-5, atol=2e-4) if compute_dtype is None else \
        dict(rtol=0.03, atol=0.05)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), **tol)


def test_vgan_stage1_step_pallas_backward_equivalence():
    """Full Stage-I Dual-VAE/GAN train step: flipping
    ``ModelConfig.pallas_backward`` must not change the update (same losses,
    same new params) beyond matmul-reassociation noise — the Pallas path only
    re-implements the conv weight grads."""
    import dataclasses

    from fmri_tpu.configs import TINY
    from fmri_tpu.train import (
        RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
    )

    results = {}
    for pallas in (False, True):
        cfg = dataclasses.replace(
            TINY, model=dataclasses.replace(TINY.model, pallas_backward=pallas))
        groups = init_vaegan(jax.random.key(0), cfg)
        g = {k: {"params": groups["params"][k],
                 "batch_stats": groups["batch_stats"][k]}
             for k in groups["params"]}
        x = jax.random.uniform(
            jax.random.key(1),
            (8, cfg.model.image_size, cfg.model.image_size, 3),
            minval=-1.0, maxval=1.0)
        step = make_vgan_stage1_step(cfg, "vae-gan", donate=False)
        state = make_state(g, {k: RmsProp() for k in g})
        results[pallas] = step.train_step(
            state, x, jax.random.key(2), jnp.float32(0.35),
            jnp.float32(0.68), jnp.float32(0.3))

    s_ref, m_ref = results[False]
    s_pal, m_pal = results[True]
    for k in m_ref:
        np.testing.assert_allclose(float(np.asarray(m_ref[k])),
                                   float(np.asarray(m_pal[k])),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_pal.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_conv2d_dw_bf16_operands_close_to_fp32():
    """The production path feeds the tap matmuls bf16 operands with fp32
    accumulation (same contract as ``conv2d(compute_dtype='bfloat16')``)."""
    k0, k1, k2 = jax.random.split(jax.random.key(7), 3)
    x = _rand(k0, (2, 8, 8, 6))
    w = _rand(k1, (5, 5, 6, 4)) * 0.1
    fwd = lambda xx, ww: conv_ops.conv2d(xx, ww, stride=2, padding=2)
    dy = _rand(k2, fwd(x, w).shape)
    want = _xla_dw(fwd, x, w, dy)
    got = pallas_dw.conv2d_dw(x.astype(jnp.bfloat16), dy.astype(jnp.bfloat16),
                              stride=2, padding=2)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.03, atol=0.05)


@pytest.mark.parametrize("shape,stride,padding,k", [
    ((2, 8, 8, 4), 2, 1, 3),   # stride-2 but not the k5/p2 geometry
])
def test_pallas_backward_out_of_scope_geometry_falls_back(
        shape, stride, padding, k):
    """Flipping pallas_backward must never crash an out-of-scope layer —
    conv2d gates on the supported (stride, k, padding) geometry and falls
    back to the stock XLA backward (same contract as alt_backward)."""
    k0, k1 = jax.random.split(jax.random.key(11))
    x = _rand(k0, shape)
    w = _rand(k1, (k, k, shape[-1], 6)) * 0.1
    g_ref = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d(
        x, ww, stride=stride, padding=padding) ** 2))(w)
    g_pal = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d(
        x, ww, stride=stride, padding=padding, pallas_backward=True) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_backward_odd_spatial_in_scope_equivalence():
    """Odd H/W at the k5/p2/s2 geometry IS in scope (the parity-plane
    indexing handles it); assert the Pallas dW path matches XLA there."""
    k0, k1 = jax.random.split(jax.random.key(11))
    x = _rand(k0, (2, 9, 9, 4))
    w = _rand(k1, (5, 5, 4, 6)) * 0.1
    g_ref = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d(
        x, ww, stride=2, padding=2) ** 2))(w)
    g_pal = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d(
        x, ww, stride=2, padding=2, pallas_backward=True) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_backward_vmem_overflow_falls_back():
    """A geometry whose one-sample tile exceeds the VMEM budget must take
    the stock XLA weight grad (``pallas_dw.VmemOverflow`` caught in
    ``ops/conv.py``), not emit an uncompilable kernel.  The 25 live per-tap
    reshape temps dominate: 25 * 128^2 * 8ch * 4B = 13.1 MB > the 13 MB
    budget at this shape."""
    per_sample = (2 * ((128 + 4) ** 2 * 8 + 128 ** 2 * 8)
                  + 25 * 128 ** 2 * 8 + 128 ** 2 * 8) * 4
    assert per_sample > pallas_dw._VMEM_BUDGET  # the premise of this test
    k0, k1 = jax.random.split(jax.random.key(13))
    x = _rand(k0, (1, 128, 128, 8))
    w = _rand(k1, (5, 5, 8, 8)) * 0.1
    with pytest.raises(pallas_dw.VmemOverflow):
        pallas_dw.conv2d_dw(x, jnp.zeros((1, 128, 128, 8)), stride=1,
                            padding=2)
    g_ref = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d(
        x, ww, stride=1, padding=2) ** 2))(w)
    g_pal = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d(
        x, ww, stride=1, padding=2, pallas_backward=True) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_deconv_pallas_backward_out_of_scope_geometry_falls_back():
    k0, k1 = jax.random.split(jax.random.key(12))
    x = _rand(k0, (2, 5, 5, 4))
    w = _rand(k1, (4, 4, 4, 6)) * 0.1  # k=4: not the k5/p2/s2 geometry
    g_ref = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d_transpose(
        x, ww, stride=2, padding=1) ** 2))(w)
    g_pal = jax.grad(lambda ww: jnp.sum(conv_ops.conv2d_transpose(
        x, ww, stride=2, padding=1, pallas_backward=True) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
