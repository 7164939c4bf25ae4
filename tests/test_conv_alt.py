"""Gradient equivalence of the alternative conv-backward formulations
(``fmri_tpu.ops.conv_alt``) against the stock XLA backward.

Both rewrites are exact algebraic re-associations of the same contraction,
so fp32 results must agree to float-summation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmri_tpu.ops import conv, conv_alt


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize(
    "b,h,ci,co,k,p",
    [
        (4, 16, 8, 3, 5, 2),     # outconv-like: tiny Co
        (2, 12, 5, 7, 3, 1),     # odd channel counts, k=3
        (3, 10, 4, 4, 5, 2),
    ],
)
def test_dw_patches_matches_xla(b, h, ci, co, k, p):
    kx, kw_, kd = jax.random.split(jax.random.key(0), 3)
    x = _rand(kx, (b, h, h, ci))
    w = _rand(kw_, (k, k, ci, co), 0.1)
    oh = h + 2 * p - k + 1
    dy = _rand(kd, (b, oh, oh, co))

    f = lambda ww: jnp.vdot(conv.conv2d(x, ww, stride=1, padding=p), dy)
    dw_ref = jax.grad(f)(w)
    dw_alt = conv_alt.conv2d_dw_patches(x, dy, padding=p, k=k)
    np.testing.assert_allclose(np.asarray(dw_alt), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "b,h,ci,co",
    [
        (4, 16, 8, 16),          # disc2-like (stride 2, k=5, p=2)
        (2, 8, 3, 8),            # tiny input, Ci=3 (enc1-style)
        (3, 12, 16, 8),
    ],
)
def test_dx_phases_matches_xla(b, h, ci, co):
    kx, kw_, kd = jax.random.split(jax.random.key(1), 3)
    x = _rand(kx, (b, h, h, ci))
    w = _rand(kw_, (5, 5, ci, co), 0.1)
    oh = h // 2
    dy = _rand(kd, (b, oh, oh, co))

    f = lambda xx: jnp.vdot(conv.conv2d(xx, w, stride=2, padding=2), dy)
    dx_ref = jax.grad(f)(x)
    dx_alt = conv_alt.conv2d_dx_phases(dy, w, (h, h), padding=2)
    np.testing.assert_allclose(np.asarray(dx_alt), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("compute_dtype", [None, "bfloat16"])
@pytest.mark.parametrize("stride,co", [(2, 8), (1, 3)])
def test_conv2d_alt_backward_custom_vjp(compute_dtype, stride, co):
    """``conv2d(alt_backward=True)``: stride-2 routes dX through the phase
    rewrite (dW through stock XLA); stride-1 small-Co routes dW through the
    patches rewrite (dX through stock XLA).  Both must match the plain path
    up to reassociation noise."""
    k0, k1, k2 = jax.random.split(jax.random.key(21), 3)
    x = _rand(k0, (2, 8, 8, 6))
    w = _rand(k1, (5, 5, 6, co), 0.1)
    kwargs = dict(stride=stride, padding=2, compute_dtype=compute_dtype)
    dy = _rand(k2, conv.conv2d(x, w, **kwargs).shape)

    def loss(fn):
        return lambda xx, ww: jnp.vdot(fn(xx, ww), dy)

    ref = jax.grad(loss(lambda xx, ww: conv.conv2d(xx, ww, **kwargs)),
                   argnums=(0, 1))(x, w)
    got = jax.grad(loss(lambda xx, ww: conv.conv2d(
        xx, ww, alt_backward=True, **kwargs)), argnums=(0, 1))(x, w)
    tol = dict(rtol=2e-5, atol=2e-4) if compute_dtype is None else \
        dict(rtol=0.03, atol=0.05)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), **tol)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), **tol)


def test_alt_backward_odd_spatial_falls_back():
    """res100's odd 25x25 layer cannot phase-decompose (2*13 != 25); the op
    must silently use the stock backward there."""
    k0, k1, k2 = jax.random.split(jax.random.key(31), 3)
    x = _rand(k0, (2, 25, 25, 4))
    w = _rand(k1, (5, 5, 4, 8), 0.1)
    kwargs = dict(stride=2, padding=2)
    dy = _rand(k2, conv.conv2d(x, w, **kwargs).shape)
    ref = jax.grad(lambda xx: jnp.vdot(conv.conv2d(xx, w, **kwargs), dy))(x)
    got = jax.grad(lambda xx: jnp.vdot(
        conv.conv2d(xx, w, alt_backward=True, **kwargs), dy))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_vgan_stage1_step_alt_backward_equivalence():
    """Full Stage-I Dual-VAE/GAN train step: flipping
    ``ModelConfig.alt_backward`` must not change the update (same losses,
    same new params) beyond reassociation noise — the alt path only
    re-associates conv backward contractions."""
    import dataclasses

    from fmri_tpu.configs import TINY
    from fmri_tpu.train import (
        RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
    )

    results = {}
    for alt in (False, True):
        cfg = dataclasses.replace(
            TINY, model=dataclasses.replace(TINY.model, alt_backward=alt))
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
        results[alt] = step.train_step(
            state, x, jax.random.key(2), jnp.float32(0.35),
            jnp.float32(0.68), jnp.float32(0.3))

    s_ref, m_ref = results[False]
    s_alt, m_alt = results[True]
    for k in m_ref:
        np.testing.assert_allclose(float(np.asarray(m_ref[k])),
                                   float(np.asarray(m_alt[k])),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_alt.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
