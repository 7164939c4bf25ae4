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
