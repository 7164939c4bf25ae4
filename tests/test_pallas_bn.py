"""Gradient equivalence of the Pallas BatchNorm backward
(``fmri_tpu.ops.pallas_bn``) against plain autodiff of the same train-mode
BN, on the CPU interpret path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmri_tpu.ops import pallas_bn


def _bn_ref(x, gamma, beta, eps=1e-5):
    red = tuple(range(x.ndim - 1))
    mu = jnp.mean(x, axis=red)
    var = jnp.var(x, axis=red)
    return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


@pytest.mark.parametrize("shape", [(4, 6, 6, 8), (32, 16), (3, 5, 7)])
def test_bn_backward_matches_autodiff(shape):
    c = shape[-1]
    k0, k1, k2, k3 = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(k0, shape, jnp.float32) * 2.0 + 0.5
    gamma = 1.0 + 0.1 * jax.random.normal(k1, (c,), jnp.float32)
    beta = 0.1 * jax.random.normal(k2, (c,), jnp.float32)
    dy = jax.random.normal(k3, shape, jnp.float32)

    loss_ref = lambda *a: jnp.vdot(_bn_ref(*a), dy)
    loss_pal = lambda *a: jnp.vdot(pallas_bn.batch_norm_train(*a)[0], dy)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    got = jax.grad(loss_pal, argnums=(0, 1, 2))(x, gamma, beta)
    for r, g, name in zip(ref, got, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bn_forward_matches_flax_semantics():
    """y and the (mu, var) EMA feeds must match flax.linen.BatchNorm's
    train-mode math (biased variance)."""
    import flax.linen as nn

    k0 = jax.random.key(5)
    x = jax.random.normal(k0, (8, 4, 4, 6), jnp.float32)
    m = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vars_ = m.init(jax.random.key(1), x)
    y_flax, new_state = m.apply(vars_, x, mutable=["batch_stats"])

    y, mu, var = pallas_bn.batch_norm_train(
        x, vars_["params"]["scale"], vars_["params"]["bias"], 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_flax),
                               rtol=1e-5, atol=1e-5)
    # flax EMA: new = 0.9 * old + 0.1 * batch_stat (old mean 0, var 1)
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["mean"]),
        0.1 * np.asarray(mu), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["var"]),
        0.9 + 0.1 * np.asarray(var), rtol=1e-5, atol=1e-6)


def test_vgan_stage1_step_pallas_bn_equivalence():
    """Full Stage-I train step: flipping ``ModelConfig.pallas_bn`` must not
    change losses, updated params, or BN running stats — the Pallas path only
    re-implements the train-mode BN forward/backward math."""
    import dataclasses

    from fmri_tpu.configs import TINY
    from fmri_tpu.train import (
        RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
    )

    results = {}
    for pbn in (False, True):
        cfg = dataclasses.replace(
            TINY, model=dataclasses.replace(TINY.model, pallas_bn=pbn))
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
        results[pbn] = step.train_step(
            state, x, jax.random.key(2), jnp.float32(0.35),
            jnp.float32(0.68), jnp.float32(0.3))

    (s_ref, m_ref), (s_pal, m_pal) = results[False], results[True]
    for k in m_ref:
        np.testing.assert_allclose(float(np.asarray(m_ref[k])),
                                   float(np.asarray(m_pal[k])),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
    for tree in ("params", "batch_stats"):
        for a, b in zip(jax.tree_util.tree_leaves(getattr(s_ref, tree)),
                        jax.tree_util.tree_leaves(getattr(s_pal, tree))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5, err_msg=tree)


def test_bn_backward_second_order_inputs():
    """The custom backward must be usable under jit and with non-contiguous
    cotangents (e.g. from a downstream conv)."""
    k0, k1 = jax.random.split(jax.random.key(9))
    x = jax.random.normal(k0, (6, 3, 3, 4), jnp.float32)
    gamma = jnp.ones((4,))
    beta = jnp.zeros((4,))
    w = jax.random.normal(k1, (4, 7), jnp.float32) * 0.1

    @jax.jit
    def loss(xx):
        y, _, _ = pallas_bn.batch_norm_train(xx, gamma, beta, 1e-5)
        return jnp.sum(jnp.tanh(y.reshape(-1, 4) @ w) ** 2)

    def loss_ref(xx):
        y = _bn_ref(xx, gamma, beta)
        return jnp.sum(jnp.tanh(y.reshape(-1, 4) @ w) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(x)),
                               np.asarray(jax.grad(loss_ref)(x)),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("m", [8, 24, 64, 5000, 10000, 256 * 64 * 64,
                               100 * 100 * 64, 7, 12])
@pytest.mark.parametrize("c", [3, 64, 128, 256])
def test_row_tile_mosaic_invariants(m, c):
    """The tile picker must always satisfy Mosaic's block rules — a tile
    violating them only fails at TPU lowering time, which the CPU interpret
    tests never reach (this exact escape shipped a (1, 64) block in round 2:
    the VMEM cap carried a factor 3 that a power-of-two m never sheds)."""
    for n_bufs, esz in ((2, 2), (2, 4), (3, 4)):
        tm = pallas_bn._row_tile(m, c, n_bufs=n_bufs, esz=esz)
        c_pad = max(128, -(-c // 128) * 128)
        per_row = n_bufs * 2 * c_pad * esz
        if tm is None:
            # None only when genuinely untileable: nothing >=8 divides m
            # AND the whole array overflows VMEM
            assert m % 8 or all(m % t for t in (8, 16, 32, 64)) or \
                m * per_row // 2 > pallas_bn._VMEM_BUDGET
            continue
        assert m % tm == 0, (m, c, tm)
        assert tm % 8 == 0 or tm == m, (m, c, tm)
        limit = pallas_bn._VMEM_BUDGET if tm != m else None
        if limit is not None:
            assert per_row * tm <= limit
        else:
            assert m * per_row // 2 <= pallas_bn._VMEM_BUDGET


def test_row_tile_untileable_geometry_falls_back():
    """m=62500 (reference res100 batch 100 at the 25x25 layer) has no
    multiple-of-8 divisor and overflows VMEM as one block: the backward must
    take the XLA fallback (and still be correct) instead of emitting a
    block Mosaic rejects."""
    assert pallas_bn._row_tile(62500, 64, n_bufs=2, esz=4) is None
    k0, k1 = jax.random.split(jax.random.key(3))
    # m = 100*25*25 = 62500: no multiple-of-8 divisor, > VMEM as one block
    x = jax.random.normal(k0, (100, 25, 25, 4), jnp.float32)
    dy = jax.random.normal(k1, x.shape, jnp.float32)
    gamma, beta = jnp.ones((4,)), jnp.zeros((4,))
    loss_ref = lambda *a: jnp.vdot(_bn_ref(*a), dy)
    loss_pal = lambda *a: jnp.vdot(pallas_bn.batch_norm_train(*a)[0], dy)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    got = jax.grad(loss_pal, argnums=(0, 1, 2))(x, gamma, beta)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_mu_var_cotangents_flow():
    """Losses that differentiate through the returned (mu, var) — e.g. a
    stats-matching regularizer — must get those contributions in dx."""
    k0, k1 = jax.random.split(jax.random.key(5))
    x = jax.random.normal(k0, (16, 4, 4, 8), jnp.float32)
    t = jax.random.normal(k1, (8,), jnp.float32)
    gamma, beta = jnp.ones((8,)), jnp.zeros((8,))

    def loss_pal(xx):
        y, mu, var = pallas_bn.batch_norm_train(xx, gamma, beta, 1e-5)
        return jnp.sum(y ** 2) + jnp.vdot(mu, t) + jnp.sum((var - 1.0) ** 2)

    def loss_ref(xx):
        red = (0, 1, 2)
        mu = jnp.mean(xx, axis=red)
        var = jnp.var(xx, axis=red)
        y = (xx - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return jnp.sum(y ** 2) + jnp.vdot(mu, t) + jnp.sum((var - 1.0) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_pal)(x)),
                               np.asarray(jax.grad(loss_ref)(x)),
                               rtol=2e-4, atol=2e-4)


def test_bf16_input_stats_accumulate_fp32():
    """bf16 inputs must not degrade mu/var: flax promotes before reducing."""
    x = (jax.random.normal(jax.random.key(7), (2048, 8), jnp.float32)
         + 10.0)
    xb = x.astype(jnp.bfloat16)
    _, mu, var = pallas_bn.batch_norm_train(xb, jnp.ones((8,)),
                                            jnp.zeros((8,)), 1e-5)
    mu_ref = jnp.mean(xb.astype(jnp.float32), axis=0)
    var_ref = jnp.var(xb.astype(jnp.float32), axis=0)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-5, atol=1e-5)
