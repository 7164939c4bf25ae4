"""Ops tests: Pallas SSIM kernel equivalence + bf16 compute path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fmri_tpu.configs import TINY
from fmri_tpu.metrics.quality import ssim
from fmri_tpu.ops.pallas_ssim import ssim_pallas


def test_pallas_ssim_matches_xla():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32))
    np.testing.assert_allclose(float(ssim_pallas(a, b)), float(ssim(a, b)),
                               atol=1e-6)
    # per-image variant
    pa = np.asarray(ssim_pallas(a, b, size_average=False))
    xa = np.asarray(ssim(a, b, size_average=False))
    np.testing.assert_allclose(pa, xa, atol=1e-6)
    # identity => 1.0
    assert float(ssim_pallas(a, a)) == pytest.approx(1.0, abs=1e-5)


def test_pallas_ssim_full_window():
    """Images larger than the 11-tap window (the production case)."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(np.clip(np.asarray(a) + rng.normal(0, 0.05, a.shape), 0, 1)
                    .astype(np.float32))
    np.testing.assert_allclose(float(ssim_pallas(a, b)), float(ssim(a, b)),
                               atol=1e-6)


def test_bf16_forward_close_to_fp32():
    """bfloat16 MXU path: same params, same input, output within bf16 noise of
    the fp32 reference path; params and BN stats stay float32."""
    import dataclasses

    from fmri_tpu.models.nets import Decoder, VisualEncoder

    cfg32 = TINY.model
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    x = jax.random.uniform(jax.random.key(0), (4, cfg32.image_size,
                                               cfg32.image_size, 3),
                           minval=-1.0, maxval=1.0)
    v32 = VisualEncoder(cfg32).init(jax.random.key(1), x, train=True)
    mu32, _ = VisualEncoder(cfg32).apply(v32, x, train=False)
    mu16, _ = VisualEncoder(cfg16).apply(v32, x, train=False)
    assert mu16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mu16), np.asarray(mu32),
                               atol=0.1, rtol=0.1)

    z = jax.random.normal(jax.random.key(2), (4, cfg32.latent_dim))
    d32 = Decoder(cfg32).init(jax.random.key(3), z, train=True)
    y32 = Decoder(cfg32).apply(d32, z, train=False)
    y16 = Decoder(cfg16).apply(d32, z, train=False)
    assert y16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(y16 - y32))) < 0.15  # tanh-bounded outputs

    # params initialized under bf16 config are still fp32
    v16 = VisualEncoder(cfg16).init(jax.random.key(1), x, train=True)
    for leaf in jax.tree_util.tree_leaves(v16["params"]):
        assert leaf.dtype == jnp.float32


def test_bf16_train_step_runs():
    """A full fused Stage-I step compiles and runs under the bf16 preset."""
    import dataclasses

    from fmri_tpu.train import RmsProp, init_vaegan, make_state, make_vgan_stage1_step

    cfg = TINY.replace(model=dataclasses.replace(TINY.model,
                                                 compute_dtype="bfloat16"))
    step = make_vgan_stage1_step(cfg, "vae-gan", donate=False)
    groups = init_vaegan(jax.random.key(0), cfg)
    g = {k: {"params": groups["params"][k],
             "batch_stats": groups["batch_stats"][k]} for k in groups["params"]}
    state = make_state(g, {k: RmsProp() for k in g})
    x = jax.random.uniform(jax.random.key(1),
                           (8, cfg.model.image_size, cfg.model.image_size, 3),
                           minval=-1.0, maxval=1.0)
    state, m = step.train_step(state, x, jax.random.key(2),
                               jnp.float32(0.35), jnp.float32(0.68),
                               jnp.float32(1e-6))
    for v in m.values():
        assert np.isfinite(float(np.asarray(v)))


def test_conv2d_matches_torch():
    """NHWC conv vs torch F.conv2d (both are cross-correlations)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)     # NHWC
    k = rng.normal(size=(5, 5, 4, 6)).astype(np.float32)     # HWIO
    ours = np.asarray(__import__("fmri_tpu.ops.conv", fromlist=["conv2d"])
                      .conv2d(jnp.asarray(x), jnp.asarray(k), stride=2, padding=2))
    tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))          # NCHW
    tk = torch.tensor(np.transpose(k, (3, 2, 0, 1)))          # OIHW
    oracle = F.conv2d(tx, tk, stride=2, padding=2).numpy()
    np.testing.assert_allclose(ours, np.transpose(oracle, (0, 2, 3, 1)),
                               atol=2e-4)


@pytest.mark.parametrize("output_padding", [0, 1])
def test_conv2d_transpose_matches_torch(output_padding):
    """Transposed-conv geometry and values vs torch ConvTranspose2d.

    Our kernel parameterization is the unflipped correlation form (weights are
    trained from scratch, ops/conv.py docstring); torch's transposed conv
    spatially flips, so the oracle uses the flipped kernel."""
    import torch
    import torch.nn.functional as F

    from fmri_tpu.ops.conv import conv2d_transpose

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    k = rng.normal(size=(5, 5, 4, 6)).astype(np.float32)      # HWIO
    ours = np.asarray(conv2d_transpose(
        jnp.asarray(x), jnp.asarray(k), stride=2, padding=2,
        output_padding=output_padding))
    # expected spatial size: (in-1)*s - 2p + k + op  (vae_gan.py:46-53 contract)
    expect = (8 - 1) * 2 - 4 + 5 + output_padding
    assert ours.shape == (2, expect, expect, 6)

    tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    # torch weight layout [Cin, Cout, kh, kw]; flip spatial dims to match the
    # correlation parameterization
    tk = torch.tensor(np.transpose(k[::-1, ::-1].copy(), (2, 3, 0, 1)))
    oracle = F.conv_transpose2d(tx, tk, stride=2, padding=2,
                                output_padding=output_padding).numpy()
    np.testing.assert_allclose(ours, np.transpose(oracle, (0, 2, 3, 1)),
                               atol=2e-4)
