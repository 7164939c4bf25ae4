"""Metric tests against independent oracles (numpy/scipy and, for SSIM, the
reference math re-derived with scipy.ndimage convolution)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import convolve

from fmri_tpu.metrics import (
    gaussian_window, inception_score_from_probs, mse, objective_assessment,
    pearson_correlation, ssim,
)


def test_pcc_against_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    b = (0.5 * a + 0.5 * rng.normal(size=a.shape)).astype(np.float32)
    got = float(pearson_correlation(jnp.asarray(a), jnp.asarray(b)))
    want = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pcc_perfect():
    a = np.random.default_rng(1).normal(size=(2, 4, 4, 3)).astype(np.float32)
    assert float(pearson_correlation(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)


def test_mse():
    a = np.ones((2, 3, 3, 1), np.float32)
    b = np.zeros_like(a)
    assert float(mse(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(1.0)


def _ssim_oracle(img1, img2):
    """Independent SSIM oracle following train_utils.py:345-425 with scipy."""
    g = gaussian_window(11)
    w = np.outer(g, g)
    pad_mode = "constant"  # reference F.conv2d zero-pads

    def filt(x):  # x: [H, W]
        return convolve(np.pad(x, 5, mode="constant"), w, mode="constant")[5:-5, 5:-5]

    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for b in range(img1.shape[0]):
        for c in range(img1.shape[-1]):
            x, y = img1[b, :, :, c], img2[b, :, :, c]
            mu1, mu2 = filt(x), filt(y)
            s1 = filt(x * x) - mu1**2
            s2 = filt(y * y) - mu2**2
            s12 = filt(x * y) - mu1 * mu2
            num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
            den = (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
            vals.append(num / den)
    return np.mean(vals)


def test_ssim_against_oracle():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _ssim_oracle(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_identical_images():
    a = np.random.default_rng(3).uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32)
    val = float(ssim(jnp.asarray(a), jnp.asarray(a)))
    assert val > 0.98  # boundary zero-padding keeps it slightly below 1


def test_objective_assessment_perfect_recon():
    rng = np.random.default_rng(4)
    target = rng.uniform(0, 1, size=(12, 16, 16, 3)).astype(np.float32)
    score = objective_assessment(target, target, top=5, seed=0)
    # Perfect reconstructions must beat every distractor on both metrics.
    assert score[0] == pytest.approx(1.0)
    assert score[1] == pytest.approx(1.0)


def test_objective_assessment_random_recon_near_chance():
    rng = np.random.default_rng(5)
    target = rng.uniform(0, 1, size=(64, 8, 8, 3)).astype(np.float32)
    recon = rng.uniform(0, 1, size=target.shape).astype(np.float32)
    score = objective_assessment(recon, target, top=2, seed=0)
    assert 0.2 < score[0] < 0.8  # chance level 0.5 for 2-way


def test_inception_score_formula():
    # Uniform probs -> KL = 0 -> IS = 1 (mean, std over splits).
    probs = np.full((10, 4), 0.25)
    mean, std = inception_score_from_probs(probs)
    assert mean == pytest.approx(1.0, abs=1e-5) and std == 0.0
    # One-hot distinct classes, uniform marginal -> IS = num_classes.
    probs = np.eye(4)[np.arange(8) % 4]
    mean, _ = inception_score_from_probs(probs)
    assert mean == pytest.approx(4.0, rel=1e-4)
    # split std is reported like the reference (train_utils.py:879-881)
    mean2, std2 = inception_score_from_probs(probs, splits=2)
    assert std2 >= 0.0
