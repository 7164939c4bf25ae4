"""Reconstruction-quality metrics: PCC, windowed SSIM, MSE, n-way objective
identification, and the Inception-Score machinery.

Ports the math of ``train/train_utils.py`` exactly (citations inline), with the
loops vectorised: the reference's n-way objective assessment
(``train_utils.py:752-816``) is Python-looped per image per distractor; here it
is a single ``vmap`` over precomputed distractor indices.  Images are NHWC.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fmri_tpu.ops.conv import depthwise_conv2d


def pearson_correlation(y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
    """Global Pearson correlation over the whole tensor
    (``train_utils.py:267-292`` — note the reference subtracts the *global*
    mean and sums over the full batch)."""
    vx = y_pred - jnp.mean(y_pred)
    vy = y_true - jnp.mean(y_true)
    return jnp.sum(vx * vy) / (
        jnp.sqrt(jnp.sum(vx**2)) * jnp.sqrt(jnp.sum(vy**2)))


def mse(y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
    """``nn.MSELoss`` (mean reduction)."""
    return jnp.mean((y_pred - y_true) ** 2)


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1D gaussian, normalised to sum 1 (``train_utils.py:313-326``)."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return g / g.sum()


def _ssim_window(window_size: int, channels: int) -> jnp.ndarray:
    g = gaussian_window(window_size)
    w2 = np.outer(g, g).astype(np.float32)          # [k, k]
    w = np.tile(w2[:, :, None, None], (1, 1, 1, channels))  # [k, k, 1, C]
    return jnp.asarray(w)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         size_average: bool = True) -> jax.Array:
    """Windowed SSIM, gaussian sigma=1.5, C1=0.01^2, C2=0.03^2 — exact port of
    ``StructuralSimilarity.forward`` (``train_utils.py:345-425``; the reference
    drops the dynamic-range factor L from C1/C2 at ``:404-405``).

    img1/img2: [B, H, W, C].
    """
    b, h, w, c = img1.shape
    real_size = min(window_size, h, w)
    pad = window_size // 2  # NOTE: reference pads by window_size//2 (:376)
    window = _ssim_window(real_size, c)

    conv = partial(depthwise_conv2d, kernel=window, padding=pad)
    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu12

    c1 = 0.01**2
    c2 = 0.03**2
    score = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return jnp.mean(score)
    return jnp.mean(score, axis=(1, 2, 3))


def denormalize(img: jax.Array, mean, std) -> jax.Array:
    """Per-channel denormalisation (``train_utils.py:234-240``); NHWC."""
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return img * std + mean


@partial(jax.jit, static_argnames=("top",))
def objective_assessment_batch(out: jax.Array, target: jax.Array,
                               rand_idx: jax.Array, top: int = 5):
    """Vectorised n-way objective identification (``train_utils.py:752-816``).

    For each reconstruction ``out[i]``, draws ``top-1`` distractor ground
    truths ``target[rand_idx[i, j]]`` and counts a true positive iff the
    reconstruction beats *every* distractor on the metric (PCC and SSIM scored
    independently, as in the reference).

    out/target: [B, H, W, C]; rand_idx: [B, top-1] precomputed distractor
    indices (!= i, mirroring ``random.choice`` at ``:793``).
    Returns (tp_pcc, tp_ssim): [B] boolean arrays.
    """

    def per_image(recon, gt, idxs):
        def vs_one(j):
            distractor = target[j]
            pcc_gt = pearson_correlation(recon, gt)
            pcc_rand = pearson_correlation(recon, distractor)
            s_gt = ssim(recon[None], gt[None])
            s_rand = ssim(recon[None], distractor[None])
            return pcc_gt > pcc_rand, s_gt > s_rand

        wins_pcc, wins_ssim = jax.vmap(vs_one)(idxs)
        return jnp.all(wins_pcc), jnp.all(wins_ssim)

    return jax.vmap(per_image)(out, target, rand_idx)


def objective_assessment(out: np.ndarray, target: np.ndarray, top: int = 5,
                         seed: int = 0) -> np.ndarray:
    """Host wrapper: samples distractor indices and returns the fraction of
    true positives ``[score_pcc, score_ssim]`` like ``objective_assessment``
    (``train_utils.py:814``).  Chance level = 1/top."""
    b = out.shape[0]
    rng = np.random.default_rng(seed)
    rand_idx = np.empty((b, top - 1), dtype=np.int32)
    for i in range(b):
        choices = np.delete(np.arange(b), i)
        rand_idx[i] = rng.choice(choices, size=top - 1, replace=True)
    tp_pcc, tp_ssim = objective_assessment_batch(
        jnp.asarray(out), jnp.asarray(target), jnp.asarray(rand_idx), top=top)
    return np.array([np.mean(np.asarray(tp_pcc)), np.mean(np.asarray(tp_ssim))])


def inception_score_from_probs(probs: np.ndarray, splits: int = 1):
    """IS = exp(mean_x KL(p(y|x) || p(y))) over splits; returns
    ``(mean, std)`` over splits like the reference
    (``train_utils.py:869-881``).  ``probs``: [N, num_classes] softmax outputs
    from any classifier (pluggable — see ``fmri_tpu.metrics.inception``)."""
    n = probs.shape[0]
    scores = []
    for k in range(splits):
        part = probs[k * (n // splits): (k + 1) * (n // splits)]
        py = np.mean(part, axis=0)
        kl = np.sum(part * (np.log(part + 1e-12) - np.log(py + 1e-12)), axis=1)
        scores.append(np.exp(np.mean(kl)))
    return float(np.mean(scores)), float(np.std(scores))
