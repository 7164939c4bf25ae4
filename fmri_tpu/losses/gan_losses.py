"""Loss algebra for the VAE/GAN and WAE/GAN families, as pure JAX functions.

Term definitions follow ``VaeGan.loss`` / ``VaeGanCognitive.loss``
(``models/vae_gan.py:302-320,411-432``) and the per-mode combinations in
``train/train_vgan_stage1.py:359-404``.  Everything returns per-example vectors
where the reference does, so downstream code can reproduce the reference's
``torch.sum`` reductions and per-batch means exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

LOG_EPS = 1e-3  # stabiliser inside GAN logs (vae_gan.py:316-318)


class VaeGanTerms(NamedTuple):
    """Per-example loss terms (each shape [B] except nle [B, D])."""

    nle: jax.Array        # 0.5*(x - x_tilde)^2, flattened   (vae_gan.py:307)
    kld: jax.Array        # KL(q(z|x) || N(0,I)) per example (vae_gan.py:310)
    mse: jax.Array        # disc feature-matching 0.5*MSE     (vae_gan.py:313)
    bce_dis_original: jax.Array   # -log(D(x) + eps)          (vae_gan.py:316)
    bce_dis_predicted: jax.Array  # -log(1 - D(x_tilde) + eps)(vae_gan.py:317)
    bce_dis_sampled: jax.Array    # -log(1 - D(x_p) + eps)    (vae_gan.py:318)


def vaegan_terms(
    x: jax.Array,
    x_tilde: jax.Array,
    disc_layer_original: jax.Array,
    disc_layer_predicted: jax.Array,
    disc_class_original: jax.Array,
    disc_class_predicted: jax.Array,
    disc_class_sampled: jax.Array,
    mus: jax.Array,
    logvars: jax.Array,
) -> VaeGanTerms:
    b = x.shape[0]
    nle = 0.5 * (x.reshape(b, -1) - x_tilde.reshape(b, -1)) ** 2
    kld = -0.5 * jnp.sum(-jnp.exp(logvars) - mus**2 + logvars + 1.0, axis=1)
    mse = jnp.sum(0.5 * (disc_layer_original - disc_layer_predicted) ** 2, axis=1)
    bce_orig = -jnp.log(disc_class_original + LOG_EPS)
    bce_pred = -jnp.log(1.0 - disc_class_predicted + LOG_EPS)
    bce_samp = -jnp.log(1.0 - disc_class_sampled + LOG_EPS)
    return VaeGanTerms(nle, kld, mse,
                       bce_orig.reshape(-1), bce_pred.reshape(-1), bce_samp.reshape(-1))


class HeadLosses(NamedTuple):
    """Scalar losses for the three optimizer groups plus the logged recon sum."""

    encoder: jax.Array
    decoder: jax.Array
    discriminator: jax.Array
    nle_sum: jax.Array


def combine_mode(terms: VaeGanTerms, mode: str, *, lambda_mse: float,
                 beta: float = 1.0, batch_size: int | None = None) -> HeadLosses:
    """Per-mode loss combination (``train_vgan_stage1.py:359-387``).

    ``mode``: 'vae-gan' | 'vae' | 'beta-vae' | 'dcgan'.
    """
    s = jnp.sum
    nle_sum = s(terms.nle)
    if mode == "vae-gan":
        loss_enc = s(terms.kld) + s(terms.mse)
        loss_dis = s(terms.bce_dis_original) + s(terms.bce_dis_predicted) + s(terms.bce_dis_sampled)
        loss_dec = s(lambda_mse * terms.mse) - (1.0 - lambda_mse) * loss_dis
    elif mode == "beta-vae":
        kld_weight = 1.0 / batch_size
        loss_enc = s(terms.kld) * beta * kld_weight + s(terms.mse)
        loss_dis = s(terms.bce_dis_original) + s(terms.bce_dis_predicted) + s(terms.bce_dis_sampled)
        loss_dec = s(lambda_mse * terms.mse) - (1.0 - lambda_mse) * loss_dis
    elif mode == "dcgan":
        loss_enc = s(terms.kld) + nle_sum
        loss_dis = s(terms.bce_dis_original) + s(terms.bce_dis_sampled)
        loss_dec = s(lambda_mse * terms.nle) - (1.0 - lambda_mse) * loss_dis
    elif mode == "vae":
        loss_enc = s(terms.kld) + nle_sum
        loss_dis = s(terms.bce_dis_original) + s(terms.bce_dis_sampled)
        loss_dec = s(lambda_mse * terms.nle)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return HeadLosses(loss_enc, loss_dec, loss_dis, nle_sum)


def equilibrium_gate(terms: VaeGanTerms, equilibrium: jax.Array, margin: jax.Array,
                     init_dec: bool = True, init_dis: bool = True):
    """Adaptive G/D balancing (``train_vgan_stage1.py:396-404``) as traced booleans.

    Returns ``(train_dec, train_dis)`` masks suitable for branchless updates:
      * skip D if mean bce_orig or bce_pred < eq - margin,
      * skip G if either > eq + margin,
      * if both end up skipped, train both.

    ``init_dec`` / ``init_dis`` are the pre-gate mode defaults: e.g. 'vae' mode
    sets ``train_dis = False`` *before* the gate runs
    (``train_vgan_stage1.py:388``), which the both-off rule can then override —
    that quirk is reproduced faithfully.
    """
    m_orig = jnp.mean(terms.bce_dis_original)
    m_pred = jnp.mean(terms.bce_dis_predicted)
    dis_low = (m_orig < equilibrium - margin) | (m_pred < equilibrium - margin)
    dec_high = (m_orig > equilibrium + margin) | (m_pred > equilibrium + margin)
    train_dis = jnp.logical_and(init_dis, ~dis_low)
    train_dec = jnp.logical_and(init_dec, ~dec_high)
    both_off = jnp.logical_and(~train_dis, ~train_dec)
    return train_dec | both_off, train_dis | both_off


# --------------------------- WAE family ---------------------------


def wae_disc_losses(d_real: jax.Array, d_fake: jax.Array, lam: float = 10.0):
    """Latent-discriminator two-term loss (``train_wae_stage1.py:281-282``):
    ``L_fake = -lam * sum(log(d_fake + eps))``, ``L_real = -lam * sum(log(1 - d_real + eps))``.

    Note the label convention: for Stage I ``d_fake`` scores prior samples
    z ~ N(0, sigma^2) and ``d_real`` scores encoder outputs; Stage II/III feed
    teacher latents as 'real' and cognitive latents as 'fake'
    (``train_wae_stage2.py:292-307``) — reproduced verbatim.
    """
    loss_fake = -lam * jnp.sum(jnp.log(d_fake + LOG_EPS))
    loss_real = -lam * jnp.sum(jnp.log(1.0 - d_real + LOG_EPS))
    return loss_fake, loss_real


def wae_recon_sum(x_recon: jax.Array, x: jax.Array) -> jax.Array:
    """Stage-I generator recon loss ``sum(sum(0.5*(x_recon - x)^2, 1))``
    (``train_wae_stage1.py:301``)."""
    return jnp.sum(0.5 * (x_recon - x) ** 2)


def wae_recon_mean(x_recon: jax.Array, x: jax.Array) -> jax.Array:
    """Stage-II/III generator recon loss ``nn.MSELoss`` (mean reduction,
    ``train_wae_stage2.py:320-321``)."""
    return jnp.mean((x_recon - x) ** 2)


def wae_penalty_sum(d_real: jax.Array, lam: float = 10.0) -> jax.Array:
    """Stage-I adversarial penalty ``-lam * sum(log(d_real + eps))``
    (``train_wae_stage1.py:303``)."""
    return -lam * jnp.sum(jnp.log(d_real + LOG_EPS))


def wae_penalty_mean(d_real: jax.Array, lam: float = 10.0) -> jax.Array:
    """Stage-II penalty ``-lam * mean(log(d_real + eps))``
    (``train_wae_stage2.py:322``)."""
    return -lam * jnp.mean(jnp.log(d_real + LOG_EPS))
