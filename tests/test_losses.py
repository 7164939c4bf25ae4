"""Loss-algebra tests against hand-computed values of
``models/vae_gan.py:302-320`` and the equilibrium-gate truth table of
``train_vgan_stage1.py:396-404``."""

import jax.numpy as jnp
import numpy as np

from fmri_tpu.losses import (
    combine_mode, equilibrium_gate, vaegan_terms, wae_disc_losses,
    wae_penalty_mean, wae_penalty_sum, wae_recon_mean, wae_recon_sum,
)


def _terms(b=2, d=3, fdim=4):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, 2, 2, 1)).astype(np.float32)
    x_tilde = rng.normal(size=(b, 2, 2, 1)).astype(np.float32)
    fl_o = rng.normal(size=(b, fdim)).astype(np.float32)
    fl_p = rng.normal(size=(b, fdim)).astype(np.float32)
    dc_o = rng.uniform(0.01, 0.99, size=(b, 1)).astype(np.float32)
    dc_p = rng.uniform(0.01, 0.99, size=(b, 1)).astype(np.float32)
    dc_s = rng.uniform(0.01, 0.99, size=(b, 1)).astype(np.float32)
    mus = rng.normal(size=(b, d)).astype(np.float32)
    logvars = rng.normal(size=(b, d)).astype(np.float32)
    return x, x_tilde, fl_o, fl_p, dc_o, dc_p, dc_s, mus, logvars


def test_vaegan_terms_hand_computed():
    x, x_tilde, fl_o, fl_p, dc_o, dc_p, dc_s, mus, logvars = _terms()
    t = vaegan_terms(jnp.asarray(x), jnp.asarray(x_tilde), jnp.asarray(fl_o),
                     jnp.asarray(fl_p), jnp.asarray(dc_o), jnp.asarray(dc_p),
                     jnp.asarray(dc_s), jnp.asarray(mus), jnp.asarray(logvars))
    b = x.shape[0]
    np.testing.assert_allclose(
        np.asarray(t.nle), 0.5 * (x.reshape(b, -1) - x_tilde.reshape(b, -1)) ** 2,
        rtol=1e-6)
    # kl = -0.5 * sum(-exp(v) - mu^2 + v + 1)  (vae_gan.py:310)
    kld_ref = -0.5 * np.sum(-np.exp(logvars) - mus**2 + logvars + 1, axis=1)
    np.testing.assert_allclose(np.asarray(t.kld), kld_ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t.mse), np.sum(0.5 * (fl_o - fl_p) ** 2, axis=1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t.bce_dis_original), -np.log(dc_o + 1e-3).ravel(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t.bce_dis_predicted), -np.log(1 - dc_p + 1e-3).ravel(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t.bce_dis_sampled), -np.log(1 - dc_s + 1e-3).ravel(), rtol=1e-5)


def test_combine_mode_vae_gan():
    x, x_tilde, fl_o, fl_p, dc_o, dc_p, dc_s, mus, logvars = _terms()
    t = vaegan_terms(jnp.asarray(x), jnp.asarray(x_tilde), jnp.asarray(fl_o),
                     jnp.asarray(fl_p), jnp.asarray(dc_o), jnp.asarray(dc_p),
                     jnp.asarray(dc_s), jnp.asarray(mus), jnp.asarray(logvars))
    lam = 1e-6
    h = combine_mode(t, "vae-gan", lambda_mse=lam)
    loss_dis = (np.sum(np.asarray(t.bce_dis_original))
                + np.sum(np.asarray(t.bce_dis_predicted))
                + np.sum(np.asarray(t.bce_dis_sampled)))
    np.testing.assert_allclose(
        float(h.encoder),
        np.sum(np.asarray(t.kld)) + np.sum(np.asarray(t.mse)), rtol=1e-5)
    np.testing.assert_allclose(float(h.discriminator), loss_dis, rtol=1e-5)
    np.testing.assert_allclose(
        float(h.decoder),
        np.sum(lam * np.asarray(t.mse)) - (1 - lam) * loss_dis, rtol=1e-5)


def test_combine_mode_vae_excludes_predicted_bce():
    x, x_tilde, fl_o, fl_p, dc_o, dc_p, dc_s, mus, logvars = _terms()
    t = vaegan_terms(jnp.asarray(x), jnp.asarray(x_tilde), jnp.asarray(fl_o),
                     jnp.asarray(fl_p), jnp.asarray(dc_o), jnp.asarray(dc_p),
                     jnp.asarray(dc_s), jnp.asarray(mus), jnp.asarray(logvars))
    h = combine_mode(t, "vae", lambda_mse=1e-6)
    # vae mode: disc = bce_orig + bce_sampled (train_vgan_stage1.py:386)
    np.testing.assert_allclose(
        float(h.discriminator),
        np.sum(np.asarray(t.bce_dis_original)) + np.sum(np.asarray(t.bce_dis_sampled)),
        rtol=1e-5)
    # decoder = lambda * nle only (:387)
    np.testing.assert_allclose(
        float(h.decoder), 1e-6 * np.sum(np.asarray(t.nle)), rtol=1e-4)


def _gate_with(bce_orig, bce_pred, eq=0.68, margin=0.35):
    t = vaegan_terms(
        jnp.zeros((1, 1, 1, 1)), jnp.zeros((1, 1, 1, 1)),
        jnp.zeros((1, 2)), jnp.zeros((1, 2)),
        # invert the bce definitions to hit target means exactly:
        jnp.asarray([[np.exp(-bce_orig) - 1e-3]]),
        jnp.asarray([[1 + 1e-3 - np.exp(-bce_pred)]]),
        jnp.asarray([[0.5]]), jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    dec, dis = equilibrium_gate(t, jnp.float32(eq), jnp.float32(margin))
    return bool(dec), bool(dis)


def test_equilibrium_gate_truth_table():
    # Reference logic (train_vgan_stage1.py:396-404):
    #   bce < eq - margin (=0.33)  -> skip discriminator
    #   bce > eq + margin (=1.03)  -> skip decoder
    #   both skipped               -> train both
    assert _gate_with(0.68, 0.68) == (True, True)      # balanced: both train
    assert _gate_with(0.10, 0.68) == (True, False)     # D too good: skip D
    assert _gate_with(2.00, 0.68) == (False, True)     # D too bad: skip G
    assert _gate_with(0.10, 2.00) == (True, True)      # contradiction: both


def test_wae_losses():
    rng = np.random.default_rng(1)
    d_real = rng.uniform(0.1, 0.9, (4, 1)).astype(np.float32)
    d_fake = rng.uniform(0.1, 0.9, (4, 1)).astype(np.float32)
    lf, lr = wae_disc_losses(jnp.asarray(d_real), jnp.asarray(d_fake), lam=10.0)
    np.testing.assert_allclose(float(lf), -10 * np.sum(np.log(d_fake + 1e-3)), rtol=1e-5)
    np.testing.assert_allclose(float(lr), -10 * np.sum(np.log(1 - d_real + 1e-3)), rtol=1e-5)
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    xr = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        float(wae_recon_sum(jnp.asarray(xr), jnp.asarray(x))),
        np.sum(0.5 * (xr - x) ** 2), rtol=1e-5)
    np.testing.assert_allclose(
        float(wae_recon_mean(jnp.asarray(xr), jnp.asarray(x))),
        np.mean((xr - x) ** 2), rtol=1e-5)
    np.testing.assert_allclose(
        float(wae_penalty_sum(jnp.asarray(d_real))),
        -10 * np.sum(np.log(d_real + 1e-3)), rtol=1e-5)
    np.testing.assert_allclose(
        float(wae_penalty_mean(jnp.asarray(d_real))),
        -10 * np.mean(np.log(d_real + 1e-3)), rtol=1e-5)


class TestAuxLosses:
    """Auxiliary losses (train_utils.py:72-264) vs torch oracles."""

    def test_voxel_loss_matches_torch(self):
        import numpy as np
        import torch
        import torch.nn as tnn
        import jax.numpy as jnp

        from fmri_tpu.losses import voxel_loss

        rng = np.random.default_rng(0)
        a = rng.normal(size=(6, 20)).astype(np.float32)
        b = rng.normal(size=(6, 20)).astype(np.float32)
        ta, tb = torch.tensor(a), torch.tensor(b)
        oracle = (tnn.MSELoss()(ta, tb) +
                  (1 - tnn.CosineSimilarity(dim=1)(ta, tb).mean())).item()
        ours = float(voxel_loss(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(ours, oracle, rtol=1e-5)

    def test_tv_losses_match_torch(self):
        import numpy as np
        import torch
        import jax.numpy as jnp

        from fmri_tpu.losses import (
            total_variation_l1, total_variation_l2, total_variation_loss,
        )

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))  # NCHW oracle

        a = torch.sqrt(torch.abs(tx[:, :, :-1, :-1] - tx[:, :, 1:, :-1]))
        b = torch.sqrt(torch.abs(tx[:, :, :-1, :-1] - tx[:, :, :-1, 1:]))
        o_tv = torch.mean(torch.pow(a + b, 1.25)).item()
        o_l1 = torch.mean(torch.abs(tx[:, :, :-1, :-1] - tx[:, :, 1:, :-1]) +
                          torch.abs(tx[:, :, :-1, :-1] - tx[:, :, :-1, 1:])).item()
        a2 = torch.pow(tx[:, :, :-1, :-1] - tx[:, :, 1:, :-1], 2)
        b2 = torch.pow(tx[:, :, :-1, :-1] - tx[:, :, :-1, 1:], 2)
        o_l2 = torch.mean(torch.sqrt(a2 + b2)).item()

        jx = jnp.asarray(x)
        np.testing.assert_allclose(float(total_variation_loss(jx)), o_tv, rtol=1e-3)
        np.testing.assert_allclose(float(total_variation_l1(jx)), o_l1, rtol=1e-5)
        np.testing.assert_allclose(float(total_variation_l2(jx)), o_l2, rtol=1e-3)

    def test_image_and_feature_losses(self):
        import numpy as np
        import jax.numpy as jnp

        from fmri_tpu.losses import (
            feature_cosine_loss, feature_loss, image_loss,
            norm_image_prediction,
        )

        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
        assert float(image_loss(a, b)) > 0.0
        # the reference's vgg_loss normalizes ONLY the prediction
        # (train_utils.py:152); zero distance needs a pre-normalized target
        assert float(feature_loss(a, norm_image_prediction(a))) < 1e-6
        np.testing.assert_allclose(float(feature_cosine_loss(a, a, depths=(1, 2))),
                                   -2.0, atol=1e-5)
        assert float(feature_loss(a, b)) > 0.0
