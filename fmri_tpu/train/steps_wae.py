"""Fused jitted train steps for the WAE/GAN family (Stages I/II/III) and the
WAE/Dual-GAN composite.

The reference WAE trainers run a two-phase adversarial step per batch
(``train_wae_stage1.py:259-311``): (1) update the latent discriminator with
the encoder/decoder frozen, then (2) update the generator against the *updated*
discriminator.  Each step here is one jitted function that performs both
sub-updates sequentially — preserving the reference's update ordering — with
a single encoder forward (the reference recomputes it per phase; the BN
running-average double-tick is replayed analytically, see
``fmri_tpu.train.common.bn_extra_ticks``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from fmri_tpu.configs.presets import Config
from fmri_tpu.losses.gan_losses import (
    LOG_EPS, combine_mode, equilibrium_gate, vaegan_terms, wae_penalty_mean,
    wae_penalty_sum, wae_recon_mean, wae_recon_sum,
)
from fmri_tpu.models.nets import (
    CognitiveEncoder, Decoder, ImageDiscriminator, LatentDiscriminator,
    VisualEncoder,
)
from fmri_tpu.train.common import apply_with_stats, bn_extra_ticks, gate_float
from fmri_tpu.train.optim import Adam, RmsProp
from fmri_tpu.train.state import TrainState
from fmri_tpu.train.steps_vgan import StepFns, _split_triplet


def make_wae_stage1_step(cfg: Config, lr_schedule=None, donate: bool = True,
                         backward: str = "spliced") -> StepFns:
    """Stage-I WAE/GAN on images (``train_wae_stage1.py``).

    Groups: encoder (visual), decoder, latent_disc.
    Phase 1 (``:269-288``): latent D on z_real = enc(x).mu vs z_fake ~
    N(0, sigma^2); Adam at 0.5x lr (``:223-224``).
    Phase 2 (``:292-311``): enc+dec on sum-squared recon + adversarial penalty
    against the updated D.

    ``backward='spliced'`` (default) runs the encoder forward once and feeds
    phase 2 through VJP splicing (the reference — and ``'naive'`` — recompute
    the encoder in phase 2, ``:275,:296``); gradients are identical
    (``tests/test_steps.py``).
    """
    c = cfg.model
    t = cfg.train
    enc, dec = VisualEncoder(c), Decoder(c)
    ldisc = LatentDiscriminator(c, init_scheme="uniform")
    opt_g = Adam(b1=t.adam_b1, b2=t.adam_b2)
    opt_d = Adam(b1=t.adam_b1, b2=t.adam_b2)
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(t.learning_rate)
    lam, sigma = t.wae_lambda, t.wae_sigma

    def train_step(state: TrainState, x, rng):
        b = x.shape[0]
        z_fake = sigma * jax.random.normal(rng, (b, c.latent_dim), jnp.float32)
        p = state.params
        lr = lr_schedule(state.step)

        # ---- Phase 1: latent discriminator (encoder/decoder frozen) ----
        if backward == "spliced":
            def enc_fn(enc_p):
                (mu_, lv_), s = apply_with_stats(
                    enc, enc_p, state.batch_stats["encoder"], x, train=True)
                return mu_, s

            mu, enc_vjp, enc_s2 = jax.vjp(enc_fn, p["encoder"], has_aux=True)
        else:
            (mu, _lv), _ = apply_with_stats(
                enc, p["encoder"], state.batch_stats["encoder"], x, train=True)

        def d_loss(ld_p):
            d_real = ldisc.apply({"params": ld_p}, jax.lax.stop_gradient(mu))
            d_fake = ldisc.apply({"params": ld_p}, z_fake)
            loss_fake = -lam * jnp.sum(jnp.log(d_fake + LOG_EPS))
            loss_real = -lam * jnp.sum(jnp.log(1.0 - d_real + LOG_EPS))
            return loss_fake + loss_real, (loss_fake, loss_real)

        (d_total, (loss_fake, loss_real)), g_d = jax.value_and_grad(
            d_loss, has_aux=True)(p["latent_disc"])
        new_ld, new_ld_opt = opt_d.update(
            g_d, state.opt_state["latent_disc"], p["latent_disc"], 0.5 * lr, 1.0)

        # ---- Phase 2: generator vs the UPDATED discriminator ----
        if backward == "spliced":
            def dec_fn(dec_p, mu_in):
                return apply_with_stats(dec, dec_p, state.batch_stats["decoder"],
                                        mu_in, train=True)

            x_recon, dec_vjp, dec_s = jax.vjp(dec_fn, p["decoder"], mu,
                                              has_aux=True)
            loss_recon = wae_recon_sum(x_recon, x)
            g_dcd, gmu_rec = dec_vjp(x_recon - x)  # d/d(x_recon) of sum 0.5(.)^2

            def pen_of_mu(mu_):
                return wae_penalty_sum(ldisc.apply({"params": new_ld}, mu_), lam)

            loss_pen, gmu_pen = jax.value_and_grad(pen_of_mu)(
                jax.lax.stop_gradient(mu))
            g_e = enc_vjp(gmu_rec + gmu_pen)[0]
        else:
            def g_loss(enc_p, dec_p):
                (mu2, _), enc_s = apply_with_stats(
                    enc, enc_p, state.batch_stats["encoder"], x, train=True)
                x_recon, dec_s = apply_with_stats(
                    dec, dec_p, state.batch_stats["decoder"], mu2, train=True)
                d_real = ldisc.apply({"params": new_ld}, mu2)
                loss_recon = wae_recon_sum(x_recon, x)
                loss_pen = wae_penalty_sum(d_real, lam)
                return loss_recon + loss_pen, (loss_recon, loss_pen, enc_s,
                                               dec_s, x_recon)

            (_, (loss_recon, loss_pen, enc_s2, dec_s, x_recon)), (g_e, g_dcd) = (
                jax.value_and_grad(g_loss, argnums=(0, 1), has_aux=True)(
                    p["encoder"], p["decoder"]))

        new_enc, new_enc_opt = opt_g.update(
            g_e, state.opt_state["encoder"], p["encoder"], lr, 1.0)
        new_dec, new_dec_opt = opt_g.update(
            g_dcd, state.opt_state["decoder"], p["decoder"], lr, 1.0)

        # Reference runs the encoder twice per batch (:275,:296) -> BN running
        # stats tick twice on the same batch statistics.
        enc_stats = bn_extra_ticks(state.batch_stats["encoder"], enc_s2, extra=1)

        metrics = {
            "loss_reconstruction": loss_recon / b,
            "loss_penalty": loss_pen / b,
            "loss_discriminator_fake": loss_fake / b,
            "loss_discriminator_real": loss_real / b,
            "lr": lr,
        }
        new_state = TrainState(
            params={"encoder": new_enc, "decoder": new_dec, "latent_disc": new_ld},
            batch_stats={"encoder": enc_stats, "decoder": dec_s,
                         "latent_disc": {}},
            opt_state={"encoder": new_enc_opt, "decoder": new_dec_opt,
                       "latent_disc": new_ld_opt},
            step=state.step + 1)
        return new_state, metrics

    def eval_step(state: TrainState, x, rng=None):
        """Eval: decode the mean latent (``WaeGan.forward`` eval branch,
        ``vae_gan.py:490-493``)."""
        mu, _ = enc.apply({"params": state.params["encoder"],
                           "batch_stats": state.batch_stats["encoder"]},
                          x, train=False)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         mu, train=False)

    donate_args = (0,) if donate else ()
    from fmri_tpu.train.steps_vgan import _make_generate_step

    return StepFns(jax.jit(train_step, donate_argnums=donate_args),
                   jax.jit(eval_step),
                   _make_generate_step(dec, c.latent_dim))


def make_wae_cognitive_step(cfg: Config, stage: int, lr_schedule_enc=None,
                            lr_schedule_dec=None, lr_schedule_disc=None,
                            donate: bool = True) -> StepFns:
    """Stage-II/III cognitive WAE step (``train_wae_stage2.py`` /
    ``train_wae_stage3.py``).

    Groups: encoder (cognitive), decoder, latent_disc, teacher_encoder (frozen
    Stage-I visual encoder).

    Phase 1 (both stages, ``train_wae_stage2.py:286-307``): latent D trained to
    score teacher latents (from images) toward 0 and cognitive latents (from
    fMRI) toward 1 — adversarial latent *alignment*, labels reproduced verbatim.

    Phase 2:
      * stage 2 (``:312-330``): cognitive encoder trained on mean-MSE recon +
        mean adversarial penalty; decoder frozen (``:197-198,277``).
      * stage 3 (``train_wae_stage3.py:330-347``): decoder trained on pure
        mean-MSE recon (the penalty backward is commented out at ``:344``);
        encoder frozen.

    Stage-2/3 hard-coded optimizer setting (``train_wae_stage2.py:237-243``,
    ``train_wae_stage3.py:258-264``): Adam(betas=(0.5, 0.999)), enc/dec lr
    1e-3, disc lr 5e-4, StepLR(30, 0.5) — ignoring the config lr, reproduced
    via the default schedules below.
    """
    assert stage in (2, 3)
    c = cfg.model
    t = cfg.train
    cog = CognitiveEncoder(c)
    teacher_enc = VisualEncoder(c)
    dec = Decoder(c)
    ldisc = LatentDiscriminator(c, init_scheme="normal")
    # Adam betas (0.5, 0.999): train_wae_stage2.py:237-243.
    opt = Adam(b1=0.5, b2=0.999)
    base_enc = lr_schedule_enc or (lambda step: jnp.float32(1e-3))
    base_dec = lr_schedule_dec or (lambda step: jnp.float32(1e-3))
    base_disc = lr_schedule_disc or (lambda step: jnp.float32(5e-4))
    lam = t.wae_lambda

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        fmri, image = batch["fmri"], batch["image"]
        b = fmri.shape[0]
        p = state.params
        stats = state.batch_stats

        # Teacher latents feed the latent-D's "real" side in both stages
        # (train_wae_stage2.py:285, train_wae_stage3.py:312; the teacher
        # module stays in ctor-default train mode, so its BN ticks).
        (mu_teacher, _), teach_s = apply_with_stats(
            teacher_enc, p["teacher_encoder"], stats["teacher_encoder"],
            image, train=True)
        if stage == 2:
            # gt reconstruction through the SHARED decoder
            # (train_wae_stage2.py:282-284) — used for epoch metrics, not
            # the losses, but it ticks the decoder's BN.  Stage 3 has no
            # such decode (train_wae_stage3.py's batch loop decodes only
            # x_recon), so its decoder BN base is the carried stats.
            _x_gt, dec_s0 = apply_with_stats(
                dec, p["decoder"], stats["decoder"], mu_teacher, train=True)
        else:
            dec_s0 = stats["decoder"]

        # ---- Phase 1: latent discriminator ----
        (mu_cog, _), cog_s = apply_with_stats(
            cog, p["encoder"], stats["encoder"], fmri, train=True)

        def d_loss(ld_p):
            d_fake = ldisc.apply({"params": ld_p}, mu_cog)      # cognitive
            d_real = ldisc.apply({"params": ld_p}, mu_teacher)  # teacher
            loss_fake = -lam * jnp.sum(jnp.log(d_fake + LOG_EPS))
            loss_real = -lam * jnp.sum(jnp.log(1.0 - d_real + LOG_EPS))
            return loss_fake + loss_real, (loss_fake, loss_real)

        (_, (loss_fake, loss_real)), g_d = jax.value_and_grad(
            d_loss, has_aux=True)(p["latent_disc"])
        lr_d = base_disc(state.step)
        new_ld, new_ld_opt = opt.update(
            g_d, state.opt_state["latent_disc"], p["latent_disc"], lr_d, 1.0)

        # ---- Phase 2: generator vs updated discriminator ----
        new_params = dict(p, latent_disc=new_ld)
        new_opt = dict(state.opt_state, latent_disc=new_ld_opt)

        if stage == 2:
            def g_loss(cog_p):
                (mu2, _), cog_s2 = apply_with_stats(
                    cog, cog_p, stats["encoder"], fmri, train=True)
                x_recon, dec_s = apply_with_stats(
                    dec, p["decoder"], dec_s0, mu2, train=True)
                d_real = ldisc.apply({"params": new_ld}, mu2)
                loss_recon = wae_recon_mean(x_recon, image)
                loss_pen = wae_penalty_mean(d_real, lam)
                return loss_recon + loss_pen, (loss_recon, loss_pen, cog_s2,
                                               dec_s, x_recon)

            (_, (loss_recon, loss_pen, cog_s2, dec_s, x_recon)), g_e = (
                jax.value_and_grad(g_loss, has_aux=True)(p["encoder"]))
            lr_e = base_enc(state.step)
            new_params["encoder"], new_opt["encoder"] = opt.update(
                g_e, state.opt_state["encoder"], p["encoder"], lr_e, 1.0)
            # cognitive encoder ran twice (:298,:317) -> double BN tick.
            cog_stats = bn_extra_ticks(stats["encoder"], cog_s2, extra=1)
            new_stats = {"encoder": cog_stats, "decoder": dec_s,
                         "latent_disc": {}, "teacher_encoder": teach_s}
        else:
            def g_loss(dec_p):
                (mu2, _), cog_s2 = apply_with_stats(
                    cog, p["encoder"], stats["encoder"], fmri, train=True)
                x_recon, dec_s = apply_with_stats(
                    dec, dec_p, dec_s0, mu2, train=True)
                d_real = ldisc.apply({"params": new_ld}, mu2)
                loss_recon = wae_recon_mean(x_recon, image)
                loss_pen = wae_penalty_mean(d_real, lam)  # logged only (:344)
                return loss_recon, (loss_recon, loss_pen, cog_s2, dec_s, x_recon)

            (_, (loss_recon, loss_pen, cog_s2, dec_s, x_recon)), g_dec = (
                jax.value_and_grad(g_loss, has_aux=True)(p["decoder"]))
            lr_dec = base_dec(state.step)
            new_params["decoder"], new_opt["decoder"] = opt.update(
                g_dec, state.opt_state["decoder"], p["decoder"], lr_dec, 1.0)
            cog_stats = bn_extra_ticks(stats["encoder"], cog_s2, extra=1)
            new_stats = {"encoder": cog_stats, "decoder": dec_s,
                         "latent_disc": {}, "teacher_encoder": teach_s}

        metrics = {
            "loss_reconstruction": loss_recon,
            "loss_penalty": loss_pen,
            "loss_discriminator_fake": loss_fake / b,
            "loss_discriminator_real": loss_real / b,
        }
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, metrics

    def eval_step(state: TrainState, batch, rng=None):
        fmri = batch["fmri"] if isinstance(batch, dict) else batch
        mu, _ = cog.apply({"params": state.params["encoder"],
                           "batch_stats": state.batch_stats["encoder"]},
                          fmri, train=False)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         mu, train=False)

    donate_args = (0,) if donate else ()
    from fmri_tpu.train.steps_vgan import _make_generate_step

    return StepFns(jax.jit(train_step, donate_argnums=donate_args),
                   jax.jit(eval_step),
                   _make_generate_step(dec, c.latent_dim))


def make_wae_vgan_step(cfg: Config, mode: str = "vae-gan", lr_schedule=None,
                       donate: bool = True, backward: str = "spliced") -> StepFns:
    """Stage-I WAE/Dual-GAN step (``train/wae_vgan_stage1.py``): the full
    VAE/GAN step plus a latent discriminator regularising the encoder posterior.

    Groups: encoder, decoder, discriminator (image), latent_disc.

    Per batch (``:300-441``): main VAE/GAN forward + losses + gate; latent-D
    update on mus vs z ~ N(0, 0.5^2) with weight ``lam`` (RMSprop, ``:248-250``);
    then the encoder update uses grad(L_enc) + grad(penalty vs updated latent D)
    — the reference accumulates the penalty backward into the encoder grads
    before ``optimizer_encoder.step()`` (``:414,421-425``); decoder/image-D
    updates as in Stage I.  The reference also calls ``optimizer_decoder.step()``
    with zero grads during the penalty phase (``:417``) — an extra RMSprop
    moment-decay tick on the decoder, reproduced for state parity.
    """
    c = cfg.model
    t = cfg.train
    enc, dec, disc = VisualEncoder(c), Decoder(c), ImageDiscriminator(c)
    ldisc = LatentDiscriminator(c, init_scheme="uniform")
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=t.grad_clip)
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(t.learning_rate)
    # NOT t.wae_lambda: this trainer's latent-D weight is the --lam flag,
    # default 1.0 (wae_vgan_stage1.py:87,390-391,411) — the WAE trainers'
    # hard-coded 10 does not apply here.
    lam, sigma = t.wae_vgan_lam, t.wae_sigma

    def forward(enc_p, dec_p, disc_p, stats, x, eps, z_p):
        (mu, lv), enc_s = apply_with_stats(enc, enc_p, stats["encoder"], x, train=True)
        z = mu + eps * jnp.exp(0.5 * lv)
        if c.fused_decoder_batch:
            # one fused 2B decode, sequential-BN semantics (models/norm.py)
            both, dec_s = apply_with_stats(
                dec, dec_p, stats["decoder"],
                jnp.concatenate([z, z_p], axis=0), train=True, vsplit=2)
            x_tilde, x_p = both[: x.shape[0]], both[x.shape[0] :]
        else:
            x_tilde, dec_s = apply_with_stats(dec, dec_p, stats["decoder"], z,
                                              train=True)
            x_p, dec_s = apply_with_stats(dec, dec_p, dec_s, z_p, train=True)
        concat = jnp.concatenate([x, x_tilde, x_p], axis=0)
        (feats, score), disc_s = apply_with_stats(
            disc, disc_p, stats["discriminator"], concat, train=True)
        b = x.shape[0]
        fo, fp, so, sp, ss = _split_triplet(feats, score, b)
        terms = vaegan_terms(x, x_tilde, fo, fp, so, sp, ss, mu, lv)
        new_stats = {"encoder": enc_s, "decoder": dec_s, "discriminator": disc_s,
                     "latent_disc": {}}
        return terms, new_stats, mu

    def grads_naive(state, x, eps, z_p, lambda_mse, b):
        p = state.params

        def heads_fn(enc_p, dec_p, disc_p):
            terms, new_stats, mu = forward(
                enc_p, dec_p, disc_p, state.batch_stats, x, eps, z_p)
            h = combine_mode(terms, mode, lambda_mse=lambda_mse,
                             beta=t.beta, batch_size=b)
            return (h.encoder, h.decoder, h.discriminator), (terms, new_stats, h, mu)

        heads, vjp_fn, aux = jax.vjp(
            heads_fn, p["encoder"], p["decoder"], p["discriminator"], has_aux=True)
        terms, new_stats, h, mu = aux
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        g_enc = vjp_fn((one, zero, zero))[0]
        g_dec = vjp_fn((zero, one, zero))[1]
        g_dis = vjp_fn((zero, zero, one))[2]

        def add_mu_cot(cot_mu):
            """Penalty grads via a full re-traversal (reference :405-414)."""

            def pen_path(enc_p):
                (mu2, _), _ = apply_with_stats(
                    enc, enc_p, state.batch_stats["encoder"], x, train=True)
                return jnp.vdot(jax.lax.stop_gradient(cot_mu), mu2)

            return jax.grad(pen_path)(p["encoder"])

        return g_enc, g_dec, g_dis, terms, new_stats, h, mu, add_mu_cot

    def grads_spliced(state, x, eps, z_p, lambda_mse, b):
        """Segment-wise backward (see ``make_vgan_stage1_step``); the latent-D
        penalty joins the encoder backward as an extra cotangent at ``mu``
        instead of the reference's third full encoder traversal."""
        p = state.params
        stats = state.batch_stats
        uses_B = mode in ("vae-gan", "beta-vae")

        def enc_fn(enc_p):
            (mu, lv), s = apply_with_stats(enc, enc_p, stats["encoder"], x,
                                           train=True)
            z = mu + eps * jnp.exp(0.5 * lv)
            return (z, mu, lv), s

        (z, mu, lv), enc_vjp, enc_s = jax.vjp(enc_fn, p["encoder"], has_aux=True)

        def dec_fn(dec_p, z_in):
            if c.fused_decoder_batch:
                both, s = apply_with_stats(
                    dec, dec_p, stats["decoder"],
                    jnp.concatenate([z_in, z_p], axis=0), train=True,
                    vsplit=2)
                return (both[:b], both[b:]), s
            xt, s1 = apply_with_stats(dec, dec_p, stats["decoder"], z_in,
                                      train=True)
            xp, s2 = apply_with_stats(dec, dec_p, s1, z_p, train=True)
            return (xt, xp), s2

        (x_tilde, x_p), dec_vjp, dec_s = jax.vjp(dec_fn, p["decoder"], z,
                                                 has_aux=True)

        def disc_fn(disc_p, xt, xp):
            concat = jnp.concatenate([x, xt, xp], axis=0)
            return apply_with_stats(disc, disc_p, stats["discriminator"],
                                    concat, train=True)

        (feats, score), disc_vjp, disc_s = jax.vjp(
            disc_fn, p["discriminator"], x_tilde, x_p, has_aux=True)

        fo, fpr, so, sp, ss = _split_triplet(feats, score, b)
        terms = vaegan_terms(x, x_tilde, fo, fpr, so, sp, ss, mu, lv)
        h = combine_mode(terms, mode, lambda_mse=lambda_mse,
                         beta=t.beta, batch_size=b)
        new_stats = {"encoder": enc_s, "decoder": dec_s,
                     "discriminator": disc_s, "latent_disc": {}}

        def C_fn(score_):
            so_, sp_, ss_ = score_[:b], score_[b : 2 * b], score_[2 * b :]
            l = jnp.sum(-jnp.log(so_ + LOG_EPS)) + jnp.sum(-jnp.log(1.0 - ss_ + LOG_EPS))
            if uses_B:
                l = l + jnp.sum(-jnp.log(1.0 - sp_ + LOG_EPS))
            return l

        cot_score_C = jax.grad(C_fn)(score)
        gdiscC, gxtC, gxpC = disc_vjp((jnp.zeros_like(feats), cot_score_C))
        g_dis = gdiscC
        lamb = lambda_mse
        if uses_B:
            def B_fn(feats_):
                return jnp.sum(0.5 * (feats_[:b] - feats_[b : 2 * b]) ** 2)

            cot_feats_B = jax.grad(B_fn)(feats)
            _, gxtB, gxpB = disc_vjp((cot_feats_B, jnp.zeros_like(score)))
            cot_dec = (lamb * gxtB - (1.0 - lamb) * gxtC,
                       lamb * gxpB - (1.0 - lamb) * gxpC)
            cot_enc_img = gxtB
        else:
            cot_nle = x_tilde - x
            if mode == "dcgan":
                cot_dec = (lamb * cot_nle - (1.0 - lamb) * gxtC,
                           -(1.0 - lamb) * gxpC)
            else:
                cot_dec = (lamb * cot_nle, jnp.zeros_like(x_p))
            cot_enc_img = cot_nle

        g_dec, _ = dec_vjp(cot_dec)
        _, gz_enc = dec_vjp((cot_enc_img, jnp.zeros_like(x_p)))
        kA = (t.beta / b) if mode == "beta-vae" else 1.0
        base_cots = (gz_enc, kA * mu, kA * 0.5 * (jnp.exp(lv) - 1.0))
        g_enc = enc_vjp(base_cots)[0]

        def add_mu_cot(cot_mu):
            """Extra encoder grads for a given cotangent at mu — one more
            (cheap) encoder backward, no decoder/discriminator traversal."""
            zero_z = jnp.zeros_like(z)
            return enc_vjp((zero_z, cot_mu, jnp.zeros_like(lv)))[0]

        return g_enc, g_dec, g_dis, terms, new_stats, h, mu, add_mu_cot

    grads_fn = grads_spliced if backward == "spliced" else grads_naive

    def train_step(state: TrainState, x, rng, margin, equilibrium, lambda_mse):
        b = x.shape[0]
        k_eps, k_zp, k_zf = jax.random.split(rng, 3)
        eps = jax.random.normal(k_eps, (b, c.latent_dim), jnp.float32)
        z_p = jax.random.normal(k_zp, (b, c.latent_dim), jnp.float32)
        z_fake = sigma * jax.random.normal(k_zf, (b, c.latent_dim), jnp.float32)
        p = state.params
        lr = lr_schedule(state.step)

        g_enc, g_dec, g_dis, terms, new_stats, h, mu, add_mu_cot = grads_fn(
            state, x, eps, z_p, lambda_mse, b)

        # ---- latent discriminator update (:380-397) ----
        def d_loss(ld_p):
            d_real = ldisc.apply({"params": ld_p}, mu)
            d_fake = ldisc.apply({"params": ld_p}, z_fake)
            loss_fake = -lam * jnp.sum(jnp.log(d_fake + LOG_EPS))
            loss_real = -lam * jnp.sum(jnp.log(1.0 - d_real + LOG_EPS))
            return loss_fake + loss_real, (loss_fake, loss_real)

        (_, (loss_fake, loss_real)), g_ld = jax.value_and_grad(
            d_loss, has_aux=True)(p["latent_disc"])
        new_ld, new_ld_opt = opt.update(
            g_ld, state.opt_state["latent_disc"], p["latent_disc"], lr, 1.0)

        # ---- penalty vs updated latent D, accumulated into encoder grads
        #      (:405-414,421-425): cotangent at mu, pushed through the
        #      encoder backward ----
        def pen_of_mu(mu_):
            d_real = ldisc.apply({"params": new_ld}, mu_)
            return wae_penalty_sum(d_real, lam)

        loss_pen, cot_mu_pen = jax.value_and_grad(pen_of_mu)(
            jax.lax.stop_gradient(mu))
        g_pen = add_mu_cot(cot_mu_pen)
        g_enc = jax.tree_util.tree_map(jnp.add, g_enc, g_pen)

        # Reference quirk (:417): optimizer_decoder.step() with zero grads
        # decays the decoder RMSprop moments once before the real update.
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, g_dec)
        _, dec_opt_decayed = opt.update(
            zero_g, state.opt_state["decoder"], p["decoder"], lr, 1.0)

        dec_gate, dis_gate = equilibrium_gate(
            terms, equilibrium, margin, init_dis=(mode != "vae"))
        new_params = dict(p, latent_disc=new_ld)
        new_opt = dict(state.opt_state, latent_disc=new_ld_opt)
        if mode != "dcgan":
            new_params["encoder"], new_opt["encoder"] = opt.update(
                g_enc, state.opt_state["encoder"], p["encoder"], lr, 1.0)
        new_params["decoder"], new_opt["decoder"] = opt.update(
            g_dec, dec_opt_decayed, p["decoder"], lr, gate_float(dec_gate))
        new_params["discriminator"], new_opt["discriminator"] = opt.update(
            g_dis, state.opt_state["discriminator"], p["discriminator"], lr,
            gate_float(dis_gate))

        # Encoder ran 3x in the reference (main fwd, D phase, penalty phase):
        # replay two extra BN ticks (same batch -> exact analytic replay).
        new_stats["encoder"] = bn_extra_ticks(
            state.batch_stats["encoder"], new_stats["encoder"], extra=2)
        # The penalty phase also decodes x_recon = dec(mu) (:406) — unused by
        # any loss (loss_reconstruction is commented out, :409-412) but a
        # THIRD decoder BN tick with different inputs (mu, not z/z_p), so it
        # cannot be replayed analytically; run the stats-only decode.
        _, dec_s3 = apply_with_stats(
            dec, p["decoder"], new_stats["decoder"],
            jax.lax.stop_gradient(mu), train=True)
        new_stats["decoder"] = dec_s3

        metrics = {
            "loss_encoder": h.encoder / b,
            "loss_decoder": h.decoder / b,
            "loss_discriminator": h.discriminator / b,
            "loss_reconstruction": h.nle_sum / b,
            "loss_penalty": loss_pen / b,
            "loss_discriminator_fake": loss_fake / b,
            "loss_discriminator_real": loss_real / b,
            "train_dec": gate_float(dec_gate),
            "train_dis": gate_float(dis_gate),
            "lr": lr,
        }
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, metrics

    def eval_step(state: TrainState, x, rng=None):
        mu, lv = enc.apply({"params": state.params["encoder"],
                            "batch_stats": state.batch_stats["encoder"]},
                           x, train=False)
        if rng is None:
            z = mu
        else:
            z = mu + jax.random.normal(rng, mu.shape) * jnp.exp(0.5 * lv)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         z, train=False)

    donate_args = (0,) if donate else ()
    from fmri_tpu.train.steps_vgan import _make_generate_step

    return StepFns(jax.jit(train_step, donate_argnums=donate_args),
                   jax.jit(eval_step),
                   _make_generate_step(dec, c.latent_dim))
