"""Fused train steps for the thesis ablation experiments
(reference ``experiments/``, SURVEY.md §2.6).

  * supervised decoder    — ``exp_decoder.py``    (fMRI -> image, pure MSE)
  * cognitive-from-scratch — ``exp_vae.py`` (mode 'vae') / ``exp_vgan.py``
    (mode 'vae-gan'): Dual-VAE(/GAN) trained directly on BOLD with no teacher
  * DCGAN stage 1         — ``exp_dcgan_stage1.py`` (plain DCGAN on images)
  * DCGAN stage 2         — ``exp_dcgan_stage2.py`` (cognitive graph over a
    frozen DCGAN generator; effectively only the discriminator updates — the
    encoder backward is commented out at ``:336-338`` and the decoder is
    frozen at ``:188``, reproduced faithfully)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from fmri_tpu.configs.presets import Config
from fmri_tpu.losses.gan_losses import (
    LOG_EPS, combine_mode, equilibrium_gate, vaegan_terms,
)
from fmri_tpu.models.nets import (
    CognitiveEncoder, Decoder, ImageDiscriminator, VoxelDecoder,
)
from fmri_tpu.train.common import apply_with_stats, gate_float
from fmri_tpu.train.optim import Adam, RmsProp
from fmri_tpu.train.state import TrainState
from fmri_tpu.train.steps_vgan import StepFns, _split_triplet


def make_supervised_decoder_step(cfg: Config, lr_schedule=None,
                                 donate: bool = True) -> StepFns:
    """Supervised decoder: ``loss = MSE(decoder(fmri), image)``, Adam(lr .01,
    betas .9/.999) + ExponentialLR (``exp_decoder.py:213,253-260``)."""
    c = cfg.model
    dec = VoxelDecoder(c)
    opt = Adam(b1=0.9, b2=0.999)
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(0.01)

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        fmri, image = batch["fmri"], batch["image"]

        def loss_fn(dec_p):
            x_tilde, dec_s = apply_with_stats(
                dec, dec_p, state.batch_stats["decoder"], fmri, train=True)
            return jnp.mean((image - x_tilde) ** 2), dec_s

        (loss, dec_s), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["decoder"])
        lr = lr_schedule(state.step)
        new_dec, new_opt = opt.update(
            g, state.opt_state["decoder"], state.params["decoder"], lr, 1.0)
        metrics = {"loss_decoder": loss, "lr": lr}
        return TrainState(params={"decoder": new_dec},
                          batch_stats={"decoder": dec_s},
                          opt_state={"decoder": new_opt},
                          step=state.step + 1), metrics

    def eval_step(state: TrainState, batch, rng=None):
        fmri = batch["fmri"] if isinstance(batch, dict) else batch
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         fmri, train=False)

    donate_args = (0,) if donate else ()
    # no noise sampler: the supervised decoder's input is the voxel vector,
    # not a latent (exp_decoder.py:172-174)
    return StepFns(jax.jit(train_step, donate_argnums=donate_args),
                   jax.jit(eval_step), None)


def make_cognitive_scratch_step(cfg: Config, mode: str = "vae-gan",
                                lr_schedule=None, donate: bool = True) -> StepFns:
    """Cognitive Dual-VAE(/GAN) from scratch on BOLD — no teacher
    (``VaeGanCognitive(teacher_net=None, stage=3)``, ``exp_vgan.py:165-167``,
    ``exp_vae.py:199-201``).

    Mode-faithful schedule details (update-level oracles in
    ``tests/test_update_parity_exp.py``):
      * 'vae-gan' (``exp_vgan.py:265-313``): all three groups with grad clamp
        +-1 (encoder :295, decoder :304, discriminator :312 — all ACTIVE,
        unlike the main stage-1 trainer's commented clamps) and the standard
        equilibrium gate.
      * 'vae' (``exp_vae.py:332-375``): encoder (clamp) + decoder (NO clamp,
        ``:366`` commented); the gate block is commented out (``:347-352``)
        so ``train_dec=True, train_dis=False`` are CONSTANTS — the
        discriminator never updates and the both-off rescue never fires."""
    c = cfg.model
    t = cfg.train
    cog, dec, disc = CognitiveEncoder(c), Decoder(c), ImageDiscriminator(c)
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)
    opt_dec = (opt if mode == "vae-gan"
               else RmsProp(decay=t.rms_decay, eps=t.rms_eps))
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(t.learning_rate)

    def forward(cog_p, dec_p, disc_p, stats, fmri, image, eps, z_p):
        (mu, lv), cog_s = apply_with_stats(cog, cog_p, stats["encoder"],
                                           fmri, train=True)
        z = mu + eps * jnp.exp(0.5 * lv)
        x_tilde, dec_s = apply_with_stats(dec, dec_p, stats["decoder"], z, train=True)
        x_p, dec_s = apply_with_stats(dec, dec_p, dec_s, z_p, train=True)
        concat = jnp.concatenate([image, x_tilde, x_p], axis=0)
        (feats, score), disc_s = apply_with_stats(
            disc, disc_p, stats["discriminator"], concat, train=True)
        b = fmri.shape[0]
        fo, fp, so, sp, ss = _split_triplet(feats, score, b)
        terms = vaegan_terms(image, x_tilde, fo, fp, so, sp, ss, mu, lv)
        return terms, {"encoder": cog_s, "decoder": dec_s, "discriminator": disc_s}

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng,
                   margin, equilibrium, lambda_mse):
        fmri, image = batch["fmri"], batch["image"]
        b = fmri.shape[0]
        k_eps, k_zp = jax.random.split(rng)
        eps = jax.random.normal(k_eps, (b, c.latent_dim), jnp.float32)
        z_p = jax.random.normal(k_zp, (b, c.latent_dim), jnp.float32)
        p = state.params

        def heads_fn(cog_p, dec_p, disc_p):
            terms, new_stats = forward(cog_p, dec_p, disc_p, state.batch_stats,
                                       fmri, image, eps, z_p)
            h = combine_mode(terms, mode, lambda_mse=lambda_mse,
                             beta=t.beta, batch_size=b)
            return (h.encoder, h.decoder, h.discriminator), (terms, new_stats, h)

        heads, vjp_fn, aux = jax.vjp(
            heads_fn, p["encoder"], p["decoder"], p["discriminator"], has_aux=True)
        terms, new_stats, h = aux
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        g_enc = vjp_fn((one, zero, zero))[0]
        g_dec = vjp_fn((zero, one, zero))[1]
        g_dis = vjp_fn((zero, zero, one))[2]

        if mode == "vae":
            # exp_vae.py:343-352: gate block commented out — constants
            dec_gate, dis_gate = jnp.asarray(True), jnp.asarray(False)
        else:
            dec_gate, dis_gate = equilibrium_gate(terms, equilibrium, margin)
        lr = lr_schedule(state.step)
        new_params = dict(p)
        new_opt = dict(state.opt_state)
        new_params["encoder"], new_opt["encoder"] = opt.update(
            g_enc, state.opt_state["encoder"], p["encoder"], lr, 1.0)
        new_params["decoder"], new_opt["decoder"] = opt_dec.update(
            g_dec, state.opt_state["decoder"], p["decoder"], lr,
            gate_float(dec_gate))
        new_params["discriminator"], new_opt["discriminator"] = opt.update(
            g_dis, state.opt_state["discriminator"], p["discriminator"], lr,
            gate_float(dis_gate))

        metrics = {
            "loss_encoder": h.encoder / b,
            "loss_decoder": h.decoder / b,
            "loss_discriminator": h.discriminator / b,
            "loss_reconstruction": h.nle_sum / b,
            "train_dec": gate_float(dec_gate),
            "train_dis": gate_float(dis_gate),
            "lr": lr,
        }
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1), metrics

    def eval_step(state: TrainState, batch, rng=None):
        fmri = batch["fmri"] if isinstance(batch, dict) else batch
        mu, lv = cog.apply({"params": state.params["encoder"],
                            "batch_stats": state.batch_stats["encoder"]},
                           fmri, train=False)
        z = mu if rng is None else mu + jax.random.normal(
            rng, mu.shape) * jnp.exp(0.5 * lv)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         z, train=False)

    donate_args = (0,) if donate else ()
    from fmri_tpu.train.steps_vgan import _make_generate_step

    return StepFns(jax.jit(train_step, donate_argnums=donate_args),
                   jax.jit(eval_step),
                   _make_generate_step(dec, c.latent_dim))


def make_dcgan_stage1_step(cfg: Config, lr_schedule=None,
                           donate: bool = True) -> StepFns:
    """Plain DCGAN on images (``exp_dcgan_stage1.py``): generator decodes
    noise, discriminator sees concat(gt, x_tilde, x_tilde)
    (``vae_gan.py:605-611``); ``L_D = sum(-log(D(gt)+eps)) +
    sum(-log(1-D(x_t)+eps))``, ``L_G = sum(-log(D(x_t)+eps))``
    (``:287-291``); equilibrium gate + grad clamp +-1; RMSprop."""
    c = cfg.model
    t = cfg.train
    dec, disc = Decoder(c), ImageDiscriminator(c)
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(t.learning_rate)

    def train_step(state: TrainState, x, rng, margin, equilibrium, lambda_mse):
        b = x.shape[0]
        z_p = jax.random.normal(rng, (b, c.latent_dim), jnp.float32)
        p = state.params

        def heads_fn(dec_p, disc_p):
            x_tilde, dec_s = apply_with_stats(
                dec, dec_p, state.batch_stats["decoder"], z_p, train=True)
            concat = jnp.concatenate([x, x_tilde, x_tilde], axis=0)
            (_, score), disc_s = apply_with_stats(
                disc, disc_p, state.batch_stats["discriminator"], concat,
                train=True)
            so, sp, ss = score[:b], score[b : 2 * b], score[2 * b :]
            bce_orig = -jnp.log(so + LOG_EPS)
            bce_pred = -jnp.log(sp + LOG_EPS)       # generator fools D
            bce_samp = -jnp.log(1.0 - ss + LOG_EPS)
            loss_dis = jnp.sum(bce_orig) + jnp.sum(bce_samp)
            loss_dec = jnp.sum(bce_pred)
            stats = {"decoder": dec_s, "discriminator": disc_s}
            # gate means are THIS script's bce definitions: mean(-log(so+eps))
            # and mean(-log(sp+eps)) — the generator bce, NOT the
            # predicted-as-fake bce the main family gates on
            # (exp_dcgan_stage1.py:286-287,301-306; caught by the update-level
            # oracle in tests/test_update_parity_exp.py)
            gates = (jnp.mean(bce_orig), jnp.mean(bce_pred))
            return (loss_dec, loss_dis), (stats, gates)

        (heads, vjp_fn, aux) = jax.vjp(heads_fn, p["decoder"], p["discriminator"],
                                       has_aux=True)
        new_stats, (m_orig, m_pred) = aux
        loss_dec, loss_dis = heads
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        g_dis = vjp_fn((zero, one))[1]

        # equilibrium gate on the script's OWN bce means — mean(-log(so+eps))
        # and mean(-log(sp+eps)) (exp_dcgan_stage1.py:286-287,298-309).
        dis_low = (m_orig < equilibrium - margin) | (m_pred < equilibrium - margin)
        dec_high = (m_orig > equilibrium + margin) | (m_pred > equilibrium + margin)
        train_dis, train_dec = ~dis_low, ~dec_high
        both_off = jnp.logical_and(~train_dis, ~train_dec)
        train_dis, train_dec = train_dis | both_off, train_dec | both_off

        # Reference grad-accumulation quirk (exp_dcgan_stage1.py:313-327):
        # after the discriminator backward, only model.discriminator is
        # zero_grad'ed (:320) — the decoder grads that
        # loss_discriminator.backward() deposited (via the D(x_tilde)
        # 'sampled' term) survive, and loss_decoder.backward() ACCUMULATES
        # onto them, so the decoder step uses
        # d(loss_dec + loss_dis)/d(dec) whenever the discriminator trained
        # this batch.  Branchless: fold the gate into the cotangent.
        # (Caught by the update-level oracle in test_update_parity_exp.py.)
        g_dec = vjp_fn((one, gate_float(train_dis)))[0]

        lr = lr_schedule(state.step)
        new_params = dict(p)
        new_opt = dict(state.opt_state)
        new_params["discriminator"], new_opt["discriminator"] = opt.update(
            g_dis, state.opt_state["discriminator"], p["discriminator"], lr,
            gate_float(train_dis))
        new_params["decoder"], new_opt["decoder"] = opt.update(
            g_dec, state.opt_state["decoder"], p["decoder"], lr,
            gate_float(train_dec))

        metrics = {"loss_decoder": loss_dec / b,
                   "loss_discriminator": loss_dis / b,
                   "train_dec": gate_float(train_dec),
                   "train_dis": gate_float(train_dis), "lr": lr}
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1), metrics

    def eval_step(state: TrainState, x, rng=None):
        """Eval: sample z ~ N(0, I) and decode (``vae_gan.py:615-618``)."""
        b = x.shape[0] if not isinstance(x, dict) else x["image"].shape[0]
        key = rng if rng is not None else jax.random.key(0)
        z_p = jax.random.normal(key, (b, c.latent_dim), jnp.float32)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         z_p, train=False)

    donate_args = (0,) if donate else ()
    from fmri_tpu.train.steps_vgan import _make_generate_step

    return StepFns(jax.jit(train_step, donate_argnums=donate_args),
                   jax.jit(eval_step),
                   _make_generate_step(dec, c.latent_dim))


def make_dcgan_stage2_step(cfg: Config, lr_schedule=None,
                           donate: bool = True) -> StepFns:
    """Cognitive graph over a stage-1 DCGAN generator
    (``exp_dcgan_stage2.py``): full vae-gan losses; **decoder** (gated, NO
    grad clamp — the clamp line is commented out at ``:344``) and
    **discriminator** (gated, clamp +-1, ``:352``) train; the encoder is
    frozen (``requires_grad=False`` at ``:187-188`` and its backward is
    commented out at ``:336-338``).  Note the "Fix decoder weights" freeze
    loop is itself commented out (``:281-283``), so the decoder DOES update
    via ``optimizer_decoder.step()`` (``:343-345``) — pinned by the
    update-level oracle in ``tests/test_update_parity_exp.py``, which caught
    this step previously freezing the decoder."""
    c = cfg.model
    t = cfg.train
    cog, dec, disc = CognitiveEncoder(c), Decoder(c), ImageDiscriminator(c)
    opt_dec = RmsProp(decay=t.rms_decay, eps=t.rms_eps)  # no clamp (:344)
    opt_dis = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)  # :352
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(t.learning_rate)

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng,
                   margin, equilibrium, lambda_mse):
        fmri, image = batch["fmri"], batch["image"]
        b = fmri.shape[0]
        k_eps, k_zp = jax.random.split(rng)
        eps = jax.random.normal(k_eps, (b, c.latent_dim), jnp.float32)
        z_p = jax.random.normal(k_zp, (b, c.latent_dim), jnp.float32)
        p = state.params

        def heads_fn(dec_p, disc_p):
            stats = state.batch_stats
            (mu, lv), cog_s = apply_with_stats(cog, p["encoder"],
                                               stats["encoder"], fmri, train=True)
            z = mu + eps * jnp.exp(0.5 * lv)
            x_tilde, dec_s = apply_with_stats(dec, dec_p,
                                              stats["decoder"], z, train=True)
            x_p, dec_s = apply_with_stats(dec, dec_p, dec_s, z_p, train=True)
            concat = jnp.concatenate([image, x_tilde, x_p], axis=0)
            (feats, score), disc_s = apply_with_stats(
                disc, disc_p, stats["discriminator"], concat, train=True)
            fo, fp, so, sp, ss = _split_triplet(feats, score, b)
            terms = vaegan_terms(image, x_tilde, fo, fp, so, sp, ss, mu, lv)
            h = combine_mode(terms, "vae-gan", lambda_mse=lambda_mse,
                             beta=t.beta, batch_size=b)
            stats_new = {"encoder": cog_s, "decoder": dec_s,
                         "discriminator": disc_s}
            return (h.decoder, h.discriminator), (terms, h, stats_new)

        heads, vjp_fn, aux = jax.vjp(heads_fn, p["decoder"], p["discriminator"],
                                     has_aux=True)
        terms, h, new_stats = aux
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        g_dec = vjp_fn((one, zero))[0]
        g_dis = vjp_fn((zero, one))[1]

        dec_gate, dis_gate = equilibrium_gate(terms, equilibrium, margin)
        lr = lr_schedule(state.step)
        new_params = dict(p)
        new_opt = dict(state.opt_state)
        new_params["decoder"], new_opt["decoder"] = opt_dec.update(
            g_dec, state.opt_state["decoder"], p["decoder"], lr,
            gate_float(dec_gate))
        new_params["discriminator"], new_opt["discriminator"] = opt_dis.update(
            g_dis, state.opt_state["discriminator"], p["discriminator"], lr,
            gate_float(dis_gate))
        metrics = {"loss_encoder": h.encoder / b,
                   "loss_decoder": h.decoder / b,
                   "loss_discriminator": h.discriminator / b,
                   "loss_reconstruction": h.nle_sum / b,
                   "train_dec": gate_float(dec_gate),
                   "train_dis": gate_float(dis_gate), "lr": lr}
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1), metrics

    def eval_step(state: TrainState, batch, rng=None):
        fmri = batch["fmri"] if isinstance(batch, dict) else batch
        mu, lv = cog.apply({"params": state.params["encoder"],
                            "batch_stats": state.batch_stats["encoder"]},
                           fmri, train=False)
        z = mu if rng is None else mu + jax.random.normal(
            rng, mu.shape) * jnp.exp(0.5 * lv)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         z, train=False)

    donate_args = (0,) if donate else ()
    from fmri_tpu.train.steps_vgan import _make_generate_step

    return StepFns(jax.jit(train_step, donate_argnums=donate_args),
                   jax.jit(eval_step),
                   _make_generate_step(dec, c.latent_dim))
