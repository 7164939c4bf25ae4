"""Fused jitted train steps for the Dual-VAE/GAN family (Stages I/II/III).

Each reference trainer's per-batch work — forward, three selective backward
passes through one retained graph, equilibrium gating, optimizer steps
(``train_vgan_stage1.py:316-432``) — collapses into ONE jitted function:

  * one forward (``jax.vjp``) shared by all heads, exactly like the reference's
    retained graph;
  * one pullback call per loss head, each scoped to its parameter group —
    the functional equivalent of ``loss.backward(retain_graph=True)`` +
    ``optimizer_<group>.step()`` + ``zero_grad()``;
  * the equilibrium/margin gate as branchless masked updates (a skipped update
    also freezes the RMSprop moments, matching a skipped ``optimizer.step()``);
  * explicit PRNG threading for the reparameterisation eps and the prior
    samples z_p (the reference's implicit CUDA RNG, ``vae_gan.py:266-269,281``).

Device-boundary note: the reference syncs loss scalars to host every batch
(``train_vgan_stage1.py:391-394``); here the step returns a metrics dict that
stays on device until the caller flushes it.
"""

from __future__ import annotations


from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from fmri_tpu.configs.presets import Config
from fmri_tpu.losses.gan_losses import (
    combine_mode, equilibrium_gate, vaegan_terms,
)
from fmri_tpu.models.nets import (
    CognitiveEncoder, Decoder, ImageDiscriminator, VisualEncoder,
)
from fmri_tpu.train.common import apply_with_stats, gate_float
from fmri_tpu.train.optim import RmsProp
from fmri_tpu.train.state import TrainState


class StepFns(NamedTuple):
    train_step: Any
    eval_step: Any
    # decode-from-noise sampler (the reference's model(None) branch,
    # vae_gan.py:294-297); used for the 'generated' image panels
    generate_step: Any = None


def _split_triplet(feats, score, b):
    return (feats[:b], feats[b : 2 * b],
            score[:b], score[b : 2 * b], score[2 * b :])

def _make_generate_step(dec, latent_dim):
    """Decode z ~ N(0, I) with BN running averages (``vae_gan.py:294-297``)."""

    def generate_step(state: TrainState, rng, n: int):
        z_p = jax.random.normal(rng, (n, latent_dim), jnp.float32)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         z_p, train=False)

    return jax.jit(generate_step, static_argnums=(2,))



def make_vgan_stage1_step(cfg: Config, mode: str = "vae-gan",
                          lr_schedule=None, donate: bool = True,
                          backward: str = "spliced") -> StepFns:
    """Stage-I image-to-image VAE/GAN step (``train_vgan_stage1.py``).

    ``mode``: 'vae-gan' | 'vae' | 'beta-vae' | 'dcgan' (``:359-387``).
    State groups: encoder (visual), decoder, discriminator.

    ``backward`` selects the gradient computation:
      * ``'naive'`` — one shared forward + three full-graph pullbacks, the
        direct analogue of the reference's three ``backward(retain_graph)``
        calls (``train_vgan_stage1.py:406-432``).
      * ``'spliced'`` (default) — mathematically identical gradients from
        segment-wise VJPs recombined by linearity: the three head losses are
        linear combinations of two base losses (feature-matching ``B`` and
        GAN ``C``), so each expensive segment backward runs only for the
        cotangent bases that need it.  (XLA's DCE already prunes grads that a
        naive pullback discards, so the measured win is the remaining
        redundant traversals: ~12% fewer FLOPs, ~15% faster steps on a v5e;
        equivalence-tested in ``tests/test_steps.py``.)
    """
    c = cfg.model
    t = cfg.train
    enc, dec, disc = VisualEncoder(c), Decoder(c), ImageDiscriminator(c)
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=t.grad_clip)
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(t.learning_rate)
    uses_B = mode in ("vae-gan", "beta-vae")  # feature-matching in enc/dec loss

    def decode_pair(dec_p, stats_d, z, z_p):
        """x_tilde and x_p: two sequential decodes (reference order) or one
        fused 2B decode (cfg.model.fused_decoder_batch) with ``vsplit=2``
        per-sub-batch BN statistics — mathematically identical to the
        sequential pair (``models/norm.py``), just one traversal of the
        decoder stack per direction instead of two."""
        if c.fused_decoder_batch:
            both, dec_s = apply_with_stats(
                dec, dec_p, stats_d, jnp.concatenate([z, z_p], axis=0),
                train=True, vsplit=2)
            b = z.shape[0]
            return both[:b], both[b:], dec_s
        x_tilde, dec_s1 = apply_with_stats(dec, dec_p, stats_d, z, train=True)
        x_p, dec_s2 = apply_with_stats(dec, dec_p, dec_s1, z_p, train=True)
        return x_tilde, x_p, dec_s2

    def forward(enc_p, dec_p, disc_p, stats, x, eps, z_p):
        (mu, lv), enc_s = apply_with_stats(enc, enc_p, stats["encoder"], x, train=True)
        z = mu + eps * jnp.exp(0.5 * lv)
        x_tilde, x_p, dec_s2 = decode_pair(dec_p, stats["decoder"], z, z_p)
        concat = jnp.concatenate([x, x_tilde, x_p], axis=0)
        (feats, score), disc_s = apply_with_stats(
            disc, disc_p, stats["discriminator"], concat, train=True)
        b = x.shape[0]
        fo, fp, so, sp, ss = _split_triplet(feats, score, b)
        terms = vaegan_terms(x, x_tilde, fo, fp, so, sp, ss, mu, lv)
        new_stats = {"encoder": enc_s, "decoder": dec_s2, "discriminator": disc_s}
        return terms, new_stats, x_tilde

    def grads_naive(state, x, eps, z_p, lambda_mse, b):
        p = state.params

        def heads_fn(enc_p, dec_p, disc_p):
            terms, new_stats, x_tilde = forward(
                enc_p, dec_p, disc_p, state.batch_stats, x, eps, z_p)
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
        return g_enc, g_dec, g_dis, terms, new_stats, h

    def grads_spliced(state, x, eps, z_p, lambda_mse, b):
        """Segment-wise backward: see factory docstring.

        Cotangent bookkeeping (vae-gan/beta-vae; A = kld, B = feature-match
        mse, C = per-mode GAN bce sum, NLE = pixel sse):
          g_dis = dC/d(disc)
          g_dec = lam*dB/d(dec) - (1-lam)*dC/d(dec)      [dcgan/vae: NLE for B]
          g_enc = kA*dA/d(enc) + dB/d(enc)               [vae/dcgan: NLE for B]
        Each segment VJP is linear in its cotangent, so the B- and C-basis
        pullbacks are computed once and recombined per head.
        """
        p = state.params
        stats = state.batch_stats

        def enc_fn(enc_p):
            (mu, lv), s = apply_with_stats(enc, enc_p, stats["encoder"], x,
                                           train=True)
            z = mu + eps * jnp.exp(0.5 * lv)
            return (z, mu, lv), s

        (z, mu, lv), enc_vjp, enc_s = jax.vjp(enc_fn, p["encoder"], has_aux=True)

        def dec_fn(dec_p, z_in):
            xt, xp, s = decode_pair(dec_p, stats["decoder"], z_in, z_p)
            return (xt, xp), s

        (x_tilde, x_p), dec_vjp, dec_s = jax.vjp(dec_fn, p["decoder"], z,
                                                 has_aux=True)

        def disc_fn(disc_p, xt, xp):
            concat = jnp.concatenate([x, xt, xp], axis=0)
            (feats, score), s = apply_with_stats(
                disc, disc_p, stats["discriminator"], concat, train=True)
            return (feats, score), s

        (feats, score), disc_vjp, disc_s = jax.vjp(
            disc_fn, p["discriminator"], x_tilde, x_p, has_aux=True)

        fo, fpr, so, sp, ss = _split_triplet(feats, score, b)
        terms = vaegan_terms(x, x_tilde, fo, fpr, so, sp, ss, mu, lv)
        h = combine_mode(terms, mode, lambda_mse=lambda_mse,
                         beta=t.beta, batch_size=b)
        new_stats = {"encoder": enc_s, "decoder": dec_s, "discriminator": disc_s}

        # --- cheap tail cotangents on the base losses ---
        def C_fn(score_):
            so_, sp_, ss_ = score_[:b], score_[b : 2 * b], score_[2 * b :]
            l = jnp.sum(-jnp.log(so_ + 1e-3)) + jnp.sum(-jnp.log(1.0 - ss_ + 1e-3))
            if uses_B:  # vae-gan L_dis includes the predicted term (:363)
                l = l + jnp.sum(-jnp.log(1.0 - sp_ + 1e-3))
            return l

        cot_score_C = jax.grad(C_fn)(score)
        zero_feats = jnp.zeros_like(feats)

        # --- discriminator backwards: C basis (+ B basis when used) ---
        gdiscC, gxtC, gxpC = disc_vjp((zero_feats, cot_score_C))
        g_dis = gdiscC
        lam = lambda_mse
        if uses_B:
            def B_fn(feats_):
                return jnp.sum(0.5 * (feats_[:b] - feats_[b : 2 * b]) ** 2)

            cot_feats_B = jax.grad(B_fn)(feats)
            _, gxtB, gxpB = disc_vjp((cot_feats_B, jnp.zeros_like(score)))
            cot_dec = (lam * gxtB - (1.0 - lam) * gxtC,
                       lam * gxpB - (1.0 - lam) * gxpC)
            cot_enc_img = gxtB
        else:
            cot_nle = x_tilde - x  # d/d(x_tilde) of sum 0.5*(x - x_tilde)^2
            if mode == "dcgan":
                cot_dec = (lam * cot_nle - (1.0 - lam) * gxtC,
                           -(1.0 - lam) * gxpC)
            else:  # 'vae': L_dec = lam * NLE only
                cot_dec = (lam * cot_nle, jnp.zeros_like(x_p))
            cot_enc_img = cot_nle

        # --- decoder backwards: head combo for g_dec, B/NLE basis for enc ---
        g_dec, _ = dec_vjp(cot_dec)
        if mode == "dcgan":  # encoder frozen in dcgan mode (:376-378)
            g_enc = jax.tree_util.tree_map(jnp.zeros_like, p["encoder"])
        else:
            _, gz_enc = dec_vjp((cot_enc_img, jnp.zeros_like(x_p)))
            # A = sum kld: dA/dmu = mu, dA/dlv = 0.5*(exp(lv) - 1).
            kA = (t.beta / b) if mode == "beta-vae" else 1.0
            g_enc = enc_vjp((gz_enc, kA * mu, kA * 0.5 * (jnp.exp(lv) - 1.0)))[0]
        return g_enc, g_dec, g_dis, terms, new_stats, h

    grads_fn = grads_spliced if backward == "spliced" else grads_naive

    def train_step(state: TrainState, x, rng, margin, equilibrium, lambda_mse):
        b = x.shape[0]
        k_eps, k_zp = jax.random.split(rng)
        eps = jax.random.normal(k_eps, (b, c.latent_dim), jnp.float32)
        z_p = jax.random.normal(k_zp, (b, c.latent_dim), jnp.float32)
        p = state.params

        g_enc, g_dec, g_dis, terms, new_stats, h = grads_fn(
            state, x, eps, z_p, lambda_mse, b)

        dec_gate, dis_gate = equilibrium_gate(
            terms, equilibrium, margin, init_dis=(mode != "vae"))
        lr = lr_schedule(state.step)

        new_params = dict(p)
        new_opt = dict(state.opt_state)
        if mode != "dcgan":  # dcgan freezes the visual encoder (:376-378)
            new_params["encoder"], new_opt["encoder"] = opt.update(
                g_enc, state.opt_state["encoder"], p["encoder"], lr, 1.0)
        new_params["decoder"], new_opt["decoder"] = opt.update(
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
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, metrics

    def eval_step(state: TrainState, x, rng=None):
        """Eval reconstruction (``VaeGan.forward`` eval branch,
        ``vae_gan.py:288-297``): encode -> reparameterize -> decode, with BN
        running averages."""
        variables = {"params": state.params["encoder"],
                     "batch_stats": state.batch_stats["encoder"]}
        mu, lv = enc.apply(variables, x, train=False)
        if rng is None:
            z = mu
        else:
            z = mu + jax.random.normal(rng, mu.shape) * jnp.exp(0.5 * lv)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         z, train=False)

    donate_args = (0,) if donate else ()
    return StepFns(
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
        _make_generate_step(dec, c.latent_dim),
    )


def make_vgan_cognitive_step(cfg: Config, stage: int, mode: str = "vae-gan",
                             use_teacher: bool = True, lr_schedule=None,
                             donate: bool = True,
                             backward: str = "spliced") -> StepFns:
    """Stage-II/III cognitive VAE/GAN step
    (``train_vgan_stage2.py`` / ``train_vgan_stage3.py``).

    State groups: encoder (cognitive), decoder, discriminator, teacher_encoder
    (frozen visual encoder from Stage I).

    Stage II (``train_vgan_stage2.py:321-407``): trains encoder + discriminator
    with elementwise grad clamp +-1; decoder frozen; the gate is disabled
    (``train_dis=True, train_dec=False`` hard-coded after the mode blocks).
    Inter-modality distillation: the teacher encodes the GT image and the
    shared decoder reconstructs it as the discriminator's 'real'
    (``vae_gan.py:367-377``).

    Stage III (``train_vgan_stage3.py:320-410``): encoder frozen, decoder +
    discriminator trained with the equilibrium gate and grad clamp; the
    distillation branch is inert because it requires ``stage == 2``
    (``vae_gan.py:367``), so 'real' is the raw image.
    """
    assert stage in (2, 3)
    c = cfg.model
    t = cfg.train
    cog = CognitiveEncoder(c)
    teacher_enc = VisualEncoder(c)
    dec, disc = Decoder(c), ImageDiscriminator(c)
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(t.learning_rate)
    distill = use_teacher and stage == 2

    def forward(cog_p, dec_p, disc_p, stats, teacher_p, fmri, image,
                eps, eps_t, z_p):
        (mu, lv), cog_s = apply_with_stats(cog, cog_p, stats["encoder"],
                                           fmri, train=True)
        z = mu + eps * jnp.exp(0.5 * lv)
        b_ = z.shape[0]
        teach_s = stats.get("teacher_encoder", {})
        if stage == 3 and c.fused_decoder_batch:
            # one fused 2B decode with sequential-BN semantics (vsplit=2):
            # identical to the x_tilde-then-x_p pair (see make_vgan_stage1_step)
            both, dec_s = apply_with_stats(
                dec, dec_p, stats["decoder"],
                jnp.concatenate([z, z_p], axis=0), train=True, vsplit=2)
            x_tilde, x_p = both[:b_], both[b_:]
            gt_x = image
        else:
            x_tilde, dec_s = apply_with_stats(dec, dec_p, stats["decoder"], z,
                                              train=True)
            if distill:
                (mu_t, lv_t), teach_s = apply_with_stats(
                    teacher_enc, teacher_p, stats["teacher_encoder"], image,
                    train=True)
                z_t = mu_t + eps_t * jnp.exp(0.5 * lv_t)
                if c.fused_decoder_batch:
                    # fuse the two grad-free decodes (gt_x from the teacher
                    # latent, x_p from the prior) into one 2B pass
                    both, dec_s = apply_with_stats(
                        dec, dec_p, dec_s, jnp.concatenate([z_t, z_p], axis=0),
                        train=True, vsplit=2)
                    gt_x, x_p = both[:b_], both[b_:]
                else:
                    gt_x, dec_s = apply_with_stats(dec, dec_p, dec_s, z_t,
                                                   train=True)
                    x_p, dec_s = apply_with_stats(dec, dec_p, dec_s, z_p,
                                                  train=True)
            else:
                gt_x = image
                x_p, dec_s = apply_with_stats(dec, dec_p, dec_s, z_p,
                                              train=True)
        concat = jnp.concatenate([gt_x, x_tilde, x_p], axis=0)
        (feats, score), disc_s = apply_with_stats(
            disc, disc_p, stats["discriminator"], concat, train=True)
        b = fmri.shape[0]
        fo, fp, so, sp, ss = _split_triplet(feats, score, b)
        terms = vaegan_terms(gt_x, x_tilde, fo, fp, so, sp, ss, mu, lv)
        new_stats = {"encoder": cog_s, "decoder": dec_s,
                     "discriminator": disc_s, "teacher_encoder": teach_s}
        return terms, new_stats, (gt_x, x_tilde)

    def grads_naive(state, fmri, image, eps, eps_t, z_p, lambda_mse, b):
        p = state.params

        def heads_fn(cog_p, dec_p, disc_p):
            terms, new_stats, imgs = forward(
                cog_p, dec_p, disc_p, state.batch_stats,
                p.get("teacher_encoder"), fmri, image, eps, eps_t, z_p)
            h = combine_mode(terms, mode, lambda_mse=lambda_mse,
                             beta=t.beta, batch_size=b)
            return (h.encoder, h.decoder, h.discriminator), (terms, new_stats, h)

        heads, vjp_fn, aux = jax.vjp(
            heads_fn, p["encoder"], p["decoder"], p["discriminator"], has_aux=True)
        terms, new_stats, h = aux
        one, zero = jnp.float32(1.0), jnp.float32(0.0)
        if stage == 2:
            g_enc = vjp_fn((one, zero, zero))[0]
            g_dec = None
        else:
            g_enc = None
            g_dec = vjp_fn((zero, one, zero))[1]
        g_dis = vjp_fn((zero, zero, one))[2]
        return g_enc, g_dec, g_dis, terms, new_stats, h

    def grads_spliced(state, fmri, image, eps, eps_t, z_p, lambda_mse, b):
        """Segment-wise backward (see ``make_vgan_stage1_step``): frozen
        groups never get a backward pass (the naive pullback wastes weight
        gradients on the frozen decoder in stage 2 and traverses the teacher
        graph), and the discriminator backward runs once per base loss."""
        p = state.params
        stats = state.batch_stats
        uses_B = mode in ("vae-gan", "beta-vae")

        def enc_fn(cog_p):
            (mu, lv), s = apply_with_stats(cog, cog_p, stats["encoder"],
                                           fmri, train=True)
            z = mu + eps * jnp.exp(0.5 * lv)
            return (z, mu, lv), s

        # --- teacher / gt_x, sampled decode, stats threading as in forward ---
        if stage == 2:
            (z, mu, lv), enc_vjp, cog_s = jax.vjp(enc_fn, p["encoder"],
                                                  has_aux=True)

            def decz_fn(z_in):
                return apply_with_stats(dec, p["decoder"], stats["decoder"],
                                        z_in, train=True)

            x_tilde, dec_vjp_z, dec_s = jax.vjp(decz_fn, z, has_aux=True)
        else:
            (z, mu, lv), cog_s = enc_fn(p["encoder"])  # frozen: no vjp

        teach_s = stats.get("teacher_encoder", {})
        if stage == 2:
            if distill:
                (mu_t, lv_t), teach_s = apply_with_stats(
                    teacher_enc, p["teacher_encoder"], stats["teacher_encoder"],
                    image, train=True)
                z_t = mu_t + eps_t * jnp.exp(0.5 * lv_t)
                if c.fused_decoder_batch:
                    # the gt_x and x_p decodes carry no decoder/encoder grads
                    # (decoder frozen; teacher frozen; z_p is noise): fuse
                    # them into one 2B pass with sequential-BN semantics
                    both, dec_s = apply_with_stats(
                        dec, p["decoder"], dec_s,
                        jnp.concatenate([z_t, z_p], axis=0), train=True,
                        vsplit=2)
                    gt_x, x_p = both[:b], both[b:]
                else:
                    gt_x, dec_s = apply_with_stats(dec, p["decoder"], dec_s,
                                                   z_t, train=True)
                    x_p, dec_s = apply_with_stats(dec, p["decoder"], dec_s,
                                                  z_p, train=True)
            else:
                gt_x = image
                x_p, dec_s = apply_with_stats(dec, p["decoder"], dec_s, z_p,
                                              train=True)

            def disc_fn(disc_p, xt):
                concat = jnp.concatenate([gt_x, xt, x_p], axis=0)
                return apply_with_stats(disc, disc_p, stats["discriminator"],
                                        concat, train=True)

            (feats, score), disc_vjp, disc_s = jax.vjp(
                disc_fn, p["discriminator"], x_tilde, has_aux=True)
        else:
            gt_x = image  # distillation requires stage == 2 (vae_gan.py:367)

            def dec_fn(dec_p):
                if c.fused_decoder_batch:
                    both, s = apply_with_stats(
                        dec, dec_p, stats["decoder"],
                        jnp.concatenate([z, z_p], axis=0), train=True,
                        vsplit=2)
                    return (both[:b], both[b:]), s
                xt, s1 = apply_with_stats(dec, dec_p, stats["decoder"], z,
                                          train=True)
                xp, s2 = apply_with_stats(dec, dec_p, s1, z_p, train=True)
                return (xt, xp), s2

            (x_tilde, x_p), dec_vjp, dec_s = jax.vjp(dec_fn, p["decoder"],
                                                     has_aux=True)

            def disc_fn(disc_p, xt, xp):
                concat = jnp.concatenate([gt_x, xt, xp], axis=0)
                return apply_with_stats(disc, disc_p, stats["discriminator"],
                                        concat, train=True)

            (feats, score), disc_vjp, disc_s = jax.vjp(
                disc_fn, p["discriminator"], x_tilde, x_p, has_aux=True)

        fo, fpr, so, sp, ss = _split_triplet(feats, score, b)
        terms = vaegan_terms(gt_x, x_tilde, fo, fpr, so, sp, ss, mu, lv)
        h = combine_mode(terms, mode, lambda_mse=lambda_mse,
                         beta=t.beta, batch_size=b)
        new_stats = {"encoder": cog_s, "decoder": dec_s,
                     "discriminator": disc_s, "teacher_encoder": teach_s}

        def C_fn(score_):
            so_, sp_, ss_ = score_[:b], score_[b : 2 * b], score_[2 * b :]
            l = jnp.sum(-jnp.log(so_ + 1e-3)) + jnp.sum(-jnp.log(1.0 - ss_ + 1e-3))
            if uses_B:
                l = l + jnp.sum(-jnp.log(1.0 - sp_ + 1e-3))
            return l

        cot_score_C = jax.grad(C_fn)(score)
        zero_feats = jnp.zeros_like(feats)
        lam = lambda_mse

        if stage == 2:
            gdiscC, _ = disc_vjp((zero_feats, cot_score_C))
            g_dis = gdiscC
            if uses_B:
                def B_fn(feats_):
                    return jnp.sum(0.5 * (feats_[:b] - feats_[b : 2 * b]) ** 2)

                cot_feats_B = jax.grad(B_fn)(feats)
                _, cot_xt_enc = disc_vjp((cot_feats_B, jnp.zeros_like(score)))
            else:  # 'vae': L_enc = kld + NLE (nle w.r.t. x_tilde)
                cot_xt_enc = x_tilde - gt_x
            gz = dec_vjp_z(cot_xt_enc)[0]
            kA = (t.beta / b) if mode == "beta-vae" else 1.0
            g_enc = enc_vjp((gz, kA * mu, kA * 0.5 * (jnp.exp(lv) - 1.0)))[0]
            g_dec = None
        else:
            gdiscC, gxtC, gxpC = disc_vjp((zero_feats, cot_score_C))
            g_dis = gdiscC
            if uses_B:
                def B_fn(feats_):
                    return jnp.sum(0.5 * (feats_[:b] - feats_[b : 2 * b]) ** 2)

                cot_feats_B = jax.grad(B_fn)(feats)
                _, gxtB, gxpB = disc_vjp((cot_feats_B, jnp.zeros_like(score)))
                cot_dec = (lam * gxtB - (1.0 - lam) * gxtC,
                           lam * gxpB - (1.0 - lam) * gxpC)
            else:  # 'vae': L_dec = lam * NLE
                cot_dec = (lam * (x_tilde - gt_x), jnp.zeros_like(x_p))
            g_dec = dec_vjp(cot_dec)[0]
            g_enc = None
        return g_enc, g_dec, g_dis, terms, new_stats, h

    grads_fn = grads_spliced if backward == "spliced" else grads_naive

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng,
                   margin, equilibrium, lambda_mse):
        fmri, image = batch["fmri"], batch["image"]
        b = fmri.shape[0]
        k_eps, k_t, k_zp = jax.random.split(rng, 3)
        eps = jax.random.normal(k_eps, (b, c.latent_dim), jnp.float32)
        eps_t = jax.random.normal(k_t, (b, c.latent_dim), jnp.float32)
        z_p = jax.random.normal(k_zp, (b, c.latent_dim), jnp.float32)
        p = state.params

        g_enc, g_dec, g_dis, terms, new_stats, h = grads_fn(
            state, fmri, image, eps, eps_t, z_p, lambda_mse, b)
        lr = lr_schedule(state.step)
        new_params = dict(p)
        new_opt = dict(state.opt_state)

        if stage == 2:
            # encoder + discriminator always train; decoder frozen
            # (train_vgan_stage2.py:376-407).
            dec_gate = jnp.asarray(False)
            dis_gate = jnp.asarray(True)
            new_params["encoder"], new_opt["encoder"] = opt.update(
                g_enc, state.opt_state["encoder"], p["encoder"], lr, 1.0)
            new_params["discriminator"], new_opt["discriminator"] = opt.update(
                g_dis, state.opt_state["discriminator"], p["discriminator"], lr, 1.0)
        else:
            # stage 3: decoder + discriminator with the equilibrium gate
            # (train_vgan_stage3.py:377-410); encoder frozen.
            dec_gate, dis_gate = equilibrium_gate(
                terms, equilibrium, margin, init_dis=(mode != "vae"))
            new_params["decoder"], new_opt["decoder"] = opt.update(
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
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, metrics

    def eval_step(state: TrainState, batch, rng=None):
        """Eval: fMRI -> reconstruction (``VaeGanCognitive`` eval branch,
        ``vae_gan.py:397-402``)."""
        fmri = batch["fmri"] if isinstance(batch, dict) else batch
        mu, lv = cog.apply({"params": state.params["encoder"],
                            "batch_stats": state.batch_stats["encoder"]},
                           fmri, train=False)
        if rng is None:
            z = mu
        else:
            z = mu + jax.random.normal(rng, mu.shape) * jnp.exp(0.5 * lv)
        return dec.apply({"params": state.params["decoder"],
                          "batch_stats": state.batch_stats["decoder"]},
                         z, train=False)

    donate_args = (0,) if donate else ()
    return StepFns(
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
        _make_generate_step(dec, c.latent_dim),
    )
