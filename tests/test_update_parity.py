"""UPDATE-level parity against the reference executed as oracle.

``tests/test_reference_parity.py`` proves forward/loss parity against the
reference's own ``models/vae_gan.py``.  These tests prove the next level up:
that one fused jitted train step produces the SAME post-step parameters as
the reference's per-batch training schedule — three selective backwards +
per-head RMSprop steps for the VAE/GAN families
(``train_vgan_stage1.py:406-432``, ``train_vgan_stage2.py:389-407``) and the
two-phase Adam game for the WAE families (``train_wae_stage1.py:269-311``,
``train_wae_stage2.py:288-328``) — from identical converted weights, batch,
and injected noise.

Measurement design (see ``tests/ref_oracle.py`` for the rationale):

  * each torch oracle runs twice — fp32 and fp64 — and the JAX step's
    parameter delta must sit within a small multiple of the fp32 oracle's
    own distance from the fp64 truth ("you may be no less accurate than the
    reference itself at fp32");
  * second moments are seeded to 1.0 on both sides so a single update is
    ~linear in the gradient (cold-start RMSprop/Adam turn sub-noise gradient
    elements into +-lr sign bits that no two fp32 frameworks can agree on);
  * the VAE/GAN oracles use per-group ``torch.autograd.grad`` at original
    weights — the historical semantics of the reference's schedule, whose
    literal form modern torch rejects (pinned below).

Headline results (also mirrored in docs/design.md §1): the fused step is NOT
an approximation of the reference's sequential schedule — the post-step
parameters agree to fp32 conditioning on every group, because each head's
gradient never routes through another head's parameters.
"""

from __future__ import annotations

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import (
    REF, apply_grads, assert_updates_match, group_grads, import_reference,
    leafdict, nchw, to_dtype_sd, warm_adam, warm_jax_opt_state, warm_rmsprop,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available")

B = 4
LATENT = 512  # the repo's checked-in res100 block (models_config.py:19)
LAMBDA_MSE = 1e-6


# --------------------------------------------------------------------------
# shared torch-side base models (converted once, deep-copied per oracle run)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vgan_base():
    """Seeded reference VaeGan with BN running stats ticked by real
    train-mode forwards (the same construction the forward-parity tests
    validate)."""
    import torch

    ref_models, ref_cfg = import_reference()
    assert ref_cfg.image_size == 100
    torch.manual_seed(8)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = ref_models.VaeGan(device="cpu", z_size=LATENT, recon_level=3)
    with torch.no_grad():
        model.train()
        for _ in range(2):
            model(torch.randn(B, 3, 100, 100))
        model.eval()
    return model


@pytest.fixture(scope="module")
def cfg():
    from fmri_tpu.configs import get_config

    c = get_config("res100")
    assert c.model.fused_decoder_batch is False  # reference decode order
    return c


def _images(seed, n=B, size=100):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, size, size, 3)).astype(np.float32)


def _fmri(seed, cfg, n=B):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, cfg.model.num_voxels)).astype(np.float32)


def _converted(model, cfg, kind):
    from fmri_tpu.checkpoints.torch_import import convert_state_dict

    return convert_state_dict(to_dtype_sd(model), cfg, kind=kind)


# --------------------------------------------------------------------------
# VAE/GAN Stage I (train_vgan_stage1.py, mode 'vae-gan')
# --------------------------------------------------------------------------


def _vgan1_oracle(model, x, eps, z_p, lr):
    """The reference's stage-1 per-batch schedule
    (``train_vgan_stage1.py:316-432``), historical semantics, both gates on.

    Forward composition mirrors ``VaeGan.forward`` train branch
    (``vae_gan.py:275-287``) with the noise injected instead of drawn."""
    import torch

    dt = next(model.parameters()).dtype
    model.train()
    xt = nchw(x).to(dt)
    opts = {}
    for name in ("encoder", "decoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    mus, lv = model.encoder(xt)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(xt, x_tilde, x_p, "REC")
    disc_class = model.discriminator(xt, x_tilde, x_p, "GAN")
    nle, kld, mse, bo, bp, bs = type(model).loss(
        xt, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    # 'vae-gan' head losses (train_vgan_stage1.py:368-372)
    loss_encoder = torch.sum(kld) + torch.sum(mse)
    loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
    loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                    - (1.0 - LAMBDA_MSE) * loss_discriminator)
    for name, loss in (("encoder", loss_encoder), ("decoder", loss_decoder),
                       ("discriminator", loss_discriminator)):
        ps, gs = group_grads(loss, getattr(model, name))
        apply_grads(opts[name], ps, gs)
    return {
        "loss_encoder": float(loss_encoder) / B,
        "loss_decoder": float(loss_decoder) / B,
        "loss_discriminator": float(loss_discriminator) / B,
        "bce_means": (float(bo.mean()), float(bp.mean())),
    }


@pytest.fixture(scope="module")
def vgan1(vgan_base, cfg):
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_stage1_step

    lr = cfg.train.learning_rate
    origin = _converted(vgan_base, cfg, "vae-gan")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps)
    state = make_state(origin, {k: opt for k in origin})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    x = _images(0)
    rng = jax.random.key(42)
    # mirror make_vgan_stage1_step's PRNG contract (steps_vgan.py:231-235)
    k_eps, k_zp = jax.random.split(rng)
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    step = make_vgan_stage1_step(cfg, mode="vae-gan", donate=False)
    new_state, metrics = step.train_step(
        state, jnp.asarray(x), rng, jnp.float32(100.0), jnp.float32(100.0),
        jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(vgan_base)
    t32 = _vgan1_oracle(m32, x, eps, z_p, lr)
    m64 = copy.deepcopy(vgan_base).double()
    _vgan1_oracle(m64, x, eps, z_p, lr)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=_converted(m32, cfg, "vae-gan"),
                after64=_converted(m64, cfg, "vae-gan"),
                torch32=t32, lr=lr)


def test_vgan1_losses_match(vgan1):
    m, t = vgan1["metrics"], vgan1["torch32"]
    assert float(m["train_dec"]) == 1.0 and float(m["train_dis"]) == 1.0
    for k in ("loss_encoder", "loss_decoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_vgan1_updates_match(vgan1):
    """Post-step parameters equal the reference schedule's to within fp32
    conditioning on all three groups — the fused step IS the reference's
    update rule, not an approximation (the sequential enc->dec->disc step
    order is immaterial: every head's gradient is computed at the original
    weights, a consequence the reference inherited from retained-graph
    backward and .data-era optimizer writes)."""
    assert_updates_match(vgan1["origin"], vgan1["state"].params,
                         vgan1["after32"], vgan1["after64"], vgan1["lr"],
                         ("encoder", "decoder", "discriminator"))


def test_vgan1_encoder_decoder_bn_stats_match(vgan1):
    """Encoder ticks once, decoder twice (two sequential decodes) — both
    sides; running stats must agree elementwise."""
    for grp in ("encoder", "decoder"):
        j = leafdict(vgan1["state"].batch_stats[grp])
        t = leafdict(vgan1["after32"][grp]["batch_stats"])
        for ks in j:
            np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                       err_msg=f"{grp}{ks}")


def test_vgan1_disc_bn_ema_single_vs_double_tick(vgan1):
    """The documented EMA delta, pinned quantitatively: the reference calls
    the discriminator twice per batch ('REC' then 'GAN'), but the 'REC'
    pass RETURNS at the recon_level tap (``vae_gan.py:163-173``) — so the
    conv-block BNs tick twice while the fc BN (after the tap) ticks once,
    in the 'GAN' pass only.  The fused single pass ticks everything once;
    replaying one extra tick on the conv blocks reproduces the reference's
    stats exactly, and the fc BN needs no replay."""
    from fmri_tpu.train.common import bn_extra_ticks

    old = vgan1["origin"]["discriminator"]["batch_stats"]
    new = vgan1["state"].batch_stats["discriminator"]
    j2 = {k: (bn_extra_ticks(old[k], new[k], extra=1)
              if k.startswith("EncoderBlock") else new[k]) for k in new}
    j2 = leafdict(j2)
    t = leafdict(vgan1["after32"]["discriminator"]["batch_stats"])
    for ks in j2:
        np.testing.assert_allclose(j2[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=ks)


def test_literal_reference_schedule_rejected_by_modern_torch(vgan_base):
    """Pins WHY the oracle uses historical semantics: the reference's literal
    interleaving — ``loss_encoder.backward(retain_graph=True)``;
    ``optimizer_encoder.step()``; ``loss_decoder.backward(retain_graph=True)``
    (``train_vgan_stage1.py:406-421``) — raises on torch >= 2.x because the
    in-place parameter update bumps autograd version counters that the next
    retained backward checks.  (On the reference's torch-0.4-era API,
    ``optimizer.step()`` wrote through ``.data``, bypassing the check.)"""
    import torch

    model = copy.deepcopy(vgan_base)
    model.train()
    xt = nchw(_images(3))
    opt_enc = torch.optim.RMSprop(model.encoder.parameters(), lr=1e-4)
    mus, lv = model.encoder(xt)
    z = torch.randn(B, LATENT) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.randn(B, LATENT))
    disc_class = model.discriminator(xt, x_tilde, x_p, "GAN")
    loss_encoder = torch.sum(mus ** 2)  # any head loss through the encoder
    loss_decoder = torch.sum(disc_class)
    model.zero_grad()
    loss_encoder.backward(retain_graph=True)
    opt_enc.step()
    with pytest.raises(RuntimeError, match="inplace"):
        loss_decoder.backward(retain_graph=True)


def test_vgan1_literal_execution_equals_historical(vgan_base, vgan1):
    """Closes the one inferential step in the historical-semantics argument
    (design.md §1) EMPIRICALLY: execute the reference's LITERAL stage-1
    schedule — interleaved ``backward(retain_graph=True)`` / optimizer
    steps, ``train_vgan_stage1.py:406-432`` — on modern torch via
    ``DataRmsProp``'s shadow-tensor writes (torch-0.4 ``.data`` semantics:
    parameter memory updates without version-counter bumps), and assert the
    post-step parameters equal the historical grads-at-original-weights
    oracle's to fp32 ULP level.  For this trainer the two are the same
    update rule because the sequencing is benign: the encoder (updated
    first) sits upstream of the decoder/discriminator backwards, the
    decoder update cannot perturb the disc backward (saved activations
    carry the values), and ``model.zero_grad()`` / ``.discriminator.
    zero_grad()`` keep every head's grads clean (:408,418,426)."""
    from ref_oracle import DataRmsProp

    import torch

    model = copy.deepcopy(vgan_base)
    lr = vgan1["lr"]
    x = _images(0)
    rng = jax.random.key(42)
    k_eps, k_zp = jax.random.split(rng)
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    dt = next(model.parameters()).dtype
    model.train()
    xt = nchw(x).to(dt)
    opts = {n: DataRmsProp(getattr(model, n).parameters(), lr)
            for n in ("encoder", "decoder", "discriminator")}
    mus, lv = model.encoder(xt)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(xt, x_tilde, x_p, "REC")
    disc_class = model.discriminator(xt, x_tilde, x_p, "GAN")
    nle, kld, mse, bo, bp, bs = type(model).loss(
        xt, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    loss_encoder = torch.sum(kld) + torch.sum(mse)
    loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
    loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                    - (1.0 - LAMBDA_MSE) * loss_discriminator)
    model.zero_grad()                                  # :408
    loss_encoder.backward(retain_graph=True)           # :412
    opts["encoder"].step()                             # :416
    model.zero_grad()                                  # :418
    loss_decoder.backward(retain_graph=True)           # :422
    opts["decoder"].step()                             # :424
    model.discriminator.zero_grad()                    # :426
    loss_discriminator.backward()                      # :430
    opts["discriminator"].step()                       # :432

    from fmri_tpu.configs import get_config

    lit = _converted(model, get_config("res100"), "vae-gan")
    for grp in ("encoder", "decoder", "discriminator"):
        h = leafdict(vgan1["after32"][grp]["params"])
        l_ = leafdict(lit[grp]["params"])
        for ks in h:
            np.testing.assert_allclose(
                l_[ks], h[ks], rtol=0, atol=1e-6,
                err_msg=f"{grp}{ks}: literal != historical")
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vgan2_base(vgan_base):
    """VaeGanCognitive assembled as the stage-2 trainer does
    (``train_vgan_stage2.py:213-232``): cognitive encoder fresh, decoder and
    discriminator shared with the stage-1 teacher, ``teacher_net`` = the
    whole stage-1 model, ctor-default ``mode='vae'`` (the trainer passes no
    mode; its loss blocks use args.mode='vae-gan')."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(5)
    teacher = copy.deepcopy(vgan_base)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cog = ref_models.CognitiveEncoder(input_size=3620, z_size=LATENT)
    with torch.no_grad():
        cog.train()
        cog(torch.randn(B, 3620))
        cog.eval()
    model = ref_models.VaeGanCognitive(
        device="cpu", encoder=cog, decoder=teacher.decoder,
        discriminator=teacher.discriminator, teacher_net=teacher,
        z_size=LATENT, stage=2)
    for p in teacher.decoder.parameters():  # :221-222
        p.requires_grad = False
    return model


def _vgan2_oracle(model, fmri, image, eps, eps_t, z_p, lr):
    """Stage-2 per-batch schedule (``train_vgan_stage2.py:321-407``):
    forward = ``VaeGanCognitive.forward`` mode-'vae' stage-2 branch
    (``vae_gan.py:362-377``); encoder + discriminator train with elementwise
    grad clamp +-1; decoder frozen; gates hard-coded."""
    import torch

    dt = next(model.encoder.parameters()).dtype
    model.train()
    xf = torch.from_numpy(fmri).to(dt)
    gt = nchw(image).to(dt)
    opts = {}
    for name in ("encoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    for p in model.teacher_net.encoder.parameters():  # vae_gan.py:369-370
        p.requires_grad = False
    mus, lv = model.encoder(xf)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    mu_t, lv_t = model.teacher_net.encoder(gt)
    z_t = torch.from_numpy(eps_t).to(dt) * (0.5 * lv_t).exp() + mu_t
    gt_x = model.decoder(z_t)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(gt_x, x_tilde, x_p, "REC")
    disc_class = model.discriminator(gt_x, x_tilde, x_p, "GAN")
    nle, kld, mse, bo, bp, bs = type(model).loss(
        gt_x, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    loss_encoder = torch.sum(kld) + torch.sum(mse)
    loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
    ps, gs = group_grads(loss_encoder, model.encoder)
    apply_grads(opts["encoder"], ps, gs, clamp=1.0)  # :389-393
    ps, gs = group_grads(loss_discriminator, model.discriminator,
                         retain_graph=False)
    apply_grads(opts["discriminator"], ps, gs, clamp=1.0)  # :404-407
    return {"loss_encoder": float(loss_encoder) / B,
            "loss_discriminator": float(loss_discriminator) / B}


@pytest.fixture(scope="module")
def vgan2(vgan2_base, cfg):
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_cognitive_step

    lr = cfg.train.learning_rate
    origin = _converted(vgan2_base, cfg, "vae-gan-cognitive")
    assert "teacher_encoder" in origin
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps, clip=1.0)
    state = make_state(origin, {"encoder": opt, "discriminator": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(1, cfg), _images(2)
    rng = jax.random.key(77)
    # mirror make_vgan_cognitive_step's PRNG contract (steps_vgan.py:500-503)
    k_eps, k_t, k_zp = jax.random.split(rng, 3)
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    eps_t = np.asarray(jax.random.normal(k_t, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    step = make_vgan_cognitive_step(cfg, stage=2, mode="vae-gan", donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)}, rng,
        jnp.float32(0.35), jnp.float32(0.68), jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(vgan2_base)
    t32 = _vgan2_oracle(m32, fmri, image, eps, eps_t, z_p, lr)
    m64 = copy.deepcopy(vgan2_base).double()
    _vgan2_oracle(m64, fmri, image, eps, eps_t, z_p, lr)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=_converted(m32, cfg, "vae-gan-cognitive"),
                after64=_converted(m64, cfg, "vae-gan-cognitive"),
                torch32=t32, lr=lr)


def test_vgan2_losses_match(vgan2):
    m, t = vgan2["metrics"], vgan2["torch32"]
    for k in ("loss_encoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_vgan2_updates_match(vgan2):
    """Encoder + discriminator updates (incl. the +-1 grad clamp) match;
    decoder and teacher stay frozen on both sides.

    rel=0.08: unlike stage 1, EVERY image the stage-2 discriminator sees is
    itself computed (gt_x and x_tilde are decoder outputs, vae_gan.py:
    367-377), so cross-framework forward noise (~1e-4 on activations, the
    forward-parity tolerance) enters the adversarial gradient and amplifies
    to a few percent at the early discriminator layers — while the two
    torch oracles share bit-identical forward values and report ~1e-5
    conditioning.  Measured worst case 3.7% of the leaf's largest update
    (spliced==naive to 4e-5, so this is jax-vs-torch forward noise, not a
    backward-schedule difference); structural errors are O(30-200%)."""
    assert_updates_match(vgan2["origin"], vgan2["state"].params,
                         vgan2["after32"], vgan2["after64"], vgan2["lr"],
                         ("encoder", "discriminator"), rel=0.08)
    for grp in ("decoder", "teacher_encoder"):
        o = leafdict(vgan2["origin"][grp]["params"])
        j = leafdict(vgan2["state"].params[grp])
        t = leafdict(vgan2["after32"][grp]["params"])
        for ks in j:
            np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {grp}{ks}")
            np.testing.assert_array_equal(t[ks], o[ks],
                                          err_msg=f"torch {grp}{ks}")


# --------------------------------------------------------------------------
# WAE Stage I (train_wae_stage1.py: two-phase Adam game) — literal schedule
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wae_base():
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(11)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = ref_models.WaeGan(device="cpu", z_size=LATENT)
    with torch.no_grad():
        model.encoder.train()
        model.decoder.train()
        mu, _ = model.encoder(torch.randn(B, 3, 100, 100))
        model.decoder(mu)
        model.eval()
    return model


def _free(module, flag):
    for p in module.parameters():
        p.requires_grad = flag


def _wae1_oracle(model, x, z_fake, lr):
    """The reference's LITERAL two-phase schedule
    (``train_wae_stage1.py:259-311``) — runs unchanged on modern torch
    because each phase builds a fresh graph."""
    import torch

    dt = next(model.parameters()).dtype
    model.train()
    xt = nchw(x).to(dt)
    opt_e = torch.optim.Adam(model.encoder.parameters(), lr=lr,
                             betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(model.decoder.parameters(), lr=lr,
                             betas=(0.5, 0.999))
    opt_disc = torch.optim.Adam(model.discriminator.parameters(), lr=0.5 * lr,
                                betas=(0.5, 0.999))
    for o in (opt_e, opt_d, opt_disc):
        warm_adam(o)
    model.encoder.zero_grad()
    model.decoder.zero_grad()
    model.discriminator.zero_grad()
    # ---- Phase 1: discriminator (:269-288) ----
    _free(model.decoder, False)
    _free(model.encoder, False)
    _free(model.discriminator, True)
    z_real, _ = model.encoder(xt)
    zf = torch.from_numpy(z_fake).to(dt)
    d_real = model.discriminator(z_real)
    d_fake = model.discriminator(zf)
    loss_fake = -10 * torch.sum(torch.log(d_fake + 1e-3))
    loss_real = -10 * torch.sum(torch.log(1 - d_real + 1e-3))
    loss_fake.backward(retain_graph=True)
    loss_real.backward(retain_graph=True)
    opt_disc.step()
    # ---- Phase 2: generator vs updated discriminator (:292-311) ----
    _free(model.encoder, True)
    _free(model.decoder, True)
    _free(model.discriminator, False)
    z_real, _ = model.encoder(xt)
    x_recon = model.decoder(z_real)
    d_real = model.discriminator(z_real)
    loss_reconstruction = torch.sum(torch.sum(0.5 * (x_recon - xt) ** 2, 1))
    loss_penalty = -10 * torch.sum(torch.log(d_real + 1e-3))
    loss_reconstruction.backward(retain_graph=True)
    loss_penalty.backward()
    opt_e.step()
    opt_d.step()
    _free(model.discriminator, True)
    return {"loss_reconstruction": float(loss_reconstruction) / B,
            "loss_penalty": float(loss_penalty) / B,
            "loss_discriminator_fake": float(loss_fake) / B,
            "loss_discriminator_real": float(loss_real) / B}


@pytest.fixture(scope="module")
def wae1(wae_base, cfg):
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import Adam
    from fmri_tpu.train.steps_wae import make_wae_stage1_step

    lr = cfg.train.learning_rate
    origin = _converted(wae_base, cfg, "wae-gan")
    opt = Adam(b1=cfg.train.adam_b1, b2=cfg.train.adam_b2)
    state = make_state(origin, {k: opt for k in origin})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    x = _images(4)
    rng = jax.random.key(13)
    # mirror make_wae_stage1_step's PRNG contract (steps_wae.py:62-63)
    z_fake = np.asarray(
        cfg.train.wae_sigma
        * jax.random.normal(rng, (B, LATENT), jnp.float32))

    step = make_wae_stage1_step(cfg, donate=False)
    new_state, metrics = step.train_step(state, jnp.asarray(x), rng)

    m32 = copy.deepcopy(wae_base)
    t32 = _wae1_oracle(m32, x, z_fake, lr)
    m64 = copy.deepcopy(wae_base).double()
    _wae1_oracle(m64, x, z_fake, lr)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=_converted(m32, cfg, "wae-gan"),
                after64=_converted(m64, cfg, "wae-gan"),
                torch32=t32,
                lr={"encoder": lr, "decoder": lr, "latent_disc": 0.5 * lr})


def test_wae1_losses_match(wae1):
    m, t = wae1["metrics"], wae1["torch32"]
    for k in ("loss_reconstruction", "loss_penalty",
              "loss_discriminator_fake", "loss_discriminator_real"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=1e-4, atol=1e-5)


def test_wae1_updates_match(wae1):
    """Both phases: latent-D Adam step at 0.5x lr, then encoder+decoder vs
    the UPDATED discriminator — post-step params match the literal reference
    schedule on all three groups."""
    assert_updates_match(wae1["origin"], wae1["state"].params,
                         wae1["after32"], wae1["after64"], wae1["lr"],
                         ("encoder", "decoder", "latent_disc"))


def test_wae1_encoder_bn_double_tick_matches(wae1):
    """The reference runs the encoder once per phase (same batch) — two BN
    ticks; the fused step's analytic replay must land on the same stats."""
    j = leafdict(wae1["state"].batch_stats["encoder"])
    t = leafdict(wae1["after32"]["encoder"]["batch_stats"])
    for ks in j:
        np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=ks)


def _wae1_torch_traj(wae_base, cfg, inputs, dtype, losses_out=None):
    """The literal stage-1 WAE schedule (``train_wae_stage1.py:259-311``)
    run for ``len(inputs)`` steps with PERSISTENT optimizers at ``dtype``.
    Returns the final model; per-step loss tensors append to
    ``losses_out`` when given."""
    import torch

    lr = cfg.train.learning_rate
    model = copy.deepcopy(wae_base).to(dtype)
    model.train()
    opt_e = torch.optim.Adam(model.encoder.parameters(), lr=lr,
                             betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(model.decoder.parameters(), lr=lr,
                             betas=(0.5, 0.999))
    opt_disc = torch.optim.Adam(model.discriminator.parameters(),
                                lr=0.5 * lr, betas=(0.5, 0.999))
    for o in (opt_e, opt_d, opt_disc):
        warm_adam(o)

    for x, z_fake in inputs:
        xt = nchw(x).to(dtype)
        model.encoder.zero_grad()
        model.decoder.zero_grad()
        model.discriminator.zero_grad()
        _free(model.decoder, False)
        _free(model.encoder, False)
        _free(model.discriminator, True)
        z_real, _ = model.encoder(xt)
        d_real = model.discriminator(z_real)
        d_fake = model.discriminator(torch.from_numpy(z_fake).to(dtype))
        loss_fake = -10 * torch.sum(torch.log(d_fake + 1e-3))
        loss_real = -10 * torch.sum(torch.log(1 - d_real + 1e-3))
        loss_fake.backward(retain_graph=True)
        loss_real.backward(retain_graph=True)
        opt_disc.step()
        _free(model.encoder, True)
        _free(model.decoder, True)
        _free(model.discriminator, False)
        z_real, _ = model.encoder(xt)
        x_recon = model.decoder(z_real)
        d_real = model.discriminator(z_real)
        loss_rec = torch.sum(torch.sum(0.5 * (x_recon - xt) ** 2, 1))
        loss_pen = -10 * torch.sum(torch.log(d_real + 1e-3))
        loss_rec.backward(retain_graph=True)
        loss_pen.backward()
        opt_e.step()
        opt_d.step()
        if losses_out is not None:
            losses_out.append({"loss_reconstruction": float(loss_rec.detach()),
                               "loss_penalty": float(loss_pen.detach()),
                               "loss_discriminator_fake": float(loss_fake.detach()),
                               "loss_discriminator_real": float(loss_real.detach())})
    return model


def test_wae1_trajectory_losses(wae_base, cfg):
    """20-step stage-1 WAE trajectory from identical weights/noise: the
    two-phase Adam game's four per-step losses track the literal reference
    schedule (``train_wae_stage1.py:259-311``) run with PERSISTENT
    optimizers — Adam moments, bias-correction counters and the BN
    double-tick stay in lock across steps, not just for one update.

    Same widening tolerance schedule as the vgan trajectory (fp32 rounding
    differences compound through the adversarial dynamics): rtol 3e-3 for
    the first 8 steps, +1.5e-3 per further step.

    The trajectory ENDPOINT is anchored too (loss agreement alone would
    miss slow parameter/BN-stat drift inside the loss tolerance): the torch
    schedule runs a second time at fp64, and the JAX step-20 parameters and
    running stats must sit within the fp32 oracle's own trajectory-level
    distance from the fp64 truth (plus the cross-framework forward-noise
    allowance ``rel`` — the two torch runs share bit-identical composition,
    so their mutual distance misses it)."""
    import torch

    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import Adam
    from fmri_tpu.train.steps_wae import make_wae_stage1_step

    lr = cfg.train.learning_rate
    origin = _converted(wae_base, cfg, "wae-gan")
    opt = Adam(b1=cfg.train.adam_b1, b2=cfg.train.adam_b2)
    state = make_state(origin, {k: opt for k in origin})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))
    step = make_wae_stage1_step(cfg, donate=False)

    base = jax.random.key(77)
    inputs, jax_metrics = [], []
    for i in range(TRAJ_STEPS):
        x = _images(300 + i)
        rng = jax.random.fold_in(base, i)
        # mirror make_wae_stage1_step's PRNG contract (steps_wae.py:62-63)
        z_fake = np.asarray(
            cfg.train.wae_sigma
            * jax.random.normal(rng, (B, LATENT), jnp.float32))
        inputs.append((x, z_fake))
        state, m = step.train_step(state, jnp.asarray(x), rng)
        jax_metrics.append(m)

    losses32 = []
    model32 = _wae1_torch_traj(wae_base, cfg, inputs, torch.float32, losses32)
    for i, (m, t) in enumerate(zip(jax_metrics, losses32)):
        rtol = 3e-3 + 1.5e-3 * max(0, i - 7)  # drift widens past step 8
        for key, val in t.items():
            np.testing.assert_allclose(float(m[key]), float(val) / B,
                                       rtol=rtol, atol=1e-4,
                                       err_msg=f"step {i} {key}")

    # endpoint: params + running stats vs the fp64-calibrated torch pair
    model64 = _wae1_torch_traj(wae_base, cfg, inputs, torch.float64)
    t32 = _converted(model32, cfg, "wae-gan")
    t64 = _converted(model64, cfg, "wae-gan")
    lrs = {"encoder": lr, "decoder": lr, "latent_disc": 0.5 * lr}
    assert_updates_match(origin, state.params, t32, t64, lrs,
                         ("encoder", "decoder", "latent_disc"),
                         ratio=5.0, floor=5e-4, rel=0.05)
    assert_updates_match(origin, state.batch_stats, t32, t64, 1.0,
                         ("encoder", "decoder"), key="batch_stats",
                         ratio=5.0, floor=1e-5, rel=0.02)


# --------------------------------------------------------------------------
# WAE Stage II (train_wae_stage2.py: latent alignment) — literal schedule
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wae2_base(wae_base):
    """WaeGanCognitive as the stage-2 trainer assembles it
    (``train_wae_stage2.py:194-201``): cognitive encoder fresh, decoder
    shared with (and frozen by) the stage-1 teacher, fresh WaeDiscriminator
    (ctor N(0, .01) init).  Returns (model, teacher) — the teacher is NOT a
    submodule; the trainer keeps it as a separate train-mode module."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(21)
    teacher = copy.deepcopy(wae_base)
    for p in teacher.decoder.parameters():  # :196-197
        p.requires_grad = False
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cog = ref_models.CognitiveEncoder(input_size=3620, z_size=LATENT)
        with torch.no_grad():
            cog.train()
            cog(torch.randn(B, 3620))
            cog.eval()
        model = ref_models.WaeGanCognitive(
            device="cpu", encoder=cog, decoder=teacher.decoder, z_size=LATENT)
    return model, teacher


def _wae2_oracle(model, teacher, fmri, image):
    """The reference's LITERAL stage-2 schedule
    (``train_wae_stage2.py:275-328``): hard-coded Adam(0.5, 0.999) at enc
    1e-3 / disc 5e-4 (``:237-239``); phase 1 aligns cognitive latents toward
    1 and teacher latents toward 0; phase 2 trains the encoder on mean-MSE +
    mean penalty with the decoder frozen."""
    import torch
    import torch.nn as nn

    dt = next(model.encoder.parameters()).dtype
    model.train()
    teacher.train()  # separate module; default train mode (:194-201)
    xf = torch.from_numpy(fmri).to(dt)
    xi = nchw(image).to(dt)
    opt_e = torch.optim.Adam(model.encoder.parameters(), lr=0.001,
                             betas=(0.5, 0.999))
    opt_disc = torch.optim.Adam(model.discriminator.parameters(), lr=0.0005,
                                betas=(0.5, 0.999))
    warm_adam(opt_e)
    warm_adam(opt_disc)
    _free(model.decoder, False)
    model.encoder.zero_grad()
    model.discriminator.zero_grad()
    z, _ = teacher.encoder(xi)       # :284-285 (metrics path; BN ticks)
    teacher.decoder(z)
    # ---- Phase 1 (:289-307) ----
    _free(model.encoder, False)
    _free(model.discriminator, True)
    z_fake, _ = model.encoder(xf)
    z_real, _ = teacher.encoder(xi)
    d_real = model.discriminator(z_real)
    d_fake = model.discriminator(z_fake)
    loss_fake = -10 * torch.sum(torch.log(d_fake + 1e-3))
    loss_real = -10 * torch.sum(torch.log(1 - d_real + 1e-3))
    loss_fake.backward(retain_graph=True)
    loss_real.backward(retain_graph=True)
    opt_disc.step()
    # ---- Phase 2 (:311-328) ----
    _free(model.encoder, True)
    _free(model.discriminator, False)
    z_real, _ = model.encoder(xf)
    x_recon = model.decoder(z_real)
    d_real = model.discriminator(z_real)
    loss_reconstruction = nn.MSELoss()(x_recon, xi)
    loss_penalty = -10 * torch.mean(torch.log(d_real + 1e-3))
    loss_reconstruction.backward(retain_graph=True)
    loss_penalty.backward()
    opt_e.step()
    _free(model.discriminator, True)
    return {"loss_reconstruction": float(loss_reconstruction),
            "loss_penalty": float(loss_penalty),
            "loss_discriminator_fake": float(loss_fake) / B,
            "loss_discriminator_real": float(loss_real) / B}


@pytest.fixture(scope="module")
def wae2(wae2_base, cfg):
    from fmri_tpu.checkpoints.torch_import import convert_visual_encoder
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import Adam
    from fmri_tpu.train.steps_wae import make_wae_cognitive_step

    model, teacher = wae2_base
    origin = _converted(model, cfg, "wae-gan-cognitive")
    origin["teacher_encoder"] = convert_visual_encoder(
        to_dtype_sd(teacher), cfg, prefix="encoder.")
    opt = Adam(b1=0.5, b2=0.999)
    state = make_state(origin, {"encoder": opt, "latent_disc": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(6, cfg), _images(7)
    step = make_wae_cognitive_step(cfg, stage=2, donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)},
        jax.random.key(0))

    # deepcopy model+teacher TOGETHER: the shared decoder object must stay
    # shared, as in the trainer (model.decoder is trained_model.decoder)
    m32, teach32 = copy.deepcopy((model, teacher))
    t32 = _wae2_oracle(m32, teach32, fmri, image)
    m64, teach64 = copy.deepcopy((model, teacher))
    _wae2_oracle(m64.double(), teach64.double(), fmri, image)
    after32 = _converted(m32, cfg, "wae-gan-cognitive")
    after64 = _converted(m64, cfg, "wae-gan-cognitive")
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=after32, after64=after64, torch32=t32,
                lr={"encoder": 1e-3, "latent_disc": 5e-4})


def test_wae2_losses_match(wae2):
    m, t = wae2["metrics"], wae2["torch32"]
    for k in ("loss_reconstruction", "loss_penalty",
              "loss_discriminator_fake", "loss_discriminator_real"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=1e-4, atol=1e-5)


def test_wae2_updates_match(wae2):
    """Cognitive encoder + latent-D updates match (hard-coded lrs); the
    shared decoder stays frozen on both sides."""
    assert_updates_match(wae2["origin"], wae2["state"].params,
                         wae2["after32"], wae2["after64"], wae2["lr"],
                         ("encoder", "latent_disc"))
    o = leafdict(wae2["origin"]["decoder"]["params"])
    j = leafdict(wae2["state"].params["decoder"])
    t = leafdict(wae2["after32"]["decoder"]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
        np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")


# --------------------------------------------------------------------------
# Trajectory: 20 steps of stage-1 VAE/GAN with the REAL equilibrium game
# --------------------------------------------------------------------------

TRAJ_STEPS = 20


def _vgan1_torch_traj(vgan_base, cfg, inputs, dtype, margin, equilibrium,
                      records=None, gate_schedule=None):
    """The reference's gated stage-1 schedule (``train_vgan_stage1.py:
    316-432``, historical semantics) run for ``len(inputs)`` steps with
    PERSISTENT RMSprop optimizers at ``dtype``.  Appends per-step records
    (losses, bce means, gates) to ``records`` when given.  When
    ``gate_schedule`` is given, the recorded (train_dec, train_dis)
    decisions replay instead of re-deriving them — used by the fp64
    calibration run so the discrete path is shared with fp32 (a knife-edge
    gate flip is a legitimate precision effect that would otherwise poison
    the conditioning yardstick)."""
    import torch

    lr = cfg.train.learning_rate
    model = copy.deepcopy(vgan_base).to(dtype)
    model.train()
    opts = {}
    for name in ("encoder", "decoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o

    for i, (x, eps, z_p) in enumerate(inputs):
        xt = nchw(x).to(dtype)
        mus, lv = model.encoder(xt)
        z = torch.from_numpy(eps).to(dtype) * (0.5 * lv).exp() + mus
        x_tilde = model.decoder(z)
        x_p = model.decoder(torch.from_numpy(z_p).to(dtype))
        disc_layer = model.discriminator(xt, x_tilde, x_p, "REC")
        disc_class = model.discriminator(xt, x_tilde, x_p, "GAN")
        _, kld, mse, bo, bp, bs = type(model).loss(
            xt, x_tilde, disc_layer[:B], disc_layer[B:2 * B],
            disc_layer[2 * B:], disc_class[:B], disc_class[B:2 * B],
            disc_class[2 * B:], mus, lv)
        loss_encoder = torch.sum(kld) + torch.sum(mse)
        loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
        loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                        - (1.0 - LAMBDA_MSE) * loss_discriminator)
        if gate_schedule is not None:
            train_dec, train_dis = gate_schedule[i]
        else:
            train_dec = train_dis = True
            mbo, mbp = float(bo.detach().mean()), float(bp.detach().mean())
            if mbo < equilibrium - margin or mbp < equilibrium - margin:
                train_dis = False
            if mbo > equilibrium + margin or mbp > equilibrium + margin:
                train_dec = False
            if not train_dec and not train_dis:
                train_dec = train_dis = True
        if records is not None:
            records.append({"loss_encoder": float(loss_encoder.detach()),
                            "loss_discriminator":
                                float(loss_discriminator.detach()),
                            "bce_means": (float(bo.detach().mean()),
                                          float(bp.detach().mean())),
                            "gates": (train_dec, train_dis)})

        ps, gs = group_grads(loss_encoder, model.encoder)
        apply_grads(opts["encoder"], ps, gs)
        if train_dec:
            ps, gs = group_grads(loss_decoder, model.decoder)
            apply_grads(opts["decoder"], ps, gs)
        if train_dis:
            ps, gs = group_grads(loss_discriminator, model.discriminator,
                                 retain_graph=False)
            apply_grads(opts["discriminator"], ps, gs)
        else:
            model.discriminator.zero_grad()
    return model


def test_vgan1_trajectory_losses_and_gates(vgan_base, cfg):
    """20-step trajectory from identical weights/noise with the reference's
    real margin/equilibrium (0.35/0.68, ``gan_config.py:36-40``): per-step
    head losses agree and the equilibrium gate fires identically (gates are
    compared only when torch's threshold distance exceeds 1e-3 — a knife-edge
    decision is legitimately precision-dependent).

    Tolerance schedule: the two frameworks' fp32 rounding differences
    compound through the adversarial dynamics, so the loss comparison widens
    with depth — rtol 3e-3 for the first 8 steps (single-step conditioning,
    matching the one-step oracles) then +1.5e-3 per further step
    (empirically ~2x the observed drift envelope at step 20).

    The ENDPOINT is anchored like the WAE trajectory: a second torch run at
    fp64 (replaying the fp32 gate schedule — see ``_vgan1_torch_traj``)
    calibrates the reachable trajectory precision, and the JAX step-20
    parameters and encoder/decoder running stats must land within it.  The
    discriminator's running stats are excluded by design: the fused pass
    ticks its conv BNs once where the reference's REC+GAN double call ticks
    twice — the delta is pinned exactly (single-step) by
    ``test_vgan1_disc_bn_ema_single_vs_double_tick`` and running stats do
    not feed the train-mode forward, so the trajectory is unaffected."""
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_stage1_step

    import torch

    lr = cfg.train.learning_rate
    margin, equilibrium = 0.35, 0.68
    origin = _converted(vgan_base, cfg, "vae-gan")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps)
    state = make_state(origin, {k: opt for k in origin})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))
    step = make_vgan_stage1_step(cfg, mode="vae-gan", donate=False)

    base = jax.random.key(99)
    inputs, jax_metrics = [], []
    for i in range(TRAJ_STEPS):
        x = _images(100 + i)
        rng = jax.random.fold_in(base, i)
        k_eps, k_zp = jax.random.split(rng)
        eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
        z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))
        inputs.append((x, eps, z_p))
        state, m = step.train_step(
            state, jnp.asarray(x), rng, jnp.float32(margin),
            jnp.float32(equilibrium), jnp.float32(LAMBDA_MSE))
        jax_metrics.append(m)

    recs32 = []
    model32 = _vgan1_torch_traj(vgan_base, cfg, inputs, torch.float32,
                                margin, equilibrium, records=recs32)
    n_gates_checked = 0
    for i, (m, t) in enumerate(zip(jax_metrics, recs32)):
        rtol = 3e-3 + 1.5e-3 * max(0, i - 7)  # drift widens past step 8
        np.testing.assert_allclose(float(m["loss_encoder"]),
                                   float(t["loss_encoder"]) / B, rtol=rtol,
                                   err_msg=f"step {i}")
        np.testing.assert_allclose(float(m["loss_discriminator"]),
                                   float(t["loss_discriminator"]) / B,
                                   rtol=rtol, err_msg=f"step {i}")
        mbo, mbp = t["bce_means"]
        edge = min(abs(mbo - (equilibrium - margin)),
                   abs(mbp - (equilibrium - margin)),
                   abs(mbo - (equilibrium + margin)),
                   abs(mbp - (equilibrium + margin)))
        if edge > 1e-3:
            train_dec, train_dis = t["gates"]
            assert float(m["train_dec"]) == float(train_dec), f"step {i}"
            assert float(m["train_dis"]) == float(train_dis), f"step {i}"
            n_gates_checked += 1
    assert n_gates_checked >= TRAJ_STEPS - 4  # the gate comparison ran

    # endpoint: params + running stats vs the fp64-calibrated torch pair
    model64 = _vgan1_torch_traj(vgan_base, cfg, inputs, torch.float64,
                                margin, equilibrium,
                                gate_schedule=[t["gates"] for t in recs32])
    t32 = _converted(model32, cfg, "vae-gan")
    t64 = _converted(model64, cfg, "vae-gan")
    assert_updates_match(origin, state.params, t32, t64, lr,
                         ("encoder", "decoder", "discriminator"),
                         ratio=5.0, floor=5e-4, rel=0.05)
    assert_updates_match(origin, state.batch_stats, t32, t64, 1.0,
                         ("encoder", "decoder"), key="batch_stats",
                         ratio=5.0, floor=1e-5, rel=0.02)


# --------------------------------------------------------------------------
# VAE/GAN Stage III (train_vgan_stage3.py: decoder fine-tune, frozen encoder)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vgan3_base(vgan_base):
    """VaeGanCognitive assembled as the stage-3 trainer does
    (``train_vgan_stage3.py:222-245``): cognitive encoder (frozen), fresh
    decoder (``size=256``) + discriminator (stage-2-checkpoint-loaded in the
    trainer; seeded fresh here), ``teacher_net`` present but inert — the
    distillation branch requires ``stage == 2`` (``vae_gan.py:367``) — and
    ctor-default ``mode='vae'`` (the loss blocks use args.mode='vae-gan')."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(31)
    teacher = copy.deepcopy(vgan_base)
    for p in teacher.parameters():  # :225-227
        p.requires_grad = False
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cog = ref_models.CognitiveEncoder(input_size=3620, z_size=LATENT)
        dec = ref_models.Decoder(z_size=LATENT, size=256)  # :230
        disc = ref_models.Discriminator()  # :231
    with torch.no_grad():
        for m in (cog, dec, disc):
            m.train()
        for _ in range(2):  # tick BN running stats with real forwards
            mus, _lv = cog(torch.randn(B, 3620))
            xt = dec(mus)
            xp = dec(torch.randn(B, LATENT))
            disc(torch.randn(B, 3, 100, 100), xt, xp, "REC")
        for m in (cog, dec, disc):
            m.eval()
    model = ref_models.VaeGanCognitive(
        device="cpu", encoder=cog, decoder=dec, discriminator=disc,
        teacher_net=teacher, z_size=LATENT, stage=3)
    for p in model.encoder.parameters():  # :244-245
        p.requires_grad = False
    return model


def _vgan3_oracle(model, fmri, image, eps, z_p, lr, margin, equilibrium,
                  lam):
    """Stage-3 per-batch schedule (``train_vgan_stage3.py:320-410``):
    forward = the mode-'vae' branch with NO distillation (gt_x = raw image);
    decoder + discriminator train under the REAL equilibrium gate with
    elementwise grad clamp +-1 (``:401-403,408-410``); encoder frozen.
    Per-group grads at original weights = the historical retained-graph
    semantics (see the stage-1 oracles)."""
    import torch

    dt = next(model.decoder.parameters()).dtype
    model.train()
    xf = torch.from_numpy(fmri).to(dt)
    gt = nchw(image).to(dt)
    opts = {}
    for name in ("decoder", "discriminator"):  # :287-292 (RMSprop alpha .9)
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    for p in model.encoder.parameters():  # :329-331
        p.requires_grad = False
    mus, lv = model.encoder(xf)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(gt, x_tilde, x_p, "REC")
    disc_class = model.discriminator(gt, x_tilde, x_p, "GAN")
    _nle, kld, mse, bo, bp, bs = type(model).loss(
        gt, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    loss_encoder = torch.sum(kld) + torch.sum(mse)  # logged only (:365)
    loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
    loss_decoder = torch.sum(lam * mse) - (1.0 - lam) * loss_discriminator
    train_dec = train_dis = True  # :382-389 (args.mode='vae-gan' default)
    mbo, mbp = float(bo.mean()), float(bp.mean())
    if mbo < equilibrium - margin or mbp < equilibrium - margin:
        train_dis = False
    if mbo > equilibrium + margin or mbp > equilibrium + margin:
        train_dec = False
    if not train_dec and not train_dis:
        train_dec = train_dis = True
    if train_dec:  # :400-405
        ps, gs = group_grads(loss_decoder, model.decoder)
        apply_grads(opts["decoder"], ps, gs, clamp=1.0)
    if train_dis:  # :407-411
        ps, gs = group_grads(loss_discriminator, model.discriminator,
                             retain_graph=False)
        apply_grads(opts["discriminator"], ps, gs, clamp=1.0)
    return {"loss_encoder": float(loss_encoder) / B,
            "loss_decoder": float(loss_decoder) / B,
            "loss_discriminator": float(loss_discriminator) / B,
            "train_dec": float(train_dec), "train_dis": float(train_dis)}


@pytest.fixture(scope="module")
def vgan3(vgan3_base, cfg):
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_cognitive_step

    lr = cfg.train.learning_rate
    margin, equilibrium = 0.35, 0.68
    origin = _converted(vgan3_base, cfg, "vae-gan-cognitive")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps, clip=1.0)
    state = make_state(origin, {"decoder": opt, "discriminator": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(8, cfg), _images(9)
    rng = jax.random.key(55)
    # PRNG contract (steps_vgan.py:500-503); eps_t is drawn but unused at
    # stage 3 (no distillation).
    k_eps, _k_t, k_zp = jax.random.split(rng, 3)
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    step = make_vgan_cognitive_step(cfg, stage=3, mode="vae-gan", donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)}, rng,
        jnp.float32(margin), jnp.float32(equilibrium), jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(vgan3_base)
    t32 = _vgan3_oracle(m32, fmri, image, eps, z_p, lr, margin, equilibrium,
                        LAMBDA_MSE)
    m64 = copy.deepcopy(vgan3_base).double()
    t64 = _vgan3_oracle(m64, fmri, image, eps, z_p, lr, margin, equilibrium,
                        LAMBDA_MSE)
    assert (t32["train_dec"], t32["train_dis"]) == (
        t64["train_dec"], t64["train_dis"])  # seed away from the knife edge
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=_converted(m32, cfg, "vae-gan-cognitive"),
                after64=_converted(m64, cfg, "vae-gan-cognitive"),
                torch32=t32, lr=lr)


def test_vgan3_losses_match(vgan3):
    m, t = vgan3["metrics"], vgan3["torch32"]
    for k in ("loss_encoder", "loss_decoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_vgan3_gates_match(vgan3):
    m, t = vgan3["metrics"], vgan3["torch32"]
    assert float(m["train_dec"]) == t["train_dec"]
    assert float(m["train_dis"]) == t["train_dis"]


def test_vgan3_updates_match(vgan3):
    """Decoder + discriminator updates (gate + clamp +-1) match; encoder and
    teacher stay frozen on both sides.

    rel=0.08 for the same reason as stage 2: x_tilde and x_p are computed
    through the decoder stack, so cross-framework forward noise enters the
    adversarial gradients (see ``assert_updates_match``)."""
    assert_updates_match(vgan3["origin"], vgan3["state"].params,
                         vgan3["after32"], vgan3["after64"], vgan3["lr"],
                         ("decoder", "discriminator"), rel=0.08)
    for grp in ("encoder", "teacher_encoder"):
        o = leafdict(vgan3["origin"][grp]["params"])
        j = leafdict(vgan3["state"].params[grp])
        t = leafdict(vgan3["after32"][grp]["params"])
        for ks in j:
            np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
            np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")


# --------------------------------------------------------------------------
# WAE Stage III (train_wae_stage3.py: decoder recon fine-tune) — literal
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wae3_base(wae_base):
    """Stage-3 assembly (``train_wae_stage3.py:208-245``): teacher WaeGan
    from stage 1 (only its encoder is used; the module stays in ctor-default
    train mode), model = WaeGanCognitive with the stage-2 cognitive encoder
    (frozen per batch, ``:298``) and its OWN decoder — loaded from the
    stage-2 checkpoint, a SEPARATE module from the teacher's decoder, unlike
    stage 2's shared object — plus the ctor-fresh WaeDiscriminator."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(41)
    teacher = copy.deepcopy(wae_base)
    for p in teacher.encoder.parameters():  # :210-211
        p.requires_grad = False
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cog = ref_models.CognitiveEncoder(input_size=3620, z_size=LATENT)
        with torch.no_grad():
            cog.train()
            cog(torch.randn(B, 3620))
            cog.eval()
        # stage-2 froze the decoder, so its weights equal the stage-1
        # teacher's at stage-3 start — but as a distinct module
        dec = copy.deepcopy(wae_base.decoder)
        model = ref_models.WaeGanCognitive(
            device="cpu", encoder=cog, decoder=dec, z_size=LATENT)
    return model, teacher


def _wae3_oracle(model, teacher, fmri, image):
    """The reference's LITERAL stage-3 schedule
    (``train_wae_stage3.py:296-347``): phase 1 trains the latent D (teacher
    latents toward 0, cognitive latents toward 1); phase 2 trains the
    DECODER on plain mean-MSE reconstruction — the penalty backward is
    commented out (``:344``) — with the encoder frozen throughout.
    Hard-coded Adam(0.5, 0.999) at dec 1e-3 / disc 5e-4 (``:258-260``)."""
    import torch
    import torch.nn as nn

    dt = next(model.decoder.parameters()).dtype
    model.train()  # :297
    teacher.train()  # never toggled by the trainer; ctor default
    xf = torch.from_numpy(fmri).to(dt)
    xi = nchw(image).to(dt)
    opt_d = torch.optim.Adam(model.decoder.parameters(), lr=0.001,
                             betas=(0.5, 0.999))
    opt_disc = torch.optim.Adam(model.discriminator.parameters(), lr=0.0005,
                                betas=(0.5, 0.999))
    warm_adam(opt_d)
    warm_adam(opt_disc)
    _free(model.encoder, False)  # frozen_params(model.encoder) :298
    model.decoder.zero_grad()
    model.discriminator.zero_grad()
    # ---- Phase 1 (:306-326) ----
    _free(model.decoder, False)
    _free(model.discriminator, True)
    z_fake, _ = model.encoder(xf)
    z_real, _ = teacher.encoder(xi)
    d_real = model.discriminator(z_real)
    d_fake = model.discriminator(z_fake)
    loss_fake = -10 * torch.sum(torch.log(d_fake + 1e-3))
    loss_real = -10 * torch.sum(torch.log(1 - d_real + 1e-3))
    loss_fake.backward(retain_graph=True)
    loss_real.backward(retain_graph=True)
    opt_disc.step()
    # ---- Phase 2 (:328-347) ----
    _free(model.decoder, True)
    _free(model.discriminator, False)
    z_real, _ = model.encoder(xf)
    x_recon = model.decoder(z_real)
    d_real = model.discriminator(z_real)
    loss_reconstruction = nn.MSELoss()(x_recon, xi)
    loss_penalty = -10 * torch.mean(torch.log(d_real + 1e-3))
    loss_reconstruction.backward(retain_graph=True)
    opt_d.step()
    _free(model.discriminator, True)
    return {"loss_reconstruction": float(loss_reconstruction),
            "loss_penalty": float(loss_penalty),
            "loss_discriminator_fake": float(loss_fake) / B,
            "loss_discriminator_real": float(loss_real) / B}


@pytest.fixture(scope="module")
def wae3(wae3_base, cfg):
    from fmri_tpu.checkpoints.torch_import import convert_visual_encoder
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import Adam
    from fmri_tpu.train.steps_wae import make_wae_cognitive_step

    model, teacher = wae3_base
    origin = _converted(model, cfg, "wae-gan-cognitive")
    origin["teacher_encoder"] = convert_visual_encoder(
        to_dtype_sd(teacher), cfg, prefix="encoder.")
    opt = Adam(b1=0.5, b2=0.999)
    state = make_state(origin, {"decoder": opt, "latent_disc": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(14, cfg), _images(15)
    step = make_wae_cognitive_step(cfg, stage=3, donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)},
        jax.random.key(0))

    m32, teach32 = copy.deepcopy((model, teacher))
    t32 = _wae3_oracle(m32, teach32, fmri, image)
    m64, teach64 = copy.deepcopy((model, teacher))
    _wae3_oracle(m64.double(), teach64.double(), fmri, image)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=_converted(m32, cfg, "wae-gan-cognitive"),
                after64=_converted(m64, cfg, "wae-gan-cognitive"),
                torch32=t32, lr={"decoder": 1e-3, "latent_disc": 5e-4})


def test_wae3_losses_match(wae3):
    m, t = wae3["metrics"], wae3["torch32"]
    for k in ("loss_reconstruction", "loss_penalty",
              "loss_discriminator_fake", "loss_discriminator_real"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=1e-4, atol=1e-5)


def test_wae3_updates_match(wae3):
    """Decoder (pure-MSE phase 2) + latent-D updates match the literal
    schedule; the cognitive encoder stays frozen on both sides."""
    assert_updates_match(wae3["origin"], wae3["state"].params,
                         wae3["after32"], wae3["after64"], wae3["lr"],
                         ("decoder", "latent_disc"))
    o = leafdict(wae3["origin"]["encoder"]["params"])
    j = leafdict(wae3["state"].params["encoder"])
    t = leafdict(wae3["after32"]["encoder"]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
        np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")


def test_wae3_decoder_bn_single_tick_matches(wae3):
    """The reference's stage-3 batch loop decodes ONLY x_recon (no per-batch
    teacher/gt decode, unlike stage 2) — one decoder BN tick per step.  The
    fused step must land on the same running stats (this pins the stage-3
    BN-base fix in ``steps_wae.py``)."""
    j = leafdict(wae3["state"].batch_stats["decoder"])
    t = leafdict(wae3["after32"]["decoder"]["batch_stats"])
    for ks in j:
        np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=str(ks))


# --------------------------------------------------------------------------
# Trajectories: stage-2 distillation (vgan) and latent alignment (wae)
# --------------------------------------------------------------------------

TRAJ2_STEPS = 12  # stage-2 oracles are ~3x a stage-1 step (3 decodes +
#                   teacher + 3-way disc at res100); drift that the endpoint
#                   anchor hunts compounds per step, so 12 already separates
#                   structural errors (O(30-200%)) from fp32 conditioning


def _vgan2_torch_traj(vgan2_base, cfg, inputs, dtype, records=None):
    """The reference's stage-2 per-batch schedule
    (``train_vgan_stage2.py:321-407``) for ``len(inputs)`` steps with
    PERSISTENT RMSprop optimizers (clamp +-1) at ``dtype``; decoder and
    teacher frozen throughout (``:221-222,328-329``)."""
    import torch

    lr = cfg.train.learning_rate
    model = copy.deepcopy(vgan2_base).to(dtype)
    model.train()
    opts = {}
    for name in ("encoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    for p in model.teacher_net.encoder.parameters():  # vae_gan.py:369-370
        p.requires_grad = False

    for fmri, image, eps, eps_t, z_p in inputs:
        xf = torch.from_numpy(fmri).to(dtype)
        gt = nchw(image).to(dtype)
        mus, lv = model.encoder(xf)
        z = torch.from_numpy(eps).to(dtype) * (0.5 * lv).exp() + mus
        x_tilde = model.decoder(z)
        mu_t, lv_t = model.teacher_net.encoder(gt)
        z_t = torch.from_numpy(eps_t).to(dtype) * (0.5 * lv_t).exp() + mu_t
        gt_x = model.decoder(z_t)
        x_p = model.decoder(torch.from_numpy(z_p).to(dtype))
        disc_layer = model.discriminator(gt_x, x_tilde, x_p, "REC")
        disc_class = model.discriminator(gt_x, x_tilde, x_p, "GAN")
        _, kld, mse, bo, bp, bs = type(model).loss(
            gt_x, x_tilde, disc_layer[:B], disc_layer[B:2 * B],
            disc_layer[2 * B:], disc_class[:B], disc_class[B:2 * B],
            disc_class[2 * B:], mus, lv)
        loss_encoder = torch.sum(kld) + torch.sum(mse)
        loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
        if records is not None:
            records.append({"loss_encoder": float(loss_encoder.detach()),
                            "loss_discriminator":
                                float(loss_discriminator.detach())})
        ps, gs = group_grads(loss_encoder, model.encoder)
        apply_grads(opts["encoder"], ps, gs, clamp=1.0)  # :389-393
        ps, gs = group_grads(loss_discriminator, model.discriminator,
                             retain_graph=False)
        apply_grads(opts["discriminator"], ps, gs, clamp=1.0)  # :404-407
    return model


def test_vgan2_trajectory(vgan2_base, cfg):
    """12-step stage-2 distillation trajectory from identical weights/noise:
    per-step encoder/discriminator losses track the literal clamp-+-1
    RMSprop schedule with persistent moments, and the ENDPOINT parameters
    and running stats land within the fp64-calibrated torch pair (plus the
    ``rel`` forward-noise allowance — stage 2's discriminator sees only
    COMPUTED images, see ``test_vgan2_updates_match``).

    Endpoint stats cover encoder, decoder AND teacher_encoder (each ticks
    1:1 with the reference: cog once, decoder three times, teacher once per
    step); the discriminator's conv-BN double-tick delta is pinned
    single-step by ``test_vgan1_disc_bn_ema_single_vs_double_tick``."""
    import torch

    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_cognitive_step

    lr = cfg.train.learning_rate
    origin = _converted(vgan2_base, cfg, "vae-gan-cognitive")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps, clip=1.0)
    state = make_state(origin, {"encoder": opt, "discriminator": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))
    step = make_vgan_cognitive_step(cfg, stage=2, mode="vae-gan",
                                    donate=False)

    base = jax.random.key(55)
    inputs, jax_metrics = [], []
    for i in range(TRAJ2_STEPS):
        fmri, image = _fmri(600 + i, cfg), _images(700 + i)
        rng = jax.random.fold_in(base, i)
        # mirror make_vgan_cognitive_step's PRNG contract (steps_vgan.py)
        k_eps, k_t, k_zp = jax.random.split(rng, 3)
        eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
        eps_t = np.asarray(jax.random.normal(k_t, (B, LATENT), jnp.float32))
        z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))
        inputs.append((fmri, image, eps, eps_t, z_p))
        state, m = step.train_step(
            state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)},
            rng, jnp.float32(0.35), jnp.float32(0.68),
            jnp.float32(LAMBDA_MSE))
        jax_metrics.append(m)

    recs32 = []
    model32 = _vgan2_torch_traj(vgan2_base, cfg, inputs, torch.float32,
                                records=recs32)
    for i, (m, t) in enumerate(zip(jax_metrics, recs32)):
        rtol = 3e-3 + 1.5e-3 * max(0, i - 7)
        for k in ("loss_encoder", "loss_discriminator"):
            np.testing.assert_allclose(float(m[k]), t[k] / B, rtol=rtol,
                                       atol=1e-4, err_msg=f"step {i} {k}")

    model64 = _vgan2_torch_traj(vgan2_base, cfg, inputs, torch.float64)
    t32 = _converted(model32, cfg, "vae-gan-cognitive")
    t64 = _converted(model64, cfg, "vae-gan-cognitive")
    assert_updates_match(origin, state.params, t32, t64, lr,
                         ("encoder", "discriminator"),
                         ratio=5.0, floor=5e-4, rel=0.12)
    for grp in ("decoder", "teacher_encoder"):  # frozen on both sides
        o = leafdict(origin[grp]["params"])
        j = leafdict(state.params[grp])
        t = leafdict(t32[grp]["params"])
        for ks in j:
            np.testing.assert_array_equal(j[ks], o[ks],
                                          err_msg=f"jax {grp}{ks}")
            np.testing.assert_array_equal(t[ks], o[ks],
                                          err_msg=f"torch {grp}{ks}")
    assert_updates_match(origin, state.batch_stats, t32, t64, 1.0,
                         ("encoder", "decoder", "teacher_encoder"),
                         key="batch_stats", ratio=5.0, floor=1e-5, rel=0.02)


def _wae2_torch_traj(wae2_base, cfg, inputs, dtype, records=None):
    """The reference's LITERAL stage-2 WAE schedule
    (``train_wae_stage2.py:275-328``) for ``len(inputs)`` steps with
    PERSISTENT hard-coded Adam optimizers at ``dtype``.  The metrics-path
    teacher forward+decode (``:282-285``) runs per batch as the reference
    does — it ticks the SHARED decoder's BN, which phase 2 then builds on."""
    import torch
    import torch.nn as nn

    model, teacher = copy.deepcopy(wae2_base)
    model, teacher = model.to(dtype), teacher.to(dtype)
    model.train()
    teacher.train()
    opt_e = torch.optim.Adam(model.encoder.parameters(), lr=0.001,
                             betas=(0.5, 0.999))
    opt_disc = torch.optim.Adam(model.discriminator.parameters(), lr=0.0005,
                                betas=(0.5, 0.999))
    warm_adam(opt_e)
    warm_adam(opt_disc)
    _free(model.decoder, False)

    for fmri, image in inputs:
        xf = torch.from_numpy(fmri).to(dtype)
        xi = nchw(image).to(dtype)
        model.encoder.zero_grad()
        model.discriminator.zero_grad()
        z, _ = teacher.encoder(xi)       # :284-285 (metrics path; BN ticks)
        teacher.decoder(z)
        # ---- Phase 1 (:289-307) ----
        _free(model.encoder, False)
        _free(model.discriminator, True)
        z_fake, _ = model.encoder(xf)
        z_real, _ = teacher.encoder(xi)
        d_real = model.discriminator(z_real)
        d_fake = model.discriminator(z_fake)
        loss_fake = -10 * torch.sum(torch.log(d_fake + 1e-3))
        loss_real = -10 * torch.sum(torch.log(1 - d_real + 1e-3))
        loss_fake.backward(retain_graph=True)
        loss_real.backward(retain_graph=True)
        opt_disc.step()
        # ---- Phase 2 (:311-328) ----
        _free(model.encoder, True)
        _free(model.discriminator, False)
        z_real, _ = model.encoder(xf)
        x_recon = model.decoder(z_real)
        d_real = model.discriminator(z_real)
        loss_reconstruction = nn.MSELoss()(x_recon, xi)
        loss_penalty = -10 * torch.mean(torch.log(d_real + 1e-3))
        loss_reconstruction.backward(retain_graph=True)
        loss_penalty.backward()
        opt_e.step()
        _free(model.discriminator, True)
        if records is not None:
            records.append({
                "loss_reconstruction": float(loss_reconstruction.detach()),
                "loss_penalty": float(loss_penalty.detach()),
                "loss_discriminator_fake": float(loss_fake.detach()) / B,
                "loss_discriminator_real": float(loss_real.detach()) / B})
    return model, teacher


def test_wae2_trajectory(wae2_base, cfg):
    """12-step stage-2 WAE latent-alignment trajectory: per-step losses
    track the literal hard-coded-Adam schedule with persistent moments, and
    the ENDPOINT parameters and running stats land within the
    fp64-calibrated torch pair.

    Endpoint stats cover the cognitive encoder (double tick, replayed in
    the fused step) and the shared decoder (metrics-path + phase-2 decode =
    two ticks per step, threaded 1:1).  The teacher encoder is EXCLUDED by
    design: the reference forwards it twice per batch (metrics path :284,
    phase 1 :292) where the fused step computes the identical latents once
    — teacher running stats tick at half rate, and they are never consumed
    (the teacher has no eval-mode use in stage 2/3)."""
    import torch

    from fmri_tpu.checkpoints.torch_import import convert_visual_encoder
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import Adam
    from fmri_tpu.train.steps_wae import make_wae_cognitive_step

    model, teacher = wae2_base
    origin = _converted(model, cfg, "wae-gan-cognitive")
    origin["teacher_encoder"] = convert_visual_encoder(
        to_dtype_sd(teacher), cfg, prefix="encoder.")
    opt = Adam(b1=0.5, b2=0.999)
    state = make_state(origin, {"encoder": opt, "latent_disc": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))
    step = make_wae_cognitive_step(cfg, stage=2, donate=False)

    base = jax.random.key(33)
    inputs, jax_metrics = [], []
    for i in range(TRAJ2_STEPS):
        fmri, image = _fmri(800 + i, cfg), _images(900 + i)
        inputs.append((fmri, image))
        state, m = step.train_step(
            state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)},
            jax.random.fold_in(base, i))
        jax_metrics.append(m)

    recs32 = []
    model32, teacher32 = _wae2_torch_traj(wae2_base, cfg, inputs,
                                          torch.float32, records=recs32)
    for i, (m, t) in enumerate(zip(jax_metrics, recs32)):
        rtol = 3e-3 + 1.5e-3 * max(0, i - 7)
        for k, val in t.items():
            np.testing.assert_allclose(float(m[k]), val, rtol=rtol,
                                       atol=1e-4, err_msg=f"step {i} {k}")

    model64, _teacher64 = _wae2_torch_traj(wae2_base, cfg, inputs,
                                           torch.float64)
    t32 = _converted(model32, cfg, "wae-gan-cognitive")
    t64 = _converted(model64, cfg, "wae-gan-cognitive")
    lrs = {"encoder": 1e-3, "latent_disc": 5e-4}
    assert_updates_match(origin, state.params, t32, t64, lrs,
                         ("encoder", "latent_disc"),
                         ratio=5.0, floor=5e-4, rel=0.05)
    o = leafdict(origin["decoder"]["params"])  # frozen on both sides
    j = leafdict(state.params["decoder"])
    t = leafdict(t32["decoder"]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
        np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")
    assert_updates_match(origin, state.batch_stats, t32, t64, 1.0,
                         ("encoder", "decoder"), key="batch_stats",
                         ratio=5.0, floor=1e-5, rel=0.02)


# --------------------------------------------------------------------------
# WAE/Dual-GAN Stage I (wae_vgan_stage1.py) — the 7th trainer family
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def waevgan_base(vgan_base):
    """VaeGan + the WaeGan whose latent discriminator the trainer borrows
    (``wae_vgan_stage1.py:199-200``).  The WaeGan ctor re-inits ALL modules
    with the uniform scheme (``vae_gan.py:452-464``), overriding the
    WaeDiscriminator's own N(0, .01) — which is why the fused step uses
    ``init_scheme='uniform'`` for this family."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(13)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wae = ref_models.WaeGan(device="cpu", z_size=LATENT)
    return copy.deepcopy(vgan_base), wae


def _waevgan_oracle(model, wae, x, eps, z_p, z_fake, lr, lam=1.0):
    """The reference's per-batch WAE/Dual-GAN schedule
    (``wae_vgan_stage1.py:290-441``), historical semantics, both gates on:

      1. main VAE/GAN forward + head losses (``:290-332``);
      2. latent-D phase: SECOND encoder forward, z_fake ~ N(0, .5²), both
         log-losses, wae-D RMSprop step (``:378-397``);
      3. penalty phase: THIRD encoder forward, x_recon decode (BN tick only —
         the reconstruction loss is commented out, ``:409-412``), penalty vs
         the UPDATED wae-D; grads accumulate into the ENCODER's `.grad`
         (``:401-414``); ``optimizer_decoder.step()`` fires with torch-1.4
         zero grads — a pure RMSprop moment-decay tick (``:417``);
      4. encoder step on loss_encoder grads + the accumulated penalty grads
         (``:421-427``), then decoder (``:430-435``) and image-D
         (``:437-441``).
    """
    import torch

    dt = next(model.parameters()).dtype
    model.train()
    wae.train()
    xt = nchw(x).to(dt)
    opts = {}
    for name in ("encoder", "decoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    opt_wdisc = torch.optim.RMSprop(wae.discriminator.parameters(), lr=lr,
                                    alpha=0.9, eps=1e-8, weight_decay=0,
                                    momentum=0, centered=False)
    warm_rmsprop(opt_wdisc)

    # 1. main VAE/GAN forward (vae_gan.py:271-287, noise injected)
    mus, lv = model.encoder(xt)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(xt, x_tilde, x_p, "REC")
    disc_class = model.discriminator(xt, x_tilde, x_p, "GAN")
    _, kld, mse, bo, bp, bs = type(model).loss(
        xt, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    loss_encoder = torch.sum(kld) + torch.sum(mse)
    loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
    loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                    - (1.0 - LAMBDA_MSE) * loss_discriminator)
    # Main-graph gradients taken up front (all at original weights — the
    # historical semantics; modern torch's version counters reject taking
    # them after any optimizer step touches a graph parameter):
    enc_ps, enc_gs = group_grads(loss_encoder, model.encoder)
    dec_ps, dec_gs = group_grads(loss_decoder, model.decoder)
    dis_ps, dis_gs = group_grads(loss_discriminator, model.discriminator,
                                 retain_graph=False)

    # 2. latent-D phase (:378-397)
    z_real, _ = model.encoder(xt)
    d_real = wae.discriminator(z_real)
    d_fake = wae.discriminator(torch.from_numpy(z_fake).to(dt))
    loss_fake = -lam * torch.sum(torch.log(d_fake + 1e-3))
    loss_real = -lam * torch.sum(torch.log(1 - d_real + 1e-3))
    ps, gs = group_grads(loss_fake + loss_real, wae.discriminator,
                         retain_graph=False)
    apply_grads(opt_wdisc, ps, gs)

    # 3. penalty phase vs the UPDATED wae-D (:401-417)
    z_real2, _ = model.encoder(xt)
    model.decoder(z_real2)  # x_recon: BN tick only, loss commented out :409
    d_real2 = wae.discriminator(z_real2)
    loss_penalty = -lam * torch.sum(torch.log(d_real2 + 1e-3))
    # the penalty path uses only the l_mu head — the l_var branch gets no
    # grad (torch-1.4 backward leaves its accumulated .grad at zero)
    pen_ps = list(model.encoder.parameters())
    pen_gs = [g if g is not None else torch.zeros_like(q)
              for g, q in zip(
                  torch.autograd.grad(loss_penalty, pen_ps,
                                      retain_graph=False, allow_unused=True),
                  pen_ps)]
    apply_grads(opts["decoder"], dec_ps,  # torch-1.4 zero_grad tensors
                [torch.zeros_like(q) for q in dec_ps])  # :417

    # 4. head updates in the reference's order, encoder grads accumulated
    assert [id(a) for a in enc_ps] == [id(a) for a in pen_ps]
    apply_grads(opts["encoder"], enc_ps,
                [g + pg for g, pg in zip(enc_gs, pen_gs)])
    apply_grads(opts["decoder"], dec_ps, dec_gs)
    apply_grads(opts["discriminator"], dis_ps, dis_gs)
    return {
        "loss_encoder": float(loss_encoder.detach()) / B,
        "loss_decoder": float(loss_decoder.detach()) / B,
        "loss_discriminator": float(loss_discriminator.detach()) / B,
        "loss_penalty": float(loss_penalty.detach()) / B,
        "loss_discriminator_fake": float(loss_fake.detach()) / B,
        "loss_discriminator_real": float(loss_real.detach()) / B,
        "bce_means": (float(bo.detach().mean()), float(bp.detach().mean())),
    }


@pytest.fixture(scope="module")
def waevgan(waevgan_base, cfg):
    from fmri_tpu.checkpoints.torch_import import convert_latent_discriminator
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_wae import make_wae_vgan_step

    model, wae = waevgan_base
    lr = cfg.train.learning_rate
    origin = _converted(model, cfg, "vae-gan")
    origin["latent_disc"] = convert_latent_discriminator(
        to_dtype_sd(wae), cfg, prefix="discriminator.")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps)
    state = make_state(origin, {k: opt for k in origin})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    x = _images(40)
    rng = jax.random.key(123)
    # mirror make_wae_vgan_step's PRNG contract (steps_wae.py:473-478)
    k_eps, k_zp, k_zf = jax.random.split(rng, 3)
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))
    z_fake = np.asarray(
        cfg.train.wae_sigma
        * jax.random.normal(k_zf, (B, LATENT), jnp.float32))

    step = make_wae_vgan_step(cfg, mode="vae-gan", donate=False)
    new_state, metrics = step.train_step(
        state, jnp.asarray(x), rng, jnp.float32(0.35), jnp.float32(0.68),
        jnp.float32(LAMBDA_MSE))

    m32, w32 = copy.deepcopy((model, wae))
    t32 = _waevgan_oracle(m32, w32, x, eps, z_p, z_fake, lr)
    m64, w64 = copy.deepcopy((model, wae))
    _waevgan_oracle(m64.double(), w64.double(), x, eps, z_p, z_fake, lr)
    after32 = _converted(m32, cfg, "vae-gan")
    after32["latent_disc"] = convert_latent_discriminator(
        to_dtype_sd(w32), cfg, prefix="discriminator.")
    after64 = _converted(m64, cfg, "vae-gan")
    after64["latent_disc"] = convert_latent_discriminator(
        to_dtype_sd(w64), cfg, prefix="discriminator.")
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=after32, after64=after64, torch32=t32, lr=lr)


def test_waevgan_losses_match(waevgan):
    m, t = waevgan["metrics"], waevgan["torch32"]
    for k in ("loss_encoder", "loss_decoder", "loss_discriminator",
              "loss_penalty", "loss_discriminator_fake",
              "loss_discriminator_real"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    # the oracle hard-codes both gates on; assert the fused step agreed
    assert float(m["train_dec"]) == 1.0
    assert float(m["train_dis"]) == 1.0


def test_waevgan_updates_match(waevgan):
    """All four groups: encoder (head loss + accumulated penalty grads vs
    the UPDATED latent D), decoder (incl. the zero-grad RMSprop moment-decay
    tick — without it the post-step decoder params are off by ~2.6%, far
    above the bound), image discriminator, latent discriminator."""
    assert_updates_match(waevgan["origin"], waevgan["state"].params,
                         waevgan["after32"], waevgan["after64"],
                         waevgan["lr"],
                         ("encoder", "decoder", "discriminator",
                          "latent_disc"))


def test_waevgan_encoder_bn_triple_tick_matches(waevgan):
    """The reference forwards the encoder three times per batch (main, D
    phase, penalty phase) — the fused step's analytic double replay must
    land on the same stats."""
    j = leafdict(waevgan["state"].batch_stats["encoder"])
    t = leafdict(waevgan["after32"]["encoder"]["batch_stats"])
    for ks in j:
        np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=ks)


def test_waevgan_decoder_bn_third_tick_matches(waevgan):
    """The penalty phase decodes x_recon = dec(mu) (``:406``) — a third
    decoder BN tick with DIFFERENT inputs that cannot be replayed
    analytically; pins the stats-only decode in ``make_wae_vgan_step``."""
    j = leafdict(waevgan["state"].batch_stats["decoder"])
    t = leafdict(waevgan["after32"]["decoder"]["batch_stats"])
    for ks in j:
        np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=ks)


# --------------------------------------------------------------------------
# Trajectories: stage-3 fine-tunes (vgan + wae) and WAE/Dual-GAN stage 1 —
# with these, every staged trainer family has a multi-step trajectory oracle
# --------------------------------------------------------------------------


def _vgan3_torch_traj(vgan3_base, cfg, inputs, dtype, margin, equilibrium,
                      records=None, gate_schedule=None):
    """The reference's stage-3 per-batch schedule
    (``train_vgan_stage3.py:320-410``) for ``len(inputs)`` steps with
    PERSISTENT clamp-+-1 RMSprop optimizers at ``dtype``; cognitive encoder
    and teacher frozen throughout (``:244-245,329-331``); the REAL
    equilibrium gate (``:382-389``).  The oracle always computes and records
    its OWN gate decision (``own_gates``); when ``gate_schedule`` is given
    the *applied* updates follow it instead, so both precision runs (and the
    JAX run supplying the schedule) share one discrete path — a knife-edge
    gate flip is a legitimate fp32 effect that would otherwise poison every
    later step of the trajectory (see ``_vgan1_torch_traj``)."""
    import torch

    lr = cfg.train.learning_rate
    model = copy.deepcopy(vgan3_base).to(dtype)
    model.train()
    opts = {}
    for name in ("decoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    for p in model.encoder.parameters():  # :329-331
        p.requires_grad = False

    for i, (fmri, image, eps, z_p) in enumerate(inputs):
        xf = torch.from_numpy(fmri).to(dtype)
        gt = nchw(image).to(dtype)
        mus, lv = model.encoder(xf)
        z = torch.from_numpy(eps).to(dtype) * (0.5 * lv).exp() + mus
        x_tilde = model.decoder(z)
        x_p = model.decoder(torch.from_numpy(z_p).to(dtype))
        disc_layer = model.discriminator(gt, x_tilde, x_p, "REC")
        disc_class = model.discriminator(gt, x_tilde, x_p, "GAN")
        _nle, kld, mse, bo, bp, bs = type(model).loss(
            gt, x_tilde, disc_layer[:B], disc_layer[B:2 * B],
            disc_layer[2 * B:], disc_class[:B], disc_class[B:2 * B],
            disc_class[2 * B:], mus, lv)
        loss_encoder = torch.sum(kld) + torch.sum(mse)  # logged only (:365)
        loss_discriminator = (torch.sum(bo) + torch.sum(bp) + torch.sum(bs))
        loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                        - (1.0 - LAMBDA_MSE) * loss_discriminator)
        own_dec = own_dis = True  # args.mode='vae-gan' default
        mbo, mbp = float(bo.detach().mean()), float(bp.detach().mean())
        if mbo < equilibrium - margin or mbp < equilibrium - margin:
            own_dis = False
        if mbo > equilibrium + margin or mbp > equilibrium + margin:
            own_dec = False
        if not own_dec and not own_dis:
            own_dec = own_dis = True
        if gate_schedule is not None:
            train_dec, train_dis = gate_schedule[i]
        else:
            train_dec, train_dis = own_dec, own_dis
        if records is not None:
            records.append({"loss_encoder": float(loss_encoder.detach()),
                            "loss_discriminator":
                                float(loss_discriminator.detach()),
                            "bce_means": (mbo, mbp),
                            "own_gates": (own_dec, own_dis),
                            "gates": (train_dec, train_dis)})
        if train_dec:  # :400-405
            ps, gs = group_grads(loss_decoder, model.decoder)
            apply_grads(opts["decoder"], ps, gs, clamp=1.0)
        if train_dis:  # :407-411
            ps, gs = group_grads(loss_discriminator, model.discriminator,
                                 retain_graph=False)
            apply_grads(opts["discriminator"], ps, gs, clamp=1.0)
    return model


def test_vgan3_trajectory(vgan3_base, cfg):
    """12-step stage-3 decoder-fine-tune trajectory (real 0.35/0.68 gate,
    clamp +-1, persistent RMSprop moments): per-step losses and gate
    decisions track the literal schedule, and the ENDPOINT parameters and
    running stats land within the fp64-calibrated torch pair (rel as in
    ``test_vgan2_trajectory`` — every discriminator input except gt is
    computed through the decoder stack).  Both torch precision runs replay
    the JAX run's gate schedule so the discrete path is shared — stage 3
    rides the gate boundary by design (the gate exists to hold the BCEs
    near equilibrium), and a knife-edge flip (observed at step 7 of this
    exact trajectory when torch ran its own fp32 gates) would otherwise
    fork the trajectories; torch's OWN gate decision must still equal
    JAX's wherever
    it is separated from the threshold by more than the step's drift bound.
    Encoder and teacher must stay bit-frozen through all 12 steps."""
    import torch

    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_cognitive_step

    lr = cfg.train.learning_rate
    margin, equilibrium = 0.35, 0.68
    origin = _converted(vgan3_base, cfg, "vae-gan-cognitive")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps, clip=1.0)
    state = make_state(origin, {"decoder": opt, "discriminator": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))
    step = make_vgan_cognitive_step(cfg, stage=3, mode="vae-gan",
                                    donate=False)

    base = jax.random.key(77)
    inputs, jax_metrics = [], []
    for i in range(TRAJ2_STEPS):
        fmri, image = _fmri(1000 + i, cfg), _images(1100 + i)
        rng = jax.random.fold_in(base, i)
        # PRNG contract (steps_vgan.py): eps_t drawn but unused at stage 3
        k_eps, _k_t, k_zp = jax.random.split(rng, 3)
        eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
        z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))
        inputs.append((fmri, image, eps, z_p))
        state, m = step.train_step(
            state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)},
            rng, jnp.float32(margin), jnp.float32(equilibrium),
            jnp.float32(LAMBDA_MSE))
        jax_metrics.append(m)
    jax_gates = [(bool(float(m["train_dec"])), bool(float(m["train_dis"])))
                 for m in jax_metrics]

    recs32 = []
    model32 = _vgan3_torch_traj(vgan3_base, cfg, inputs, torch.float32,
                                margin, equilibrium, records=recs32,
                                gate_schedule=jax_gates)
    recs64 = []
    model64 = _vgan3_torch_traj(vgan3_base, cfg, inputs, torch.float64,
                                margin, equilibrium, records=recs64,
                                gate_schedule=jax_gates)
    n_gates_checked = 0
    for i, (m, t, t64) in enumerate(zip(jax_metrics, recs32, recs64)):
        # drift widens earlier than stage 1's envelope (step 4 vs 8): the
        # stage-3 discriminator sees ONLY computed images (gt is raw but
        # x_tilde/x_p route through the decoder), so fp32 forward-noise
        # amplification compounds faster (measured 0.44% at step 7, 2.7%
        # at step 11).  The widening rate is calibrated to the measured
        # JAX-vs-torch32 drift, which exceeds torch's own fp32-vs-fp64
        # self-drift ~7x by late steps: the two frameworks differ in conv
        # reduction/fusion ORDER (a per-step perturbation the adversarial
        # dynamics amplify), while torch's precision pair shares one
        # implementation.  The 4x self-drift term remains as a secondary
        # floor and the fp64-anchored ENDPOINT assert below is the
        # rigorous guard against systematic (non-noise) divergence.
        rtol = 3e-3 + 3.5e-3 * max(0, i - 3)
        for k in ("loss_encoder", "loss_discriminator"):
            ref32, ref64 = float(t[k]) / B, float(t64[k]) / B
            tol = max(rtol * abs(ref32), 1e-4, 4.0 * abs(ref32 - ref64))
            assert abs(float(m[k]) - ref32) <= tol, (
                f"step {i} {k}: jax {float(m[k]):.6f} vs torch32 "
                f"{ref32:.6f} (tol {tol:.2e}, self-drift "
                f"{abs(ref32 - ref64):.2e})")
        mbo, mbp = t["bce_means"]
        edge = min(abs(mbo - (equilibrium - margin)),
                   abs(mbp - (equilibrium - margin)),
                   abs(mbo - (equilibrium + margin)),
                   abs(mbp - (equilibrium + margin)))
        # the gate decision is only well-posed when the BCE means sit
        # farther from a threshold than the step's numeric drift bound
        if edge > max(1e-3, rtol * max(abs(mbo), abs(mbp))):
            own_dec, own_dis = t["own_gates"]
            msg = f"step {i} (edge {edge:.2e}, means {mbo:.4f}/{mbp:.4f})"
            assert jax_gates[i] == (own_dec, own_dis), msg
            n_gates_checked += 1
    assert n_gates_checked >= TRAJ2_STEPS - 4

    t32 = _converted(model32, cfg, "vae-gan-cognitive")
    t64 = _converted(model64, cfg, "vae-gan-cognitive")
    assert_updates_match(origin, state.params, t32, t64, lr,
                         ("decoder", "discriminator"),
                         ratio=5.0, floor=5e-4, rel=0.12)
    for grp in ("encoder", "teacher_encoder"):  # frozen on both sides
        o = leafdict(origin[grp]["params"])
        j = leafdict(state.params[grp])
        t = leafdict(t32[grp]["params"])
        for ks in j:
            np.testing.assert_array_equal(j[ks], o[ks],
                                          err_msg=f"jax {grp}{ks}")
            np.testing.assert_array_equal(t[ks], o[ks],
                                          err_msg=f"torch {grp}{ks}")
    # cog encoder ticks once, decoder twice per step; disc excluded (the
    # REC+GAN double-tick delta, pinned single-step by
    # test_vgan1_disc_bn_ema_single_vs_double_tick)
    assert_updates_match(origin, state.batch_stats, t32, t64, 1.0,
                         ("encoder", "decoder"), key="batch_stats",
                         ratio=5.0, floor=1e-5, rel=0.02)


def _wae3_torch_traj(wae3_base, cfg, inputs, dtype, records=None):
    """The reference's LITERAL stage-3 WAE schedule
    (``train_wae_stage3.py:296-347``) for ``len(inputs)`` steps with
    PERSISTENT hard-coded Adam optimizers at ``dtype``; cognitive encoder
    frozen, decoder trained on plain mean-MSE (penalty backward commented
    out, ``:344``)."""
    import torch
    import torch.nn as nn

    model, teacher = copy.deepcopy(wae3_base)
    model, teacher = model.to(dtype), teacher.to(dtype)
    model.train()
    teacher.train()  # never toggled by the trainer; ctor default
    opt_d = torch.optim.Adam(model.decoder.parameters(), lr=0.001,
                             betas=(0.5, 0.999))
    opt_disc = torch.optim.Adam(model.discriminator.parameters(), lr=0.0005,
                                betas=(0.5, 0.999))
    warm_adam(opt_d)
    warm_adam(opt_disc)
    _free(model.encoder, False)  # :298

    for fmri, image in inputs:
        xf = torch.from_numpy(fmri).to(dtype)
        xi = nchw(image).to(dtype)
        model.decoder.zero_grad()
        model.discriminator.zero_grad()
        # ---- Phase 1 (:306-326) ----
        _free(model.decoder, False)
        _free(model.discriminator, True)
        z_fake, _ = model.encoder(xf)
        z_real, _ = teacher.encoder(xi)
        d_real = model.discriminator(z_real)
        d_fake = model.discriminator(z_fake)
        loss_fake = -10 * torch.sum(torch.log(d_fake + 1e-3))
        loss_real = -10 * torch.sum(torch.log(1 - d_real + 1e-3))
        loss_fake.backward(retain_graph=True)
        loss_real.backward(retain_graph=True)
        opt_disc.step()
        # ---- Phase 2 (:328-347) ----
        _free(model.decoder, True)
        _free(model.discriminator, False)
        z_real, _ = model.encoder(xf)
        x_recon = model.decoder(z_real)
        d_real = model.discriminator(z_real)
        loss_reconstruction = nn.MSELoss()(x_recon, xi)
        loss_penalty = -10 * torch.mean(torch.log(d_real + 1e-3))
        loss_reconstruction.backward(retain_graph=True)
        opt_d.step()
        _free(model.discriminator, True)
        if records is not None:
            records.append({
                "loss_reconstruction": float(loss_reconstruction.detach()),
                "loss_penalty": float(loss_penalty.detach()),
                "loss_discriminator_fake": float(loss_fake.detach()) / B,
                "loss_discriminator_real": float(loss_real.detach()) / B})
    return model, teacher


def test_wae3_trajectory(wae3_base, cfg):
    """12-step stage-3 WAE decoder-fine-tune trajectory: per-step losses
    track the literal hard-coded-Adam schedule with persistent moments, and
    the ENDPOINT parameters and running stats land within the
    fp64-calibrated torch pair.

    Endpoint stats cover the cognitive encoder (double tick per step,
    replayed in the fused step) and the decoder (single phase-2 tick —
    the stage-3 BN-base finding pinned single-step by
    ``test_wae3_decoder_bn_single_tick_matches``).  The teacher encoder is
    excluded for the same reason as stage 2: its stats are never consumed."""
    import torch

    from fmri_tpu.checkpoints.torch_import import convert_visual_encoder
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import Adam
    from fmri_tpu.train.steps_wae import make_wae_cognitive_step

    model, teacher = wae3_base
    origin = _converted(model, cfg, "wae-gan-cognitive")
    origin["teacher_encoder"] = convert_visual_encoder(
        to_dtype_sd(teacher), cfg, prefix="encoder.")
    opt = Adam(b1=0.5, b2=0.999)
    state = make_state(origin, {"decoder": opt, "latent_disc": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))
    step = make_wae_cognitive_step(cfg, stage=3, donate=False)

    base = jax.random.key(44)
    inputs, jax_metrics = [], []
    for i in range(TRAJ2_STEPS):
        fmri, image = _fmri(1200 + i, cfg), _images(1300 + i)
        inputs.append((fmri, image))
        state, m = step.train_step(
            state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)},
            jax.random.fold_in(base, i))
        jax_metrics.append(m)

    recs32 = []
    model32, _teacher32 = _wae3_torch_traj(wae3_base, cfg, inputs,
                                           torch.float32, records=recs32)
    for i, (m, t) in enumerate(zip(jax_metrics, recs32)):
        rtol = 3e-3 + 1.5e-3 * max(0, i - 7)
        for k, val in t.items():
            np.testing.assert_allclose(float(m[k]), val, rtol=rtol,
                                       atol=1e-4, err_msg=f"step {i} {k}")

    model64, _teacher64 = _wae3_torch_traj(wae3_base, cfg, inputs,
                                           torch.float64)
    t32 = _converted(model32, cfg, "wae-gan-cognitive")
    t64 = _converted(model64, cfg, "wae-gan-cognitive")
    lrs = {"decoder": 1e-3, "latent_disc": 5e-4}
    assert_updates_match(origin, state.params, t32, t64, lrs,
                         ("decoder", "latent_disc"),
                         ratio=5.0, floor=5e-4, rel=0.05)
    o = leafdict(origin["encoder"]["params"])  # frozen on both sides
    j = leafdict(state.params["encoder"])
    t = leafdict(t32["encoder"]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
        np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")
    assert_updates_match(origin, state.batch_stats, t32, t64, 1.0,
                         ("encoder", "decoder"), key="batch_stats",
                         ratio=5.0, floor=1e-5, rel=0.02)


def _waevgan_torch_traj(waevgan_base, cfg, inputs, dtype, margin,
                        equilibrium, records=None, gate_schedule=None):
    """The reference's WAE/Dual-GAN per-batch schedule
    (``wae_vgan_stage1.py:290-441``, historical semantics — see
    ``_waevgan_oracle``) for ``len(inputs)`` steps with PERSISTENT RMSprop
    optimizers at ``dtype`` and the REAL equilibrium gate (``:356-364``).
    Gate consequences per the reference's update block: the penalty-phase
    decoder moment-decay tick (``:417``) and the wae-D/encoder updates run
    unconditionally; only the main decoder (``:429-435``) and image-D
    (``:437-441``) updates are gated."""
    import torch

    lr = cfg.train.learning_rate
    model, wae = copy.deepcopy(waevgan_base)
    model, wae = model.to(dtype), wae.to(dtype)
    model.train()
    wae.train()
    opts = {}
    for name in ("encoder", "decoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    opt_wdisc = torch.optim.RMSprop(wae.discriminator.parameters(), lr=lr,
                                    alpha=0.9, eps=1e-8, weight_decay=0,
                                    momentum=0, centered=False)
    warm_rmsprop(opt_wdisc)

    for i, (x, eps, z_p, z_fake) in enumerate(inputs):
        xt = nchw(x).to(dtype)
        # 1. main VAE/GAN forward + head grads at original weights
        mus, lv = model.encoder(xt)
        z = torch.from_numpy(eps).to(dtype) * (0.5 * lv).exp() + mus
        x_tilde = model.decoder(z)
        x_p = model.decoder(torch.from_numpy(z_p).to(dtype))
        disc_layer = model.discriminator(xt, x_tilde, x_p, "REC")
        disc_class = model.discriminator(xt, x_tilde, x_p, "GAN")
        _, kld, mse, bo, bp, bs = type(model).loss(
            xt, x_tilde, disc_layer[:B], disc_layer[B:2 * B],
            disc_layer[2 * B:], disc_class[:B], disc_class[B:2 * B],
            disc_class[2 * B:], mus, lv)
        loss_encoder = torch.sum(kld) + torch.sum(mse)
        loss_discriminator = (torch.sum(bo) + torch.sum(bp) + torch.sum(bs))
        loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                        - (1.0 - LAMBDA_MSE) * loss_discriminator)
        enc_ps, enc_gs = group_grads(loss_encoder, model.encoder)
        dec_ps, dec_gs = group_grads(loss_decoder, model.decoder)
        dis_ps, dis_gs = group_grads(loss_discriminator, model.discriminator,
                                     retain_graph=False)
        own_dec = own_dis = True  # mode 'vae-gan' (:351-355)
        mbo, mbp = float(bo.detach().mean()), float(bp.detach().mean())
        if mbo < equilibrium - margin or mbp < equilibrium - margin:
            own_dis = False
        if mbo > equilibrium + margin or mbp > equilibrium + margin:
            own_dec = False
        if not own_dec and not own_dis:
            own_dec = own_dis = True
        if gate_schedule is not None:
            train_dec, train_dis = gate_schedule[i]
        else:
            train_dec, train_dis = own_dec, own_dis

        # 2. latent-D phase (:378-397): second encoder forward
        z_real, _ = model.encoder(xt)
        d_real = wae.discriminator(z_real)
        d_fake = wae.discriminator(torch.from_numpy(z_fake).to(dtype))
        loss_fake = -torch.sum(torch.log(d_fake + 1e-3))
        loss_real = -torch.sum(torch.log(1 - d_real + 1e-3))
        ps, gs = group_grads(loss_fake + loss_real, wae.discriminator,
                             retain_graph=False)
        apply_grads(opt_wdisc, ps, gs)

        # 3. penalty phase vs the UPDATED wae-D (:401-417): third encoder
        # forward, x_recon decode (BN tick only), decoder moment-decay tick
        z_real2, _ = model.encoder(xt)
        model.decoder(z_real2)
        d_real2 = wae.discriminator(z_real2)
        loss_penalty = -torch.sum(torch.log(d_real2 + 1e-3))
        pen_ps = list(model.encoder.parameters())
        pen_gs = [g if g is not None else torch.zeros_like(q)
                  for g, q in zip(
                      torch.autograd.grad(loss_penalty, pen_ps,
                                          retain_graph=False,
                                          allow_unused=True), pen_ps)]
        apply_grads(opts["decoder"], dec_ps,
                    [torch.zeros_like(q) for q in dec_ps])  # :417

        # 4. head updates (:419-441), encoder grads accumulated
        apply_grads(opts["encoder"], enc_ps,
                    [g + pg for g, pg in zip(enc_gs, pen_gs)])
        if train_dec:
            apply_grads(opts["decoder"], dec_ps, dec_gs)
        if train_dis:
            apply_grads(opts["discriminator"], dis_ps, dis_gs)
        if records is not None:
            records.append({
                "losses": {
                    "loss_encoder": float(loss_encoder.detach()) / B,
                    "loss_discriminator":
                        float(loss_discriminator.detach()) / B,
                    "loss_penalty": float(loss_penalty.detach()) / B,
                    "loss_discriminator_fake": float(loss_fake.detach()) / B,
                    "loss_discriminator_real": float(loss_real.detach()) / B,
                },
                "bce_means": (mbo, mbp),
                "own_gates": (own_dec, own_dis),
                "gates": (train_dec, train_dis)})
    return model, wae


def test_waevgan_trajectory(waevgan_base, cfg):
    """12-step WAE/Dual-GAN trajectory (real 0.35/0.68 gate, lam=1.0,
    persistent moments on all FOUR optimizers): per-step losses across both
    adversarial games track the literal schedule, gate decisions match away
    from the knife edge, and the ENDPOINT parameters and running stats land
    within the fp64-calibrated torch pair.  As in ``test_vgan3_trajectory``,
    both torch precision runs replay the JAX gate schedule (one shared
    discrete path; knife-edge flips are legitimate fp32 effects), while
    torch's OWN gate decisions are asserted equal wherever they are
    separated from the threshold by more than the step's drift bound.

    This exercises the family's quirks compounding over steps: the
    unconditional decoder moment-decay tick interleaved between gated
    updates, the penalty-into-encoder grad accumulation against the
    UPDATED latent D, and the encoder-triple/decoder-third BN ticks."""
    import torch

    from fmri_tpu.checkpoints.torch_import import convert_latent_discriminator
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_wae import make_wae_vgan_step

    model, wae = waevgan_base
    lr = cfg.train.learning_rate
    margin, equilibrium = 0.35, 0.68
    origin = _converted(model, cfg, "vae-gan")
    origin["latent_disc"] = convert_latent_discriminator(
        to_dtype_sd(wae), cfg, prefix="discriminator.")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps)
    state = make_state(origin, {k: opt for k in origin})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))
    step = make_wae_vgan_step(cfg, mode="vae-gan", donate=False)

    base = jax.random.key(66)
    inputs, jax_metrics = [], []
    for i in range(TRAJ2_STEPS):
        x = _images(1400 + i)
        rng = jax.random.fold_in(base, i)
        # mirror make_wae_vgan_step's PRNG contract (steps_wae.py:473-478)
        k_eps, k_zp, k_zf = jax.random.split(rng, 3)
        eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
        z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))
        z_fake = np.asarray(
            cfg.train.wae_sigma
            * jax.random.normal(k_zf, (B, LATENT), jnp.float32))
        inputs.append((x, eps, z_p, z_fake))
        state, m = step.train_step(
            state, jnp.asarray(x), rng, jnp.float32(margin),
            jnp.float32(equilibrium), jnp.float32(LAMBDA_MSE))
        jax_metrics.append(m)
    jax_gates = [(bool(float(m["train_dec"])), bool(float(m["train_dis"])))
                 for m in jax_metrics]

    recs32 = []
    model32, wae32 = _waevgan_torch_traj(waevgan_base, cfg, inputs,
                                         torch.float32, margin, equilibrium,
                                         records=recs32,
                                         gate_schedule=jax_gates)
    recs64 = []
    model64, wae64 = _waevgan_torch_traj(waevgan_base, cfg, inputs,
                                         torch.float64, margin, equilibrium,
                                         records=recs64,
                                         gate_schedule=jax_gates)
    n_gates_checked = 0
    for i, (m, t, t64) in enumerate(zip(jax_metrics, recs32, recs64)):
        # earlier widening than stage 1 (step 4 vs 8): three encoder
        # forwards + two adversarial games per step compound fp32 drift
        # faster (measured 0.59% on the disc bce at step 5).  Late steps
        # self-calibrate against torch's own fp32-vs-fp64 drift, as in
        # ``test_vgan3_trajectory`` (the endpoint anchor bounds residuals).
        rtol = 3e-3 + 2e-3 * max(0, i - 3)
        for k, val in t["losses"].items():
            val64 = t64["losses"][k]
            tol = max(rtol * abs(val), 1e-4, 4.0 * abs(val - val64))
            assert abs(float(m[k]) - val) <= tol, (
                f"step {i} {k}: jax {float(m[k]):.6f} vs torch32 "
                f"{val:.6f} (tol {tol:.2e}, self-drift "
                f"{abs(val - val64):.2e})")
        mbo, mbp = t["bce_means"]
        edge = min(abs(mbo - (equilibrium - margin)),
                   abs(mbp - (equilibrium - margin)),
                   abs(mbo - (equilibrium + margin)),
                   abs(mbp - (equilibrium + margin)))
        if edge > max(1e-3, rtol * max(abs(mbo), abs(mbp))):
            own_dec, own_dis = t["own_gates"]
            msg = f"step {i} (edge {edge:.2e}, means {mbo:.4f}/{mbp:.4f})"
            assert jax_gates[i] == (own_dec, own_dis), msg
            n_gates_checked += 1
    assert n_gates_checked >= TRAJ2_STEPS - 4

    t32 = _converted(model32, cfg, "vae-gan")
    t32["latent_disc"] = convert_latent_discriminator(
        to_dtype_sd(wae32), cfg, prefix="discriminator.")
    t64 = _converted(model64, cfg, "vae-gan")
    t64["latent_disc"] = convert_latent_discriminator(
        to_dtype_sd(wae64), cfg, prefix="discriminator.")
    assert_updates_match(origin, state.params, t32, t64, lr,
                         ("encoder", "decoder", "discriminator",
                          "latent_disc"),
                         ratio=5.0, floor=5e-4, rel=0.08)
    # encoder triple tick + decoder third (stats-only) tick, both replayed
    # in the fused step; image-D excluded (REC+GAN double-tick delta,
    # pinned single-step)
    assert_updates_match(origin, state.batch_stats, t32, t64, 1.0,
                         ("encoder", "decoder"), key="batch_stats",
                         ratio=5.0, floor=1e-5, rel=0.02)
