"""UPDATE-level parity for the ablation-experiment trainers
(reference ``experiments/``, SURVEY.md §2.6) — completing the oracle
coverage: with these, EVERY trainer in the repo (7 main + 5 experiments) has
its per-batch update rule proven against the reference executed read-only.

Same measurement design as ``tests/test_update_parity.py`` (fp32 oracle
bounded by its own distance from the fp64 oracle; warm second moments;
injected noise mirroring each step's PRNG contract).

These oracles caught and fixed FOUR real parity bugs in ``steps_exp.py``:

  * ``exp_dcgan_stage1.py`` gates on ITS OWN bce means — ``-log(so+eps)``
    and ``-log(sp+eps)`` (the generator bce, ``:286-287,301-306``) — not the
    main family's predicted-as-fake bce;
  * the same script's decoder grads ACCUMULATE ``loss_discriminator``'s
    contribution (only ``model.discriminator.zero_grad()`` runs between the
    two backwards, ``:313-327``);
  * ``exp_dcgan_stage2.py`` TRAINS the decoder (its freeze loop is commented
    out at ``:281-283``; ``optimizer_decoder.step()`` at ``:343-345``, NO
    grad clamp — the clamp line ``:344`` is commented) — previously modeled
    as frozen;
  * ``exp_vae.py`` hard-codes ``train_dec=True, train_dis=False`` (gate
    block commented out ``:343-352``) and does NOT clamp decoder grads
    (``:366`` commented) — previously given the standard gate + clamp.

``exp_dcgan_stage1`` additionally gets a LITERAL-schedule oracle via
``DataRmsProp`` (``ref_oracle.py``): torch-0.4-style ``.data`` parameter
writes bypass autograd version counters on modern torch, so the reference's
disc-update-then-stale-graph-decoder-backward executes exactly as it did in
2021 — the decoder backward traverses the UPDATED discriminator weights.
The fused step computes all gradients at the ORIGINAL weights (like every
other family); ``test_dcgan1_stale_graph_delta_is_second_order`` pins that
deviation at O(lr) of the update itself.
"""

from __future__ import annotations

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import (
    REF, DataRmsProp, apply_grads, assert_updates_match, group_grads,
    import_reference, leafdict, nchw, to_dtype_sd, warm_adam,
    warm_jax_opt_state, warm_rmsprop,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available")

B = 4
LATENT = 512  # the repo's checked-in res100 block (models_config.py:19)
LAMBDA_MSE = 1e-6
VOXELS = 3620


@pytest.fixture(scope="module")
def cfg():
    from fmri_tpu.configs import get_config

    c = get_config("res100")
    assert c.model.fused_decoder_batch is False  # reference decode order
    return c


def _images(seed, n=B, size=100):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, size, size, 3)).astype(np.float32)


def _fmri(seed, n=B):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, VOXELS)).astype(np.float32)


# --------------------------------------------------------------------------
# exp_dcgan_stage1.py — plain DCGAN (decoder + discriminator)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dcgan_base():
    """Reference ``DCGan`` (``vae_gan.py:581-622``) assembled as
    ``exp_dcgan_stage1.py:182-184`` does, BN stats warmed by real train-mode
    forwards."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(21)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dec = ref_models.Decoder(z_size=LATENT, size=256)
        disc = ref_models.Discriminator()
        model = ref_models.DCGan(device="cpu", decoder=dec,
                                 discriminator=disc, z_size=LATENT)
    with torch.no_grad():
        model.train()
        for _ in range(2):
            model(torch.randn(B, 3, 100, 100))
        model.eval()
    return model


def _dcgan_groups(model, cfg):
    from fmri_tpu.checkpoints.torch_import import (
        convert_decoder, convert_image_discriminator,
    )

    sd = to_dtype_sd(model)
    return {"decoder": convert_decoder(sd, cfg, prefix="decoder."),
            "discriminator": convert_image_discriminator(
                sd, cfg, prefix="discriminator.")}


def _dcgan1_oracle(model, x, z_p, lr, literal):
    """``exp_dcgan_stage1.py:276-327`` per-batch schedule, both gates on
    (eq=margin=100 on the caller's side keeps them on: means are positive,
    so neither ``< eq-margin=0`` nor ``> eq+margin=200`` fires).

    ``literal=True``: the EXACT 2021 execution via ``DataRmsProp`` —
    discriminator backward + clamp + step, ``model.discriminator.zero_grad``
    only, then decoder backward over the stale graph (updated disc weights)
    ACCUMULATING onto the disc-loss decoder grads, clamp, step (``:313-327``).

    ``literal=False``: historical grads-at-original-weights semantics — the
    discriminator grad is ``d(loss_dis)/d(disc)``; the decoder grad is the
    accumulated ``d(loss_dis + loss_dec)/d(dec)``, both at original weights.
    """
    import torch

    dt = next(model.parameters()).dtype
    model.train()
    gt = nchw(x).to(dt)
    # forward = DCGan.forward train branch (vae_gan.py:599-613) with z_p
    # injected: x_tilde passed to the discriminator TWICE (predicted and
    # sampled slots both carry the same decode)
    x_tilde = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(gt, x_tilde, x_tilde, "REC")  # noqa: F841
    disc_class = model.discriminator(gt, x_tilde, x_tilde, "GAN")
    so, sp, ss = disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:]
    bce_orig = -torch.log(so + 1e-3)
    bce_pred = -torch.log(sp + 1e-3)
    bce_samp = -torch.log(1 - ss + 1e-3)
    loss_dis = bce_orig.sum() + bce_samp.sum()   # :290
    loss_dec = bce_pred.sum()                    # :291
    out = {"loss_decoder": float(loss_dec) / B,
           "loss_discriminator": float(loss_dis) / B,
           "gate_means": (float(bce_orig.mean()), float(bce_pred.mean()))}
    if literal:
        opt_dis = DataRmsProp(model.discriminator.parameters(), lr)
        opt_dec = DataRmsProp(model.decoder.parameters(), lr)
        model.zero_grad()
        loss_dis.backward(retain_graph=True)                      # :317
        for p in model.discriminator.parameters():                # :318
            p.grad.data.clamp_(-1, 1)
        opt_dis.step()                                            # :319
        model.discriminator.zero_grad()                           # :320
        loss_dec.backward()                                       # :324
        for p in model.decoder.parameters():                      # :325
            p.grad.data.clamp_(-1, 1)
        opt_dec.step()                                            # :326
        model.decoder.zero_grad()                                 # :327
    else:
        opts = {}
        for name in ("decoder", "discriminator"):  # :221-226 RMSprop
            o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                    alpha=0.9, eps=1e-8, weight_decay=0,
                                    momentum=0, centered=False)
            warm_rmsprop(o)
            opts[name] = o
        # grads first, steps after: a modern optimizer.step() between the
        # two autograd.grad calls would version-bump the disc weights the
        # decoder pullback traverses (the literal branch handles exactly
        # that via DataRmsProp's shadow writes)
        ps_dis, gs_dis = group_grads(loss_dis, model.discriminator)
        ps_dec, gs_dec = group_grads(loss_dis + loss_dec, model.decoder,
                                     retain_graph=False)
        apply_grads(opts["discriminator"], ps_dis, gs_dis, clamp=1.0)
        apply_grads(opts["decoder"], ps_dec, gs_dec, clamp=1.0)
    return out


@pytest.fixture(scope="module")
def dcgan1(dcgan_base, cfg):
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_exp import make_dcgan_stage1_step

    lr = cfg.train.learning_rate
    origin = _dcgan_groups(dcgan_base, cfg)
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps, clip=1.0)
    state = make_state(origin, {k: opt for k in origin})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    x = _images(30)
    rng = jax.random.key(13)
    # PRNG contract: z_p drawn from the WHOLE step key (steps_exp.py)
    z_p = np.asarray(jax.random.normal(rng, (B, LATENT), jnp.float32))

    step = make_dcgan_stage1_step(cfg, donate=False)
    new_state, metrics = step.train_step(
        state, jnp.asarray(x), rng, jnp.float32(100.0), jnp.float32(100.0),
        jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(dcgan_base)
    t32 = _dcgan1_oracle(m32, x, z_p, lr, literal=True)
    m64 = copy.deepcopy(dcgan_base).double()
    _dcgan1_oracle(m64, x, z_p, lr, literal=True)
    h32 = copy.deepcopy(dcgan_base)
    _dcgan1_oracle(h32, x, z_p, lr, literal=False)
    h64 = copy.deepcopy(dcgan_base).double()
    _dcgan1_oracle(h64, x, z_p, lr, literal=False)
    return dict(origin=origin, state=new_state, metrics=metrics,
                lit32=_dcgan_groups(m32, cfg), lit64=_dcgan_groups(m64, cfg),
                hist32=_dcgan_groups(h32, cfg),
                hist64=_dcgan_groups(h64, cfg), torch32=t32, lr=lr)


def test_dcgan1_losses_match(dcgan1):
    m, t = dcgan1["metrics"], dcgan1["torch32"]
    assert float(m["train_dec"]) == 1.0 and float(m["train_dis"]) == 1.0
    for k in ("loss_decoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_dcgan1_updates_match_historical(dcgan1):
    """Both groups match the grads-at-original-weights semantics — incl. the
    decoder's ACCUMULATED ``d(loss_dis+loss_dec)/d(dec)`` gradient and the
    +-1 clamps.  rel=0.08 for the decoder/discriminator adversarial paths
    (x_tilde is computed through the decoder stack; see the stage-2/3
    rationale in test_update_parity.py).

    floor=3e-3: this game's gradients are tiny (pure bce sums, |update| ~
    1e-2 lr units on the unit-scale BN params), so a post-step parameter is
    only ~10 fp32 ULPs from its origin — each side's fp32 storage quantizes
    the update to multiples of 2^-23/lr = 1.2e-3 lr units, and two
    independent quantizations legitimately differ by up to ~2.4e-3.  The
    default floor (5e-4) is below the representable resolution here."""
    assert_updates_match(dcgan1["origin"], dcgan1["state"].params,
                         dcgan1["hist32"], dcgan1["hist64"], dcgan1["lr"],
                         ("decoder", "discriminator"), rel=0.08, floor=3e-3)


def test_dcgan1_disc_update_matches_literal(dcgan1):
    """The discriminator backward runs FIRST in the reference (:317-319),
    before any weight moved — so against the LITERAL oracle the disc update
    must match exactly as tightly as the historical one."""
    assert_updates_match(dcgan1["origin"], dcgan1["state"].params,
                         dcgan1["lit32"], dcgan1["lit64"], dcgan1["lr"],
                         ("discriminator",), rel=0.08)


def test_dcgan1_stale_graph_delta_is_second_order(dcgan1):
    """Pins the ONE documented deviation from the literal 2021 execution:
    the reference's ``loss_decoder.backward()`` traverses the discriminator
    AFTER its ``.data`` update landed (:319-324), so its decoder gradient
    sees disc weights perturbed by O(lr); the fused step evaluates at the
    original weights.  The literal-vs-historical fp64 oracle pair isolates
    exactly that effect — assert it is second-order: small relative to the
    update itself, and the fused step sits within a few multiples of it.

    Both oracle trees pass through a fp32 cast (``to_dtype_sd``), so every
    comparison bottoms out at ~one fp32 ULP of the unit-scale BN params —
    the ``3*ulp32`` slack term (measured: the whole stale delta on this
    game IS one ULP, i.e. below fp32 resolution)."""
    ulp32 = 1.2e-7
    for grp in ("decoder",):
        o = leafdict(dcgan1["origin"][grp]["params"])
        lit = leafdict(dcgan1["lit64"][grp]["params"])
        hist = leafdict(dcgan1["hist64"][grp]["params"])
        j = leafdict(dcgan1["state"].params[grp])
        for ks in o:
            d_lit = lit[ks] - o[ks]
            stale = float(np.abs(lit[ks] - hist[ks]).max())
            scale = float(np.abs(d_lit).max()) + 1e-30
            # second-order: the stale-graph effect is a small fraction of
            # the update (O(lr * curvature); lr = 1e-4 here).  Measured
            # worst case: ~6% on out_bias — the 3-element output-conv bias,
            # the most curvature-exposed scalar in the game; every other
            # leaf sits at or below one fp32 ULP.
            assert stale <= 0.12 * scale + 3 * ulp32, (ks, stale, scale)
            # and the fused update lands within the same neighborhood of
            # the literal truth
            err_j = float(np.abs(j[ks] - lit[ks]).max())
            assert err_j <= 10.0 * stale + 0.08 * scale + 3 * ulp32, (
                ks, err_j, stale, scale)


def test_dcgan1_bn_stats_match(dcgan1):
    """Decoder BN ticks once (single decode); the discriminator conv blocks
    tick twice ('REC' then 'GAN', the fc BN once) — replay one extra tick on
    the conv blocks as for the main family."""
    from fmri_tpu.train.common import bn_extra_ticks

    j = leafdict(dcgan1["state"].batch_stats["decoder"])
    t = leafdict(dcgan1["lit32"]["decoder"]["batch_stats"])
    for ks in j:
        np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=f"decoder{ks}")
    old = dcgan1["origin"]["discriminator"]["batch_stats"]
    new = dcgan1["state"].batch_stats["discriminator"]
    j2 = leafdict({k: (bn_extra_ticks(old[k], new[k], extra=1)
                       if k.startswith("EncoderBlock") else new[k])
                   for k in new})
    t2 = leafdict(dcgan1["lit32"]["discriminator"]["batch_stats"])
    for ks in j2:
        np.testing.assert_allclose(j2[ks], t2[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=f"disc{ks}")


# --------------------------------------------------------------------------
# exp_dcgan_stage2.py — cognitive encoder (frozen) over the DCGAN generator
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dcgan2_base(dcgan_base):
    """``exp_dcgan_stage2.py:163-188``: VaeGanCognitive with a fresh
    cognitive encoder (frozen), the stage-1 decoder + discriminator shared,
    NO teacher."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(23)
    stage1 = copy.deepcopy(dcgan_base)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cog = ref_models.CognitiveEncoder(input_size=VOXELS, z_size=LATENT)
    with torch.no_grad():
        cog.train()
        cog(torch.randn(B, VOXELS))
        cog.eval()
    model = ref_models.VaeGanCognitive(
        device="cpu", encoder=cog, decoder=stage1.decoder,
        discriminator=stage1.discriminator, teacher_net=None,
        z_size=LATENT, stage=2)
    for p in model.encoder.parameters():  # :187-188
        p.requires_grad = False
    return model


def _dcgan2_oracle(model, fmri, image, eps, z_p, lr):
    """``exp_dcgan_stage2.py:290-353``: full vae-gan losses over the
    no-teacher stage-2 forward (gt_x = raw image, ``vae_gan.py:367``);
    decoder trains WITHOUT clamp (:343-345, clamp :344 commented),
    discriminator with clamp +-1 (:351-353), encoder frozen (backward
    commented :336-338).  Both backwards are clean per-head grads
    (``model.zero_grad()`` :335 + ``model.discriminator.zero_grad()`` :347),
    and the decoder update lands before the disc backward whose grads ride
    saved activations only — so grads-at-original-weights IS the literal
    semantics here."""
    import torch

    dt = next(model.decoder.parameters()).dtype
    model.train()
    xf = torch.from_numpy(fmri).to(dt)
    gt = nchw(image).to(dt)
    opts = {}
    for name in ("decoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    mus, lv = model.encoder(xf)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(gt, x_tilde, x_p, "REC")
    disc_class = model.discriminator(gt, x_tilde, x_p, "GAN")
    _nle, kld, mse, bo, bp, bs = type(model).loss(
        gt, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    loss_encoder = torch.sum(kld) + torch.sum(mse)        # logged only
    loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
    loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                    - (1.0 - LAMBDA_MSE) * loss_discriminator)
    ps, gs = group_grads(loss_decoder, model.decoder)
    apply_grads(opts["decoder"], ps, gs)  # NO clamp (:344 commented)
    ps, gs = group_grads(loss_discriminator, model.discriminator,
                         retain_graph=False)
    apply_grads(opts["discriminator"], ps, gs, clamp=1.0)  # :352
    return {"loss_encoder": float(loss_encoder) / B,
            "loss_decoder": float(loss_decoder) / B,
            "loss_discriminator": float(loss_discriminator) / B,
            "gate_means": (float(bo.mean()), float(bp.mean()))}


@pytest.fixture(scope="module")
def dcgan2(dcgan2_base, cfg):
    from fmri_tpu.checkpoints.torch_import import convert_state_dict
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_exp import make_dcgan_stage2_step

    lr = cfg.train.learning_rate
    origin = convert_state_dict(to_dtype_sd(dcgan2_base), cfg,
                                kind="vae-gan-cognitive")
    assert "teacher_encoder" not in origin  # no teacher in this trainer
    state = make_state(origin, {
        "decoder": RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps),
        "discriminator": RmsProp(decay=cfg.train.rms_decay,
                                 eps=cfg.train.rms_eps, clip=1.0)})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(31), _images(32)
    rng = jax.random.key(14)
    k_eps, k_zp = jax.random.split(rng)  # steps_exp stage-2 PRNG contract
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    step = make_dcgan_stage2_step(cfg, donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)}, rng,
        jnp.float32(100.0), jnp.float32(100.0), jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(dcgan2_base)
    t32 = _dcgan2_oracle(m32, fmri, image, eps, z_p, lr)
    m64 = copy.deepcopy(dcgan2_base).double()
    _dcgan2_oracle(m64, fmri, image, eps, z_p, lr)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=convert_state_dict(to_dtype_sd(m32), cfg,
                                           kind="vae-gan-cognitive"),
                after64=convert_state_dict(to_dtype_sd(m64), cfg,
                                           kind="vae-gan-cognitive"),
                torch32=t32, lr=lr)


def test_dcgan2_losses_match(dcgan2):
    m, t = dcgan2["metrics"], dcgan2["torch32"]
    assert float(m["train_dec"]) == 1.0 and float(m["train_dis"]) == 1.0
    for k in ("loss_encoder", "loss_decoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_dcgan2_updates_match(dcgan2):
    """Decoder (unclamped!) + discriminator (clamped) updates match; the
    frozen cognitive encoder stays bit-identical on both sides.

    The decoder gets ratio=12: with NO clamp its gradient is the raw
    adversarial ``-(1-lam)*loss_dis`` pullback through the discriminator
    stack, and the decoder-fc BN bias (43k features) accumulates
    cancellation-prone sums — measured at ~7.8x the torch-fp32-vs-fp64
    distance (structural errors measure 100-1000x)."""
    assert_updates_match(dcgan2["origin"], dcgan2["state"].params,
                         dcgan2["after32"], dcgan2["after64"], dcgan2["lr"],
                         ("discriminator",), rel=0.08)
    assert_updates_match(dcgan2["origin"], dcgan2["state"].params,
                         dcgan2["after32"], dcgan2["after64"], dcgan2["lr"],
                         ("decoder",), ratio=12.0, rel=0.08)
    o = leafdict(dcgan2["origin"]["encoder"]["params"])
    j = leafdict(dcgan2["state"].params["encoder"])
    t = leafdict(dcgan2["after32"]["encoder"]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
        np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")


# --------------------------------------------------------------------------
# exp_vgan.py / exp_vae.py — cognitive Dual-VAE(/GAN) from scratch
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def scratch_base():
    """``exp_vgan.py:160-167`` / ``exp_vae.py:196-201``: VaeGanCognitive
    over a fresh cognitive encoder + decoder + discriminator, teacher None,
    stage=3 (so the forward is the no-distillation branch)."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(25)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cog = ref_models.CognitiveEncoder(input_size=VOXELS, z_size=LATENT)
        dec = ref_models.Decoder(z_size=LATENT, size=256)
        disc = ref_models.Discriminator()
    with torch.no_grad():
        for m in (cog, dec, disc):
            m.train()
        for _ in range(2):
            mus, _ = cog(torch.randn(B, VOXELS))
            xt = dec(mus)
            xp = dec(torch.randn(B, LATENT))
            disc(torch.randn(B, 3, 100, 100), xt, xp, "REC")
        for m in (cog, dec, disc):
            m.eval()
    return ref_models.VaeGanCognitive(
        device="cpu", encoder=cog, decoder=dec, discriminator=disc,
        teacher_net=None, z_size=LATENT, stage=3)


def _scratch_oracle(model, fmri, image, eps, z_p, lr, mode):
    """``exp_vgan.py:265-313`` (mode 'vae-gan') / ``exp_vae.py:326-375``
    (mode 'vae') per-batch schedules; gates forced on by the caller's
    eq=margin=100 for 'vae-gan', hard-coded dec-on/dis-off for 'vae'."""
    import torch

    dt = next(model.decoder.parameters()).dtype
    model.train()
    xf = torch.from_numpy(fmri).to(dt)
    gt = nchw(image).to(dt)
    opts = {}
    for name in ("encoder", "decoder", "discriminator"):
        o = torch.optim.RMSprop(getattr(model, name).parameters(), lr=lr,
                                alpha=0.9, eps=1e-8, weight_decay=0,
                                momentum=0, centered=False)
        warm_rmsprop(o)
        opts[name] = o
    mus, lv = model.encoder(xf)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(gt, x_tilde, x_p, "REC")
    disc_class = model.discriminator(gt, x_tilde, x_p, "GAN")
    nle, kld, mse, bo, bp, bs = type(model).loss(
        gt, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    if mode == "vae-gan":  # exp_vgan.py:265-267
        loss_encoder = torch.sum(kld) + torch.sum(mse)
        loss_discriminator = torch.sum(bo) + torch.sum(bp) + torch.sum(bs)
        loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                        - (1.0 - LAMBDA_MSE) * loss_discriminator)
        dec_clamp = 1.0  # :304 active
        train_dis = True
    else:  # 'vae', exp_vae.py:332-334
        loss_encoder = torch.sum(kld) + torch.sum(nle)
        loss_discriminator = torch.sum(bo) + torch.sum(bs)
        loss_decoder = torch.sum(LAMBDA_MSE * nle)
        dec_clamp = None  # :366 commented
        train_dis = False  # hard-coded :343
    ps, gs = group_grads(loss_encoder, model.encoder)
    apply_grads(opts["encoder"], ps, gs, clamp=1.0)  # :295 / :359 active
    ps, gs = group_grads(loss_decoder, model.decoder,
                         retain_graph=train_dis)
    apply_grads(opts["decoder"], ps, gs, clamp=dec_clamp)
    if train_dis:
        ps, gs = group_grads(loss_discriminator, model.discriminator,
                             retain_graph=False)
        apply_grads(opts["discriminator"], ps, gs, clamp=1.0)  # :312
    return {"loss_encoder": float(loss_encoder) / B,
            "loss_decoder": float(loss_decoder) / B,
            "loss_discriminator": float(loss_discriminator) / B}


def _scratch_run(scratch_base, cfg, mode, seed):
    from fmri_tpu.checkpoints.torch_import import convert_state_dict
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_exp import make_cognitive_scratch_step

    lr = cfg.train.learning_rate
    origin = convert_state_dict(to_dtype_sd(scratch_base), cfg,
                                kind="vae-gan-cognitive")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps, clip=1.0)
    opt_dec = (opt if mode == "vae-gan"
               else RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps))
    state = make_state(origin, {"encoder": opt, "decoder": opt_dec,
                                "discriminator": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(seed), _images(seed + 1)
    rng = jax.random.key(seed + 2)
    k_eps, k_zp = jax.random.split(rng)  # scratch step PRNG contract
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    step = make_cognitive_scratch_step(cfg, mode=mode, donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)}, rng,
        jnp.float32(100.0), jnp.float32(100.0), jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(scratch_base)
    t32 = _scratch_oracle(m32, fmri, image, eps, z_p, lr, mode)
    m64 = copy.deepcopy(scratch_base).double()
    _scratch_oracle(m64, fmri, image, eps, z_p, lr, mode)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=convert_state_dict(to_dtype_sd(m32), cfg,
                                           kind="vae-gan-cognitive"),
                after64=convert_state_dict(to_dtype_sd(m64), cfg,
                                           kind="vae-gan-cognitive"),
                torch32=t32, lr=lr)


@pytest.fixture(scope="module")
def scratch_vgan(scratch_base, cfg):
    return _scratch_run(scratch_base, cfg, "vae-gan", seed=40)


@pytest.fixture(scope="module")
def scratch_vae(scratch_base, cfg):
    return _scratch_run(scratch_base, cfg, "vae", seed=50)


def test_exp_vgan_losses_match(scratch_vgan):
    m, t = scratch_vgan["metrics"], scratch_vgan["torch32"]
    assert float(m["train_dec"]) == 1.0 and float(m["train_dis"]) == 1.0
    for k in ("loss_encoder", "loss_decoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_exp_vgan_updates_match(scratch_vgan):
    """All three groups train with clamp +-1 (exp_vgan clamps even the
    encoder, :295 — unlike the main stage-1 trainer).

    The encoder gets ratio=15: its feature-matching gradient routes through
    decoder AND discriminator stacks (the deepest chain of any oracle here)
    into a 3620-voxel fan-in fc whose per-element sums cancel
    catastrophically — the fp32 torch oracle itself lands 7e-2 (in lr units)
    from the fp64 truth on that leaf, and the JAX step's fp32 rounding is of
    the same kind but not bit-aligned, measured at ~6.7x the torch-fp32
    distance.  Structural errors (wrong term/sign/clamp) measure 100-1000x."""
    assert_updates_match(scratch_vgan["origin"],
                         scratch_vgan["state"].params,
                         scratch_vgan["after32"], scratch_vgan["after64"],
                         scratch_vgan["lr"],
                         ("decoder", "discriminator"), rel=0.08)
    assert_updates_match(scratch_vgan["origin"],
                         scratch_vgan["state"].params,
                         scratch_vgan["after32"], scratch_vgan["after64"],
                         scratch_vgan["lr"], ("encoder",), ratio=15.0,
                         rel=0.08)


def test_exp_vae_losses_match(scratch_vae):
    m, t = scratch_vae["metrics"], scratch_vae["torch32"]
    assert float(m["train_dec"]) == 1.0 and float(m["train_dis"]) == 0.0
    for k in ("loss_encoder", "loss_decoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_exp_vae_updates_match(scratch_vae):
    """Encoder (clamped) + decoder (UNclamped) train; the discriminator
    never updates (exp_vae.py:343 hard-codes train_dis=False) — params AND
    RMSprop moments must stay untouched on the JAX side too."""
    assert_updates_match(scratch_vae["origin"], scratch_vae["state"].params,
                         scratch_vae["after32"], scratch_vae["after64"],
                         scratch_vae["lr"], ("encoder", "decoder"), rel=0.08)
    o = leafdict(scratch_vae["origin"]["discriminator"]["params"])
    j = leafdict(scratch_vae["state"].params["discriminator"])
    t = leafdict(scratch_vae["after32"]["discriminator"]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
        np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")


# --------------------------------------------------------------------------
# exp_decoder.py — supervised fMRI->image decoder (pure MSE + Adam)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def expdec_base():
    """``exp_decoder.py:168-174``: a VaeGan decoder whose latent FC is
    replaced by Linear(voxels -> fc_flat, no bias) + BatchNorm1d + Tanh."""
    import torch
    from torch import nn

    ref_models, ref_cfg = import_reference()
    torch.manual_seed(27)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = ref_models.VaeGan(device="cpu", z_size=LATENT, recon_level=3)
    fc_flat = ref_cfg.fc_input * ref_cfg.fc_input * 256
    model.decoder.fc = nn.Sequential(
        nn.Linear(in_features=VOXELS, out_features=fc_flat, bias=False),
        nn.BatchNorm1d(num_features=fc_flat, momentum=0.9),
        nn.Tanh())
    with torch.no_grad():
        model.decoder.train()
        for _ in range(2):
            model.decoder(torch.randn(B, VOXELS))
        model.decoder.eval()
    return model


def _expdec_oracle(model, fmri, image, lr):
    """``exp_decoder.py:245-261``: x_tilde = decoder(fmri); MEAN-reduced
    MSELoss; Adam(lr=.01, betas .9/.999) single clean backward."""
    import torch
    from torch import nn

    dt = next(model.decoder.parameters()).dtype
    model.decoder.train()
    xf = torch.from_numpy(fmri).to(dt)
    gt = nchw(image).to(dt)
    opt = torch.optim.Adam(model.decoder.parameters(), lr=lr,
                           betas=(0.9, 0.999))
    warm_adam(opt)
    x_tilde = model.decoder(xf)
    loss = nn.MSELoss()(gt, x_tilde)
    model.zero_grad()
    loss.backward()
    opt.step()
    return {"loss_decoder": float(loss)}


@pytest.fixture(scope="module")
def expdec(expdec_base, cfg):
    import dataclasses

    from fmri_tpu.checkpoints.torch_import import convert_decoder
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import Adam
    from fmri_tpu.train.steps_exp import make_supervised_decoder_step

    lr = 0.01  # hard-coded (exp_decoder.py:213)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_voxels=VOXELS))
    origin = {"decoder": convert_decoder(to_dtype_sd(expdec_base), cfg,
                                         prefix="decoder.")}
    state = make_state(origin, {"decoder": Adam(b1=0.9, b2=0.999)})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(60), _images(61)
    step = make_supervised_decoder_step(cfg, donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)},
        jax.random.key(0))

    m32 = copy.deepcopy(expdec_base)
    t32 = _expdec_oracle(m32, fmri, image, lr)
    m64 = copy.deepcopy(expdec_base).double()
    _expdec_oracle(m64, fmri, image, lr)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32={"decoder": convert_decoder(
                    to_dtype_sd(m32), cfg, prefix="decoder.")},
                after64={"decoder": convert_decoder(
                    to_dtype_sd(m64), cfg, prefix="decoder.")},
                torch32=t32, lr=lr)


def test_expdec_loss_matches(expdec):
    np.testing.assert_allclose(float(expdec["metrics"]["loss_decoder"]),
                               expdec["torch32"]["loss_decoder"],
                               rtol=2e-5, atol=1e-6)


def test_expdec_update_matches(expdec):
    """Single-head Adam update over the voxel decoder matches."""
    assert_updates_match(expdec["origin"], expdec["state"].params,
                         expdec["after32"], expdec["after64"], expdec["lr"],
                         ("decoder",))


def test_expdec_bn_stats_match(expdec):
    j = leafdict(expdec["state"].batch_stats["decoder"])
    t = leafdict(expdec["after32"]["decoder"]["batch_stats"])
    for ks in j:
        np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=ks)
