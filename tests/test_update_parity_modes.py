"""Update-level oracle parity for the stage-1 loss-algebra MODES.

``test_update_parity.py`` proves the flagship ``mode='vae-gan'`` per-batch
update rule against the reference executed read-only.  The stage-1 trainer
has three more modes selecting different loss algebras and pre-gate defaults
(``train_vgan_stage1.py:358-387``):

  * ``beta-vae`` — ``L_enc = sum(kld) * beta / batch_size + sum(mse)``; the
    decoder/discriminator heads equal 'vae-gan' (``:358-365``);
  * ``dcgan``    — visual encoder frozen (``:375-378``), ``L_dis`` drops the
    predicted term, ``L_dec`` swaps feature-matching mse for pixel nle
    (``:374-381``);
  * ``vae``      — ``L_dec = lambda * nle`` only, ``L_dis`` drops the
    predicted term, and ``train_dis = False`` is set BEFORE the equilibrium
    gate (``:383-388``) — which the both-off rule can then override
    (``:402-404``): with the decoder gated off, BOTH heads re-enable.

plus the stage-2 trainer's ``--mode vae`` variant, which rebuilds the model
teacherless (``train_vgan_stage2.py:234-238``) while the hard-coded
``train_dis = True, train_dec = False`` after the mode blocks (``:375-376``)
makes its mode-block ``train_dis = False`` dead code.

Each mode here gets the same treatment as the flagship: the reference's own
``models/vae_gan.py`` runs the per-batch schedule (historical semantics:
per-group grads at original weights) at fp32 AND fp64, and the fused JAX
step's post-step parameters must match the oracle.

Tolerance contract (``REL`` below): every stage-1 gradient routes through
COMPUTED deep-stack activations (decoded images into the discriminator, the
pixel nle through the 20-layer decoder), so legitimate cross-framework fp32
forward noise (~1e-4 on activations; different conv tilings/accumulation
order) is amplified into the updates beyond the two torch runs' mutual
distance — they share bit-identical forward composition and so cannot see
it (same analysis as ``test_update_parity.py::test_vgan2_updates_match``,
rel=0.08).  Measured worst case across these fixtures is 1.0% of the leaf's
largest fp64 update (betavae decoder); ``REL = 0.03`` gives 3x headroom
while staying 10-60x below structural-error scale (a wrong term, sign,
clamp, lr or gate shows up at 0.3-2 relative).  The one exception is the
'vae'-mode ENCODER (kld + pixel-nle through the full decoder stack): its
error is heavy-tailed — bulk/median at 0.02% of the leaf's max update but
144 of Dense_0's 44.3M elements (3e-6 of the leaf) reach 1-4.3%, the
signature of ReLU-mask flips at near-zero activations under ~1e-4
cross-framework activation noise (a flipped mask is a finite jump in ONE
gradient element).  That test uses rel=0.05 for the max and pins the bulk
at median <= 0.2% so outliers cannot hide a uniform shift.  The mode
ALGEBRA is pinned
noise-free elsewhere: per-mode loss equality at 2e-5 (below), per-mode
spliced==naive (``test_steps.py::TestSplicedBackward`` — the naive backward
is the literal ``jax.vjp`` of the loss), and the flagship 'vae-gan' pass at
the default conditioning-calibrated bound.  Measurement contract details:
``tests/ref_oracle.py``.
"""

from __future__ import annotations

import copy
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import (
    REF, apply_grads, assert_updates_match, group_grads, import_reference,
    leafdict, nchw, to_dtype_sd, warm_jax_opt_state, warm_rmsprop,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available")

B = 4
LATENT = 512
LAMBDA_MSE = 1e-6
BETA = 5.0  # the reference's --beta is 1.0 by default (gan_config.py:32);
            # a non-trivial value makes the beta path distinguishable
REL = 0.03  # fp32 forward-noise amplification bound — see module docstring


@pytest.fixture(scope="module")
def vgan_base():
    """Seeded reference VaeGan, BN stats ticked by train-mode forwards
    (same construction as test_update_parity.py::vgan_base)."""
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

    return get_config("res100")


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
# Stage-I mode oracle (train_vgan_stage1.py:316-432, verbatim algebra)
# --------------------------------------------------------------------------


def _stage1_mode_oracle(model, x, eps, z_p, lr, mode, equilibrium, margin):
    """The reference's stage-1 per-batch schedule for any ``args.mode``:
    forward (``vae_gan.py:275-287``), the mode's loss block (``:358-388``),
    the equilibrium/margin gate (``:396-404``), then the selective backwards
    with historical (grads-at-original-weights) semantics (``:406-432``)."""
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

    train_dis = train_dec = train_enc = True          # :351-355
    if mode == "beta-vae":                            # :358-365
        kld_weight = 1.0 / B
        loss_encoder = torch.sum(kld) * BETA * kld_weight + torch.sum(mse)
        loss_discriminator = (torch.sum(bo) + torch.sum(bp) + torch.sum(bs))
        loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                        - (1.0 - LAMBDA_MSE) * loss_discriminator)
    elif mode == "vae-gan":                           # :367-372
        loss_encoder = torch.sum(kld) + torch.sum(mse)
        loss_discriminator = (torch.sum(bo) + torch.sum(bp) + torch.sum(bs))
        loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                        - (1.0 - LAMBDA_MSE) * loss_discriminator)
    elif mode == "dcgan":                             # :374-381
        train_enc = False  # requires_grad flip at :376-378 is post-forward,
        # so this batch's graph (and all grad VALUES) are unchanged; the only
        # effect is that optimizer_encoder never steps.
        loss_encoder = torch.sum(kld) + torch.sum(nle)
        loss_discriminator = torch.sum(bo) + torch.sum(bs)
        loss_decoder = (torch.sum(LAMBDA_MSE * nle)
                        - (1.0 - LAMBDA_MSE) * loss_discriminator)
    elif mode == "vae":                               # :383-388
        loss_encoder = torch.sum(kld) + torch.sum(nle)
        loss_discriminator = torch.sum(bo) + torch.sum(bs)
        loss_decoder = torch.sum(LAMBDA_MSE * nle)
        train_dis = False
    else:
        raise ValueError(mode)

    # equilibrium/margin gate (:396-404) — the bce means gate ALL modes,
    # including ones whose L_dis dropped the predicted term
    m_orig, m_pred = float(bo.mean()), float(bp.mean())
    if m_orig < equilibrium - margin or m_pred < equilibrium - margin:
        train_dis = False
    if m_orig > equilibrium + margin or m_pred > equilibrium + margin:
        train_dec = False
    if train_dec is False and train_dis is False:
        train_dis = True
        train_dec = True

    if train_enc:                                     # :410-418
        ps, gs = group_grads(loss_encoder, model.encoder)
        apply_grads(opts["encoder"], ps, gs)
    if train_dec:                                     # :421-426
        ps, gs = group_grads(loss_decoder, model.decoder)
        apply_grads(opts["decoder"], ps, gs)
    if train_dis:                                     # :429-432
        ps, gs = group_grads(loss_discriminator, model.discriminator,
                             retain_graph=False)
        apply_grads(opts["discriminator"], ps, gs)
    return {
        "loss_encoder": float(loss_encoder) / B,
        "loss_decoder": float(loss_decoder) / B,
        "loss_discriminator": float(loss_discriminator) / B,
        "train_dec": float(train_dec),
        "train_dis": float(train_dis),
    }


def _mode_run(vgan_base, cfg, mode, seed, equilibrium, margin):
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_stage1_step

    if mode == "beta-vae":
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, beta=BETA))
    lr = cfg.train.learning_rate
    origin = _converted(vgan_base, cfg, "vae-gan")
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps)
    # dcgan mode freezes the visual encoder — no optimizer entry (the
    # framework's frozen-group contract); other modes optimize all three
    names = (("decoder", "discriminator") if mode == "dcgan"
             else ("encoder", "decoder", "discriminator"))
    state = make_state(origin, {k: opt for k in names})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    x = _images(seed)
    rng = jax.random.key(seed + 1)
    k_eps, k_zp = jax.random.split(rng)  # stage-1 step PRNG contract
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    step = make_vgan_stage1_step(cfg, mode=mode, donate=False)
    new_state, metrics = step.train_step(
        state, jnp.asarray(x), rng, jnp.float32(margin),
        jnp.float32(equilibrium), jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(vgan_base)
    t32 = _stage1_mode_oracle(m32, x, eps, z_p, lr, mode, equilibrium, margin)
    m64 = copy.deepcopy(vgan_base).double()
    t64 = _stage1_mode_oracle(m64, x, eps, z_p, lr, mode, equilibrium, margin)
    assert (t32["train_dec"], t32["train_dis"]) == (
        t64["train_dec"], t64["train_dis"])
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=_converted(m32, cfg, "vae-gan"),
                after64=_converted(m64, cfg, "vae-gan"),
                torch32=t32, lr=lr)


@pytest.fixture(scope="module")
def betavae(vgan_base, cfg):
    return _mode_run(vgan_base, cfg, "beta-vae", seed=60,
                     equilibrium=100.0, margin=100.0)


@pytest.fixture(scope="module")
def dcganmode(vgan_base, cfg):
    return _mode_run(vgan_base, cfg, "dcgan", seed=70,
                     equilibrium=100.0, margin=100.0)


@pytest.fixture(scope="module")
def vaemode(vgan_base, cfg):
    # eq=margin=100 leaves the gate inert: train_dec stays True and the
    # mode's pre-gate train_dis=False survives (no both-off flip)
    return _mode_run(vgan_base, cfg, "vae", seed=80,
                     equilibrium=100.0, margin=100.0)


@pytest.fixture(scope="module")
def vaemode_flip(vgan_base, cfg):
    # eq+margin=0.015 << mean bce (~0.7 at near-chance scores) forces
    # train_dec=False; with the mode's train_dis=False that is the both-off
    # state, so the reference re-enables BOTH (:402-404)
    return _mode_run(vgan_base, cfg, "vae", seed=90,
                     equilibrium=0.01, margin=0.005)


def _assert_losses(run, keys=("loss_encoder", "loss_decoder",
                              "loss_discriminator")):
    m, t = run["metrics"], run["torch32"]
    assert float(m["train_dec"]) == t["train_dec"]
    assert float(m["train_dis"]) == t["train_dis"]
    for k in keys:
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def _assert_group_untouched(run, grp):
    o = leafdict(run["origin"][grp]["params"])
    j = leafdict(run["state"].params[grp])
    t = leafdict(run["after32"][grp]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {grp}{ks}")
        np.testing.assert_array_equal(t[ks], o[ks],
                                      err_msg=f"torch {grp}{ks}")


# ------------------------------- beta-vae ---------------------------------


def test_betavae_losses_match(betavae):
    _assert_losses(betavae)


def test_betavae_updates_match(betavae):
    """All three groups update; the encoder's kld term carries the
    beta/batch_size weight (distinguishable from 'vae-gan' at BETA=5)."""
    assert_updates_match(betavae["origin"], betavae["state"].params,
                         betavae["after32"], betavae["after64"],
                         betavae["lr"], ("encoder", "decoder",
                                         "discriminator"), rel=REL)


# -------------------------------- dcgan -----------------------------------


def test_dcgan_mode_losses_match(dcganmode):
    _assert_losses(dcganmode)


def test_dcgan_mode_updates_match(dcganmode):
    """Decoder + discriminator update (nle-based L_dec, no predicted term in
    L_dis); the visual encoder must stay bit-untouched on both sides."""
    assert_updates_match(dcganmode["origin"], dcganmode["state"].params,
                         dcganmode["after32"], dcganmode["after64"],
                         dcganmode["lr"], ("decoder", "discriminator"),
                         rel=REL)
    _assert_group_untouched(dcganmode, "encoder")


def test_dcgan_mode_encoder_bn_still_ticks(dcganmode):
    """Freezing the encoder's PARAMS does not freeze its BatchNorm running
    stats: the reference's full train-mode forward ticks them every batch
    regardless of the requires_grad flip (:376-378).  Pin that the fused
    step does the same."""
    o = leafdict(dcganmode["origin"]["encoder"]["batch_stats"])
    j = leafdict(dcganmode["state"].batch_stats["encoder"])
    t = leafdict(dcganmode["after32"]["encoder"]["batch_stats"])
    moved = False
    for ks in j:
        np.testing.assert_allclose(j[ks], t[ks], rtol=2e-4, atol=2e-4,
                                   err_msg=ks)
        moved = moved or not np.array_equal(j[ks], o[ks])
    assert moved, "encoder BN stats never ticked"


# --------------------------------- vae ------------------------------------


def test_vae_mode_losses_match(vaemode):
    m = vaemode["metrics"]
    assert (float(m["train_dec"]), float(m["train_dis"])) == (1.0, 0.0)
    _assert_losses(vaemode)


def test_vae_mode_updates_match(vaemode):
    """Encoder (kld+nle) and decoder (lambda*nle only — no GAN term) update;
    the discriminator must stay bit-untouched on both sides, with its
    RMSprop moments frozen too (a skipped ``optimizer.step()``).

    The encoder bound is rel=0.05 with an explicit bulk pin (module
    docstring: heavy-tail ReLU-mask-flip outliers at 3e-6 of the leaf,
    median agreement at 0.02% of the max update)."""
    assert_updates_match(vaemode["origin"], vaemode["state"].params,
                         vaemode["after32"], vaemode["after64"],
                         vaemode["lr"], ("encoder", "decoder"), rel=0.05)
    # bulk pin: the MEDIAN elementwise error must sit at noise scale —
    # a structural error (wrong term/weight) shifts the whole leaf, not
    # a 1e-6 fraction of it
    o = leafdict(vaemode["origin"]["encoder"]["params"])
    j = leafdict(vaemode["state"].params["encoder"])
    t64 = leafdict(vaemode["after64"]["encoder"]["params"])
    for ks in j:
        err = np.abs((j[ks] - o[ks]) - (t64[ks] - o[ks]))
        bound = 0.002 * float(np.abs(t64[ks] - o[ks]).max()) + 1e-9
        assert float(np.median(err)) <= bound, (
            f"encoder{ks}: bulk (median) error {float(np.median(err)):.3e} "
            f"above noise scale {bound:.3e}")
    _assert_group_untouched(vaemode, "discriminator")
    for ks, leaf in leafdict(
            vaemode["state"].opt_state["discriminator"].sq_avg).items():
        np.testing.assert_array_equal(leaf, np.ones_like(leaf),
                                      err_msg=f"moment ticked: {ks}")


def test_vae_mode_both_off_flip(vaemode_flip):
    """The 'vae'-mode quirk: when the gate also disables the decoder, the
    both-off rule re-enables BOTH heads (:402-404) — so 'vae' mode DOES
    train its discriminator whenever the bce means exceed eq+margin.  All
    three groups must match the oracle."""
    t = vaemode_flip["torch32"]
    assert (t["train_dec"], t["train_dis"]) == (1.0, 1.0)
    _assert_losses(vaemode_flip)
    assert_updates_match(vaemode_flip["origin"], vaemode_flip["state"].params,
                         vaemode_flip["after32"], vaemode_flip["after64"],
                         vaemode_flip["lr"], ("encoder", "decoder",
                                              "discriminator"), rel=REL)


# --------------------------------------------------------------------------
# Stage-II '--mode vae' (teacherless, train_vgan_stage2.py:234-238)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vgan2vae_base(vgan_base):
    """VaeGanCognitive as the stage-2 trainer's ``--mode vae`` branch builds
    it (``train_vgan_stage2.py:235-238``): fresh cognitive encoder, decoder
    and discriminator shared with the stage-1 model, ``teacher_net=None``."""
    import torch

    ref_models, _ = import_reference()
    torch.manual_seed(6)
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
        discriminator=teacher.discriminator, teacher_net=None,
        z_size=LATENT, stage=2)
    for p in teacher.decoder.parameters():  # :222-223
        p.requires_grad = False
    return model


def _vgan2vae_oracle(model, fmri, image, eps, z_p, lr):
    """Stage-2 '--mode vae' per-batch schedule: teacherless forward
    (``vae_gan.py:352-395`` with ``teacher_net=None`` -> gt_x = the raw
    image), 'vae' loss block (``train_vgan_stage2.py:361-365``), then the
    hard-coded ``train_dis=True, train_dec=False`` (``:375-376``) that
    overrides the mode block's ``train_dis=False`` — encoder and
    discriminator update with elementwise grad clamp +-1 (``:389-407``)."""
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
    mus, lv = model.encoder(xf)
    z = torch.from_numpy(eps).to(dt) * (0.5 * lv).exp() + mus
    x_tilde = model.decoder(z)
    x_p = model.decoder(torch.from_numpy(z_p).to(dt))
    disc_layer = model.discriminator(gt, x_tilde, x_p, "REC")
    disc_class = model.discriminator(gt, x_tilde, x_p, "GAN")
    nle, kld, mse, bo, bp, bs = type(model).loss(
        gt, x_tilde, disc_layer[:B], disc_layer[B:2 * B], disc_layer[2 * B:],
        disc_class[:B], disc_class[B:2 * B], disc_class[2 * B:], mus, lv)
    loss_encoder = torch.sum(kld) + torch.sum(nle)       # :362
    loss_discriminator = torch.sum(bo) + torch.sum(bs)   # :363
    loss_decoder = torch.sum(LAMBDA_MSE * nle)           # :364 (never used)
    ps, gs = group_grads(loss_encoder, model.encoder)
    apply_grads(opts["encoder"], ps, gs, clamp=1.0)      # :389-393
    ps, gs = group_grads(loss_discriminator, model.discriminator,
                         retain_graph=False)
    apply_grads(opts["discriminator"], ps, gs, clamp=1.0)  # :404-407
    return {"loss_encoder": float(loss_encoder) / B,
            "loss_decoder": float(loss_decoder) / B,
            "loss_discriminator": float(loss_discriminator) / B}


@pytest.fixture(scope="module")
def vgan2vae(vgan2vae_base, cfg):
    from fmri_tpu.train import make_state
    from fmri_tpu.train.optim import RmsProp
    from fmri_tpu.train.steps_vgan import make_vgan_cognitive_step

    lr = cfg.train.learning_rate
    origin = _converted(vgan2vae_base, cfg, "vae-gan-cognitive")
    assert "teacher_encoder" not in origin
    opt = RmsProp(decay=cfg.train.rms_decay, eps=cfg.train.rms_eps, clip=1.0)
    state = make_state(origin, {"encoder": opt, "discriminator": opt})
    state = state.replace(opt_state=warm_jax_opt_state(state.opt_state))

    fmri, image = _fmri(7, cfg), _images(8)
    rng = jax.random.key(99)
    # the cognitive step always splits 3 keys; k_t is unused teacherless
    k_eps, _k_t, k_zp = jax.random.split(rng, 3)
    eps = np.asarray(jax.random.normal(k_eps, (B, LATENT), jnp.float32))
    z_p = np.asarray(jax.random.normal(k_zp, (B, LATENT), jnp.float32))

    step = make_vgan_cognitive_step(cfg, stage=2, mode="vae",
                                    use_teacher=False, donate=False)
    new_state, metrics = step.train_step(
        state, {"fmri": jnp.asarray(fmri), "image": jnp.asarray(image)}, rng,
        jnp.float32(0.35), jnp.float32(0.68), jnp.float32(LAMBDA_MSE))

    m32 = copy.deepcopy(vgan2vae_base)
    t32 = _vgan2vae_oracle(m32, fmri, image, eps, z_p, lr)
    m64 = copy.deepcopy(vgan2vae_base).double()
    _vgan2vae_oracle(m64, fmri, image, eps, z_p, lr)
    return dict(origin=origin, state=new_state, metrics=metrics,
                after32=_converted(m32, cfg, "vae-gan-cognitive"),
                after64=_converted(m64, cfg, "vae-gan-cognitive"),
                torch32=t32, lr=lr)


def test_vgan2_vae_losses_match(vgan2vae):
    m, t = vgan2vae["metrics"], vgan2vae["torch32"]
    assert (float(m["train_dec"]), float(m["train_dis"])) == (0.0, 1.0)
    for k in ("loss_encoder", "loss_decoder", "loss_discriminator"):
        np.testing.assert_allclose(float(m[k]), t[k], rtol=2e-5, atol=1e-5)


def test_vgan2_vae_updates_match(vgan2vae):
    """Encoder (kld+nle vs the RAW image — no teacher recon) and
    discriminator (no predicted term) update with clamp +-1; the shared
    decoder stays bit-frozen on both sides.

    rel bound as in test_vgan2_updates_match: the stage-2 adversarial
    gradients route through decoded images, so legitimate cross-framework
    fp32 forward noise is amplified beyond the two torch runs' mutual
    distance (they share bit-identical forward composition)."""
    assert_updates_match(vgan2vae["origin"], vgan2vae["state"].params,
                         vgan2vae["after32"], vgan2vae["after64"],
                         vgan2vae["lr"], ("encoder", "discriminator"),
                         rel=0.08)
    o = leafdict(vgan2vae["origin"]["decoder"]["params"])
    j = leafdict(vgan2vae["state"].params["decoder"])
    t = leafdict(vgan2vae["after32"]["decoder"]["params"])
    for ks in j:
        np.testing.assert_array_equal(j[ks], o[ks], err_msg=f"jax {ks}")
        np.testing.assert_array_equal(t[ks], o[ks], err_msg=f"torch {ks}")
