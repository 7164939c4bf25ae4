"""Stage builders: assemble (TrainState, StepFns, Trainer kwargs) per stage.

One builder per reference trainer script (SURVEY.md §2.3):

  * ``vgan_stage1``   — ``train/train_vgan_stage1.py`` (Dual-VAE/GAN on images)
  * ``vgan_stage2``   — ``train/train_vgan_stage2.py`` (cognitive, distillation)
  * ``vgan_stage3``   — ``train/train_vgan_stage3.py`` (decoder fine-tune)
  * ``wae_stage1``    — ``train/train_wae_stage1.py``  (WAE/GAN on images)
  * ``wae_stage2``    — ``train/train_wae_stage2.py``  (cognitive latent align)
  * ``wae_stage3``    — ``train/train_wae_stage3.py``  (decoder recon fine-tune)
  * ``wae_vgan_stage1`` — ``train/wae_vgan_stage1.py`` (WAE/Dual-GAN)

Cross-stage handoff follows the reference's checkpoint-mediated contract
(``gan_config.py:45-69``): each builder takes the previous stage's checkpoint
directory and grafts the required groups (``fmri_tpu.checkpoints``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from fmri_tpu.checkpoints.store import graft_groups, load_groups
from fmri_tpu.configs.presets import Config
from fmri_tpu.train.optim import Adam, RmsProp, exponential_lr, step_lr
from fmri_tpu.train.state import (
    TrainState, init_cognitive, init_latent_disc, init_vaegan, make_state,
)
from fmri_tpu.train.steps_vgan import (
    StepFns, make_vgan_cognitive_step, make_vgan_stage1_step,
)
from fmri_tpu.train.steps_wae import (
    make_wae_cognitive_step, make_wae_stage1_step, make_wae_vgan_step,
)

Built = Tuple[TrainState, StepFns, Dict[str, Any]]


def _groups_of(raw: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    return {k: {"params": raw["params"][k], "batch_stats": raw["batch_stats"][k]}
            for k in raw["params"]}


def _templates(groups: Dict[str, Dict[str, Any]]) -> Dict[str, Dict[str, Any]]:
    return groups


# --------------------------- Dual-VAE/GAN family ---------------------------


def vgan_stage1(cfg: Config, *, mode: str = "vae-gan", steps_per_epoch: int,
                seed: int = 8, donate: bool = True) -> Built:
    """Stage-I VAE/GAN: fresh triplet, 3x RMSprop + per-epoch ExponentialLR
    (``train_vgan_stage1.py:237,275-283``)."""
    t = cfg.train
    sched = exponential_lr(t.learning_rate, t.decay_lr, steps_per_epoch)
    steps = make_vgan_stage1_step(cfg, mode, lr_schedule=sched, donate=donate)
    groups = _groups_of(init_vaegan(jax.random.key(seed), cfg))
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=t.grad_clip)
    state = make_state(groups, {k: opt for k in groups})
    kwargs = dict(data_kind="image", uses_gate=True, eval_sample=True,
                  augment=dict(flip=True, max_shift=0))
    return state, steps, kwargs


def vgan_stage2(cfg: Config, stage1_ckpt: str, *, mode: str = "vae-gan",
                use_teacher: bool = True, steps_per_epoch: int,
                seed: int = 8, epoch: Optional[int] = None,
                donate: bool = True) -> Built:
    """Stage-II cognitive: fresh CognitiveEncoder; decoder, discriminator and
    teacher encoder from the Stage-I checkpoint; decoder + teacher frozen;
    grad clamp +-1 on the trained groups (``train_vgan_stage2.py:213-232,
    328-329,391,406``).  ``--mode vae`` drops the teacher (``:234-238``)."""
    t = cfg.train
    sched = exponential_lr(t.learning_rate, t.decay_lr, steps_per_epoch)
    steps = make_vgan_cognitive_step(cfg, 2, mode, use_teacher=use_teacher,
                                     lr_schedule=sched, donate=donate)
    cog = init_cognitive(jax.random.key(seed), cfg)
    ref = init_vaegan(jax.random.key(seed), cfg)
    loaded = load_groups(stage1_ckpt, ["encoder", "decoder", "discriminator"],
                         _templates(_groups_of(ref)), epoch=epoch)
    groups = graft_groups({"encoder": cog}, loaded, {
        "decoder": "decoder", "discriminator": "discriminator",
        "teacher_encoder": "encoder"})
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)
    state = make_state(groups, {"encoder": opt, "discriminator": opt})
    kwargs = dict(data_kind="pair", uses_gate=True, eval_sample=True,
                  augment=dict(flip=False, max_shift=cfg.data.max_shift))
    return state, steps, kwargs


def vgan_stage3(cfg: Config, stage2_ckpt: str, *, mode: str = "vae-gan",
                steps_per_epoch: int, seed: int = 8,
                epoch: Optional[int] = None, donate: bool = True) -> Built:
    """Stage-III: the full Stage-II graph reloaded; cognitive encoder frozen;
    decoder + discriminator trained with the equilibrium gate
    (``train_vgan_stage3.py:241-245,329-334,382-388``)."""
    t = cfg.train
    sched = exponential_lr(t.learning_rate, t.decay_lr, steps_per_epoch)
    steps = make_vgan_cognitive_step(cfg, 3, mode, use_teacher=False,
                                     lr_schedule=sched, donate=donate)
    names = ["encoder", "decoder", "discriminator", "teacher_encoder"]
    loaded = load_groups(stage2_ckpt, names, {}, epoch=epoch)
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)
    state = make_state(loaded, {"decoder": opt, "discriminator": opt})
    kwargs = dict(data_kind="pair", uses_gate=True, eval_sample=True,
                  augment=dict(flip=False, max_shift=cfg.data.max_shift))
    return state, steps, kwargs


# --------------------------- WAE/GAN family ---------------------------


def wae_stage1(cfg: Config, *, steps_per_epoch: int, seed: int = 8,
               donate: bool = True) -> Built:
    """Stage-I WAE/GAN: fresh encoder/decoder/latent-D, Adam(0.5, 0.999) with
    the D at 0.5x lr, StepLR(30, 0.5) (``train_wae_stage1.py:221-228``)."""
    t = cfg.train
    sched = step_lr(t.learning_rate, t.step_size, t.step_gamma, steps_per_epoch)
    steps = make_wae_stage1_step(cfg, lr_schedule=sched, donate=donate)
    k1, k2 = jax.random.split(jax.random.key(seed))
    groups = _groups_of(init_vaegan(k1, cfg))
    del groups["discriminator"]  # no image discriminator in the WAE family
    groups["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
    opt = Adam(b1=t.adam_b1, b2=t.adam_b2)
    state = make_state(groups, {k: opt for k in groups})
    kwargs = dict(data_kind="image", uses_gate=False, eval_sample=False,
                  augment=dict(flip=True, max_shift=0))
    return state, steps, kwargs


def wae_stage2(cfg: Config, stage1_ckpt: str, *, steps_per_epoch: int,
               seed: int = 8, epoch: Optional[int] = None,
               donate: bool = True) -> Built:
    """Stage-II cognitive WAE: fresh CognitiveEncoder + fresh latent D
    (N(0, .01) ctor init); Stage-I encoder becomes the frozen teacher and the
    Stage-I decoder is shared frozen (``train_wae_stage2.py:196-202``).
    Optimizer lrs hard-coded 1e-3/1e-3/5e-4 + StepLR(30, .5) (``:237-243``)."""
    steps = make_wae_cognitive_step(
        cfg, 2,
        lr_schedule_enc=step_lr(1e-3, 30, 0.5, steps_per_epoch),
        lr_schedule_dec=step_lr(1e-3, 30, 0.5, steps_per_epoch),
        lr_schedule_disc=step_lr(5e-4, 30, 0.5, steps_per_epoch),
        donate=donate)
    k1, k2 = jax.random.split(jax.random.key(seed))
    cog = init_cognitive(k1, cfg)
    loaded = load_groups(stage1_ckpt, ["encoder", "decoder"], {}, epoch=epoch)
    groups = graft_groups({"encoder": cog}, loaded, {
        "decoder": "decoder", "teacher_encoder": "encoder"})
    groups["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="normal")
    opt = Adam(b1=0.5, b2=0.999)
    state = make_state(groups, {"encoder": opt, "latent_disc": opt})
    kwargs = dict(data_kind="pair", uses_gate=False, eval_sample=False,
                  augment=dict(flip=False, max_shift=cfg.data.max_shift))
    return state, steps, kwargs


def wae_stage3(cfg: Config, stage2_ckpt: str, stage1_ckpt: str, *,
               steps_per_epoch: int, seed: int = 8,
               epoch: Optional[int] = None, donate: bool = True) -> Built:
    """Stage-III WAE: cognitive encoder + decoder from Stage II (encoder
    frozen), teacher encoder from Stage I, **fresh** latent D (the reference
    rebuilds ``WaeGanCognitive`` whose ctor makes a new ``WaeDiscriminator``,
    ``train_wae_stage3.py:212-223``); decoder trained on pure recon MSE."""
    steps = make_wae_cognitive_step(
        cfg, 3,
        lr_schedule_enc=step_lr(1e-3, 30, 0.5, steps_per_epoch),
        lr_schedule_dec=step_lr(1e-3, 30, 0.5, steps_per_epoch),
        lr_schedule_disc=step_lr(5e-4, 30, 0.5, steps_per_epoch),
        donate=donate)
    from_s2 = load_groups(stage2_ckpt, ["encoder", "decoder"], {}, epoch=epoch)
    from_s1 = load_groups(stage1_ckpt, ["encoder"], {})
    groups = graft_groups({}, from_s2, {"encoder": "encoder", "decoder": "decoder"})
    groups = graft_groups(groups, from_s1, {"teacher_encoder": "encoder"})
    groups["latent_disc"] = init_latent_disc(
        jax.random.key(seed), cfg, init_scheme="normal")
    opt = Adam(b1=0.5, b2=0.999)
    state = make_state(groups, {"decoder": opt, "latent_disc": opt})
    kwargs = dict(data_kind="pair", uses_gate=False, eval_sample=False,
                  augment=dict(flip=False, max_shift=cfg.data.max_shift))
    return state, steps, kwargs


# --------------------------- WAE/Dual-GAN ---------------------------


def wae_vgan_stage1(cfg: Config, *, mode: str = "vae-gan",
                    steps_per_epoch: int, seed: int = 8,
                    donate: bool = True) -> Built:
    """Stage-I WAE/Dual-GAN: VAE/GAN triplet + latent discriminator, all
    RMSprop (``wae_vgan_stage1.py:199-200,243-250``)."""
    t = cfg.train
    sched = exponential_lr(t.learning_rate, t.decay_lr, steps_per_epoch)
    steps = make_wae_vgan_step(cfg, mode, lr_schedule=sched, donate=donate)
    k1, k2 = jax.random.split(jax.random.key(seed))
    groups = _groups_of(init_vaegan(k1, cfg))
    groups["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=t.grad_clip)
    state = make_state(groups, {k: opt for k in groups})
    kwargs = dict(data_kind="image", uses_gate=True, eval_sample=True,
                  augment=dict(flip=True, max_shift=0))
    return state, steps, kwargs


# --------------------------- experiments (ablations) ---------------------------


def exp_decoder(cfg: Config, *, steps_per_epoch: int, seed: int = 8,
                donate: bool = True) -> Built:
    """Supervised decoder ablation (``experiments/exp_decoder.py``)."""
    from fmri_tpu.train.state import init_voxel_decoder
    from fmri_tpu.train.steps_exp import make_supervised_decoder_step

    t = cfg.train
    sched = exponential_lr(0.01, t.decay_lr, steps_per_epoch)  # Adam lr .01 (:253)
    steps = make_supervised_decoder_step(cfg, lr_schedule=sched, donate=donate)
    groups = {"decoder": init_voxel_decoder(jax.random.key(seed), cfg)}
    state = make_state(groups, {"decoder": Adam(b1=0.9, b2=0.999)})
    kwargs = dict(data_kind="pair", uses_gate=False, eval_sample=False,
                  augment=dict(flip=False, max_shift=cfg.data.max_shift))
    return state, steps, kwargs


def _exp_cognitive_scratch(cfg: Config, mode: str, *, steps_per_epoch: int,
                           seed: int, donate: bool) -> Built:
    from fmri_tpu.train.steps_exp import make_cognitive_scratch_step

    t = cfg.train
    sched = exponential_lr(t.learning_rate, t.decay_lr, steps_per_epoch)
    steps = make_cognitive_scratch_step(cfg, mode, lr_schedule=sched,
                                        donate=donate)
    k1, k2 = jax.random.split(jax.random.key(seed))
    groups = _groups_of(init_vaegan(k1, cfg))
    del groups["encoder"]  # replace the visual encoder with a cognitive one
    groups["encoder"] = init_cognitive(k2, cfg)
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)
    state = make_state(groups, {k: opt for k in groups})
    kwargs = dict(data_kind="pair", uses_gate=True, eval_sample=True,
                  augment=dict(flip=False, max_shift=cfg.data.max_shift))
    return state, steps, kwargs


def exp_vae(cfg: Config, *, steps_per_epoch: int, seed: int = 8,
            donate: bool = True) -> Built:
    """Cognitive Dual-VAE without distillation (``experiments/exp_vae.py``)."""
    return _exp_cognitive_scratch(cfg, "vae", steps_per_epoch=steps_per_epoch,
                                  seed=seed, donate=donate)


def exp_vgan(cfg: Config, *, steps_per_epoch: int, seed: int = 8,
             donate: bool = True) -> Built:
    """Dual-VAE/GAN on BOLD from scratch (``experiments/exp_vgan.py``)."""
    return _exp_cognitive_scratch(cfg, "vae-gan", steps_per_epoch=steps_per_epoch,
                                  seed=seed, donate=donate)


def exp_dcgan_stage1(cfg: Config, *, steps_per_epoch: int, seed: int = 8,
                     donate: bool = True) -> Built:
    """Plain DCGAN on images (``experiments/exp_dcgan_stage1.py``)."""
    from fmri_tpu.train.steps_exp import make_dcgan_stage1_step

    t = cfg.train
    sched = exponential_lr(t.learning_rate, t.decay_lr, steps_per_epoch)
    steps = make_dcgan_stage1_step(cfg, lr_schedule=sched, donate=donate)
    groups = _groups_of(init_vaegan(jax.random.key(seed), cfg))
    del groups["encoder"]
    opt = RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)
    state = make_state(groups, {k: opt for k in groups})
    kwargs = dict(data_kind="image", uses_gate=True, eval_sample=True,
                  augment=dict(flip=True, max_shift=0))
    return state, steps, kwargs


def exp_dcgan_stage2(cfg: Config, stage1_ckpt: str, *, steps_per_epoch: int,
                     seed: int = 8, epoch: Optional[int] = None,
                     donate: bool = True) -> Built:
    """Cognitive encoder over a stage-1 DCGAN generator
    (``experiments/exp_dcgan_stage2.py``): decoder + discriminator from the
    DCGAN checkpoint; decoder (no clamp) + discriminator (clamp +-1) update,
    encoder frozen (see steps_exp — the reference's decoder-freeze loop is
    commented out at ``exp_dcgan_stage2.py:281-283``)."""
    from fmri_tpu.train.steps_exp import make_dcgan_stage2_step

    t = cfg.train
    sched = exponential_lr(t.learning_rate, t.decay_lr, steps_per_epoch)
    steps = make_dcgan_stage2_step(cfg, lr_schedule=sched, donate=donate)
    cog = init_cognitive(jax.random.key(seed), cfg)
    loaded = load_groups(stage1_ckpt, ["decoder", "discriminator"], {},
                         epoch=epoch)
    groups = graft_groups({"encoder": cog}, loaded, {
        "decoder": "decoder", "discriminator": "discriminator"})
    state = make_state(groups, {
        "decoder": RmsProp(decay=t.rms_decay, eps=t.rms_eps),
        "discriminator": RmsProp(decay=t.rms_decay, eps=t.rms_eps, clip=1.0)})
    kwargs = dict(data_kind="pair", uses_gate=True, eval_sample=True,
                  augment=dict(flip=False, max_shift=cfg.data.max_shift))
    return state, steps, kwargs


BUILDERS = {
    "vgan_stage1": vgan_stage1,
    "vgan_stage2": vgan_stage2,
    "vgan_stage3": vgan_stage3,
    "wae_stage1": wae_stage1,
    "wae_stage2": wae_stage2,
    "wae_stage3": wae_stage3,
    "wae_vgan_stage1": wae_vgan_stage1,
    "exp_decoder": exp_decoder,
    "exp_vae": exp_vae,
    "exp_vgan": exp_vgan,
    "exp_dcgan_stage1": exp_dcgan_stage1,
    "exp_dcgan_stage2": exp_dcgan_stage2,
}
