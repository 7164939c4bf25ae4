"""Epoch-level schedule parity: the per-epoch decay arithmetic that wraps
every reference trainer's batch loop.

The update-level oracles (``test_update_parity.py``) prove the per-batch
step; these pin the remaining trainer-side schedule state against the
reference's own lines and against torch's LR schedulers executed directly:

  * the equilibrium-game decays (``train_vgan_stage1.py:451-458``):
    margin/equilibrium multiplied per epoch, ``equilibrium = max(eq,
    margin)`` crossover, ``lambda_mse`` capped at 1;
  * ``ExponentialLR(gamma=0.98)`` stepped per epoch
    (``train_vgan_stage1.py:277-283,448-450``);
  * ``StepLR(step_size=30, gamma=0.5)`` stepped per epoch
    (``train_wae_stage1.py:226-228``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from fmri_tpu.configs import get_config


def _reference_decay_lines(margin, equilibrium, lambda_mse, args, epochs):
    """The reference's per-epoch decay block, reproduced verbatim in shape
    (``train_vgan_stage1.py:451-458``)."""
    out = []
    for _ in range(epochs):
        margin *= args["decay_margin"]
        equilibrium *= args["decay_equilibrium"]
        if margin > equilibrium:
            equilibrium = margin
        lambda_mse *= args["decay_mse"]
        if lambda_mse > 1:
            lambda_mse = 1
        out.append((margin, equilibrium, lambda_mse))
    return out


@pytest.mark.parametrize("decays", [
    # the reference's shipped defaults (gan_config.py:27-29): no decay
    dict(decay_margin=1.0, decay_equilibrium=1.0, decay_mse=1.0),
    # margin overtakes equilibrium -> crossover branch
    dict(decay_margin=1.05, decay_equilibrium=0.97, decay_mse=1.0),
    # lambda_mse grows past 1 -> cap branch (the thesis's annealing regime)
    dict(decay_margin=0.98, decay_equilibrium=0.99, decay_mse=1.7),
])
def test_game_schedules_match_reference_lines(decays):
    from fmri_tpu.train.trainer import GameSchedules

    cfg = get_config("res64")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lambda_mse=1e-2, **decays))
    gs = GameSchedules(cfg)
    ref = _reference_decay_lines(cfg.train.margin, cfg.train.equilibrium,
                                 cfg.train.lambda_mse, decays, epochs=60)
    for epoch, (m, e, lam) in enumerate(ref):
        gs.epoch_end()
        assert gs.margin == pytest.approx(m, rel=1e-12), epoch
        assert gs.equilibrium == pytest.approx(e, rel=1e-12), epoch
        assert gs.lambda_mse == pytest.approx(lam, rel=1e-12), epoch
        a_m, a_e, a_l = gs.args()
        np.testing.assert_allclose(np.asarray(a_m), np.float32(m), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a_e), np.float32(e), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a_l), np.float32(lam),
                                   rtol=1e-6)


def _torch_lr_trace(make_sched, epochs, base_lr):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = make_sched(opt)
    out = []
    for _ in range(epochs):
        out.append(opt.param_groups[0]["lr"])
        sched.step()  # the reference steps per epoch (:448-450)
    return out


def test_exponential_lr_matches_torch():
    """``exponential_lr`` == torch ``ExponentialLR(0.98)`` stepped per epoch,
    at every step of every epoch (the jitted schedule is a function of the
    global step counter)."""
    import torch

    from fmri_tpu.train.optim import exponential_lr

    steps_per_epoch, epochs = 7, 65
    sched = exponential_lr(1e-4, 0.98, steps_per_epoch)
    ref = _torch_lr_trace(
        lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.98),
        epochs, base_lr=1e-4)
    for epoch in range(epochs):
        for s in (0, steps_per_epoch - 1):
            got = float(sched(jnp.int32(epoch * steps_per_epoch + s)))
            np.testing.assert_allclose(got, ref[epoch], rtol=1e-5,
                                       err_msg=f"epoch {epoch} step {s}")


def test_step_lr_matches_torch():
    """``step_lr`` == torch ``StepLR(30, 0.5)`` stepped per epoch — the WAE
    trainers' scheduler (``train_wae_stage1.py:226-228``), covering two
    decay ticks (epochs 30 and 60)."""
    import torch

    from fmri_tpu.train.optim import step_lr

    steps_per_epoch, epochs = 3, 65
    sched = step_lr(1e-3, 30, 0.5, steps_per_epoch)
    ref = _torch_lr_trace(
        lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=30,
                                                  gamma=0.5), epochs,
        base_lr=1e-3)
    for epoch in range(epochs):
        got = float(sched(jnp.int32(epoch * steps_per_epoch)))
        np.testing.assert_allclose(got, ref[epoch], rtol=1e-6,
                                   err_msg=f"epoch {epoch}")
