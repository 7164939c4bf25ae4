"""Ablation-experiment tests (reference ``experiments/``, SURVEY.md §2.6)."""

import numpy as np
import pytest
import jax

from fmri_tpu.configs import TINY
from fmri_tpu.train import BUILDERS, Trainer
from fmri_tpu.utils.runlog import ResultsCSV, create_run_dir

import os

N = 16


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    c = TINY.model
    return rng.uniform(0, 1, (N, c.image_size, c.image_size, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def pairs(images):
    rng = np.random.default_rng(1)
    return {"fmri": rng.normal(size=(N, TINY.model.num_voxels)).astype(np.float32),
            "image": images}


def _fit(builder_name, run_dir, data, valid, *, n_epochs=1, **builder_kw):
    cfg = TINY
    spe = N // cfg.train.batch_size
    state, steps, kwargs = BUILDERS[builder_name](
        cfg, steps_per_epoch=spe, donate=False, **builder_kw)
    trainer = Trainer(cfg, steps, run_dir, tensorboard=False, **kwargs)
    return trainer.fit(state, data, valid, n_epochs=n_epochs, grid_every=0)


def test_supervised_decoder_learns(tmp_path, pairs):
    """exp_decoder: pure-MSE supervised decoder must reduce its loss."""
    d = create_run_dir(str(tmp_path), "exp_dec", timestamp="t")
    _fit("exp_decoder", d, pairs, pairs, n_epochs=4)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    losses = res.column("loss_decoder")
    assert losses[-1] < losses[0]
    assert "valid_PCC" in res.rows[-1]


def test_exp_vae_and_vgan(tmp_path, pairs):
    for name in ("exp_vae", "exp_vgan"):
        d = create_run_dir(str(tmp_path), name, timestamp="t")
        state = _fit(name, d, pairs, pairs)
        res = ResultsCSV(os.path.join(d, "results.csv"))
        assert np.isfinite(res.rows[-1]["loss_encoder"])
        assert set(state.opt_state) == {"encoder", "decoder", "discriminator"}


def test_exp_vae_never_trains_disc_alone(tmp_path, pairs):
    """mode 'vae' starts with train_dis=False; the both-off rule may re-enable
    it, so just check the gate telemetry is recorded."""
    d = create_run_dir(str(tmp_path), "exp_vae_gate", timestamp="t")
    _fit("exp_vae", d, pairs, pairs)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    assert 0.0 <= res.rows[-1]["train_dis"] <= 1.0


def test_dcgan_pipeline(tmp_path, images, pairs):
    d1 = create_run_dir(str(tmp_path), "dcgan1", timestamp="t")
    state1 = _fit("exp_dcgan_stage1", d1, images, images)
    assert set(state1.params) == {"decoder", "discriminator"}
    res = ResultsCSV(os.path.join(d1, "results.csv"))
    assert np.isfinite(res.rows[-1]["loss_discriminator"])

    d2 = create_run_dir(str(tmp_path), "dcgan2", timestamp="t")
    state2 = _fit("exp_dcgan_stage2", d2, pairs, pairs,
                  stage1_ckpt=os.path.join(d1, "checkpoints"))
    # generator frozen: decoder params identical to the DCGAN checkpoint
    for a, b in zip(jax.tree_util.tree_leaves(state1.params["decoder"]),
                    jax.tree_util.tree_leaves(state2.params["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # only the discriminator has an optimizer
    assert set(state2.opt_state) == {"discriminator"}
