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


def test_exp_vae_never_trains_disc(tmp_path, pairs):
    """exp_vae.py hard-codes train_dis=False / train_dec=True (its gate
    block is commented out, :343-352) — the discriminator NEVER updates and
    the decoder ALWAYS does."""
    d = create_run_dir(str(tmp_path), "exp_vae_gate", timestamp="t")
    _fit("exp_vae", d, pairs, pairs)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    assert res.rows[-1]["train_dis"] == 0.0
    assert res.rows[-1]["train_dec"] == 1.0


def test_dcgan_pipeline(tmp_path, images, pairs):
    d1 = create_run_dir(str(tmp_path), "dcgan1", timestamp="t")
    state1 = _fit("exp_dcgan_stage1", d1, images, images)
    assert set(state1.params) == {"decoder", "discriminator"}
    res = ResultsCSV(os.path.join(d1, "results.csv"))
    assert np.isfinite(res.rows[-1]["loss_discriminator"])

    d2 = create_run_dir(str(tmp_path), "dcgan2", timestamp="t")
    state2 = _fit("exp_dcgan_stage2", d2, pairs, pairs,
                  stage1_ckpt=os.path.join(d1, "checkpoints"))
    # decoder + discriminator train (the reference's decoder-freeze loop is
    # commented out, exp_dcgan_stage2.py:281-283,343-345); encoder frozen
    assert set(state2.opt_state) == {"decoder", "discriminator"}
    res2 = ResultsCSV(os.path.join(d2, "results.csv"))
    assert np.isfinite(res2.rows[-1]["loss_decoder"])


def test_dcgan_stage2_decoder_trains_encoder_frozen(pairs):
    """With both gates forced on (eq=margin=100), the decoder and
    discriminator move and the encoder stays fixed — the reference's
    effective trainable set (exp_dcgan_stage2.py:335-353: encoder backward
    commented out, decoder-freeze loop commented out)."""
    import jax.numpy as jnp

    from fmri_tpu.train import (
        RmsProp, init_cognitive, init_vaegan, make_state,
    )
    from fmri_tpu.train.steps_exp import make_dcgan_stage2_step

    ks = jax.random.split(jax.random.key(0), 2)
    vg = init_vaegan(ks[0], TINY)
    groups = {
        "encoder": init_cognitive(ks[1], TINY),
        "decoder": {"params": vg["params"]["decoder"],
                    "batch_stats": vg["batch_stats"]["decoder"]},
        "discriminator": {"params": vg["params"]["discriminator"],
                          "batch_stats": vg["batch_stats"]["discriminator"]},
    }
    state = make_state(groups, {"decoder": RmsProp(),
                                "discriminator": RmsProp(clip=1.0)})
    step = make_dcgan_stage2_step(TINY, donate=False)
    batch = {"fmri": jnp.asarray(pairs["fmri"][:8]),
             "image": jnp.asarray(pairs["image"][:8])}
    new_state, m = step.train_step(state, batch, jax.random.key(1),
                                   jnp.float32(100.0), jnp.float32(100.0),
                                   jnp.float32(1e-6))
    assert float(m["train_dec"]) == 1.0 and float(m["train_dis"]) == 1.0
    for grp, want_moved in (("decoder", True), ("discriminator", True),
                            ("encoder", False)):
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state.params[grp]),
                            jax.tree_util.tree_leaves(new_state.params[grp])))
        assert moved == want_moved, grp
