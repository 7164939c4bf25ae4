"""End-to-end trainer tests: the full 3-stage pipelines on synthetic data.

The reference's closest analogue is its MNIST smoke path
(``train_vgan_stage1.py:198-221``, SURVEY.md §4); these tests run every stage
builder through the unified Trainer on tiny synthetic datasets and assert the
artifact contract (CSV, checkpoints, resume, stage handoff).
"""

import os

import numpy as np
import pytest
import jax

from fmri_tpu.configs import TINY
from fmri_tpu.train import BUILDERS, Trainer
from fmri_tpu.utils.runlog import ResultsCSV, create_run_dir

N = 16  # synthetic dataset size


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


def _fit(builder_name, run_dir, data, valid, *, n_epochs=2, **builder_kw):
    cfg = TINY
    spe = N // cfg.train.batch_size
    state, steps, kwargs = BUILDERS[builder_name](
        cfg, steps_per_epoch=spe, donate=False, **builder_kw)
    trainer = Trainer(cfg, steps, run_dir, tensorboard=False, **kwargs)
    state = trainer.fit(state, data, valid, n_epochs=n_epochs, grid_every=0)
    return state, trainer


def test_vgan_three_stage_pipeline(tmp_path, images, pairs):
    # ---- Stage I on images ----
    d1 = create_run_dir(str(tmp_path), "vgan_s1", timestamp="t")
    state1, tr1 = _fit("vgan_stage1", d1, images, images)
    res = ResultsCSV(os.path.join(d1, "results.csv"))
    assert res.last_epoch == 1
    assert "loss_encoder" in res.rows[0] and "valid_PCC" in res.rows[0]
    assert all(np.isfinite(v) for v in res.rows[-1].values())
    ckpt1 = os.path.join(d1, "checkpoints")
    assert os.path.isdir(ckpt1)

    # loss plots written
    assert os.path.exists(os.path.join(d1, "plots", "GD_loss.png"))
    assert os.path.exists(os.path.join(d1, "config.json"))

    # ---- resume from checkpoint ----
    spe = N // TINY.train.batch_size
    state_r, steps_r, kwargs_r = BUILDERS["vgan_stage1"](
        TINY, steps_per_epoch=spe, donate=False)
    tr_resume = Trainer(TINY, steps_r, d1, tensorboard=False, **kwargs_r)
    state_r, start = tr_resume.resume(state_r)
    assert start == 2
    assert int(state_r.step) == int(state1.step)

    # ---- Stage II on fmri/image pairs (teacher distillation) ----
    d2 = create_run_dir(str(tmp_path), "vgan_s2", timestamp="t")
    state2, _ = _fit("vgan_stage2", d2, pairs, pairs, n_epochs=1,
                     stage1_ckpt=ckpt1)
    res2 = ResultsCSV(os.path.join(d2, "results.csv"))
    assert res2.last_epoch == 0
    # stage 2 freezes the decoder: params unchanged from stage 1
    for a, b in zip(jax.tree_util.tree_leaves(state1.params["decoder"]),
                    jax.tree_util.tree_leaves(state2.params["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ---- Stage III (encoder frozen, decoder trained) ----
    d3 = create_run_dir(str(tmp_path), "vgan_s3", timestamp="t")
    ckpt2 = os.path.join(d2, "checkpoints")
    state3, _ = _fit("vgan_stage3", d3, pairs, pairs, n_epochs=1,
                     stage2_ckpt=ckpt2)
    # encoder frozen in stage 3
    for a, b in zip(jax.tree_util.tree_leaves(state2.params["encoder"]),
                    jax.tree_util.tree_leaves(state3.params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # decoder did train
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state2.params["decoder"]),
                        jax.tree_util.tree_leaves(state3.params["decoder"])))
    assert changed


def test_wae_three_stage_pipeline(tmp_path, images, pairs):
    d1 = create_run_dir(str(tmp_path), "wae_s1", timestamp="t")
    state1, _ = _fit("wae_stage1", d1, images, images)
    ckpt1 = os.path.join(d1, "checkpoints")
    res = ResultsCSV(os.path.join(d1, "results.csv"))
    assert "loss_penalty" in res.rows[0]

    d2 = create_run_dir(str(tmp_path), "wae_s2", timestamp="t")
    state2, _ = _fit("wae_stage2", d2, pairs, pairs, n_epochs=1,
                     stage1_ckpt=ckpt1)
    # decoder frozen in stage 2
    for a, b in zip(jax.tree_util.tree_leaves(state1.params["decoder"]),
                    jax.tree_util.tree_leaves(state2.params["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    d3 = create_run_dir(str(tmp_path), "wae_s3", timestamp="t")
    ckpt2 = os.path.join(d2, "checkpoints")
    state3, _ = _fit("wae_stage3", d3, pairs, pairs, n_epochs=1,
                     stage2_ckpt=ckpt2, stage1_ckpt=ckpt1)
    # cognitive encoder frozen in stage 3
    for a, b in zip(jax.tree_util.tree_leaves(state2.params["encoder"]),
                    jax.tree_util.tree_leaves(state3.params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wae_vgan_stage1(tmp_path, images):
    d = create_run_dir(str(tmp_path), "wae_vgan", timestamp="t")
    _, tr = _fit("wae_vgan_stage1", d, images, images, n_epochs=1)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    assert "loss_penalty" in res.rows[0] and "loss_discriminator" in res.rows[0]


def test_nan_guard_stops(tmp_path, images):
    """EarlyStopping NaN stop (``train_utils.py:41-42``): poison the data and
    training must halt after the first epoch rather than run to n_epochs."""
    bad = images.copy()
    bad[0, 0, 0, 0] = np.nan
    d = create_run_dir(str(tmp_path), "nan_guard", timestamp="t")
    cfg = TINY
    spe = N // cfg.train.batch_size
    state, steps, kwargs = BUILDERS["vgan_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    trainer = Trainer(cfg, steps, d, tensorboard=False, **kwargs)
    trainer.fit(state, bad, bad, n_epochs=5, grid_every=0)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    assert res.last_epoch == 0  # stopped immediately


def test_grid_dump(tmp_path, images):
    d = create_run_dir(str(tmp_path), "grids", timestamp="t")
    _fit("vgan_stage1", d, images, images, n_epochs=1)
    # default grid_every in _fit is 0; rerun with grids via Trainer directly
    cfg = TINY
    spe = N // cfg.train.batch_size
    state, steps, kwargs = BUILDERS["vgan_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    trainer = Trainer(cfg, steps, d, tensorboard=False, **kwargs)
    trainer.fit(state, images, images, n_epochs=1, grid_every=1)
    assert os.path.exists(os.path.join(d, "images", "valid", "epoch_0000.png"))
    assert os.path.exists(os.path.join(d, "images", "valid",
                                       "epoch_0000_original.png"))
    # 'generated' panel (reference reconstructed/generated/original triple)
    assert os.path.exists(os.path.join(d, "images", "valid",
                                       "epoch_0000_generated.png"))


def test_on_device_epochs_match_host_loop_shape(tmp_path, images):
    """on_device=True (lax.scan epochs) trains, logs and checkpoints like the
    host loop; losses finite and parameters move."""
    cfg = TINY
    spe = N // cfg.train.batch_size
    state0, steps, kwargs = BUILDERS["vgan_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    d = create_run_dir(str(tmp_path), "scan_epochs", timestamp="t")
    trainer = Trainer(cfg, steps, d, tensorboard=False, **kwargs)
    import jax

    p0 = jax.tree_util.tree_leaves(state0.params)[0].copy()
    state = trainer.fit(state0, images, images, n_epochs=2, grid_every=0,
                        on_device=True)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    assert res.last_epoch == 1
    assert all(np.isfinite(v) for v in res.rows[-1].values())
    assert "valid_PCC" in res.rows[-1]
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_on_device_epochs_wae(tmp_path, pairs):
    cfg = TINY
    spe = N // cfg.train.batch_size
    state, steps, kwargs = BUILDERS["wae_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    d = create_run_dir(str(tmp_path), "scan_wae", timestamp="t")
    trainer = Trainer(cfg, steps, d, tensorboard=False, **kwargs)
    trainer.fit(state, pairs["image"], pairs["image"], n_epochs=1,
                grid_every=0, on_device=True)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    assert np.isfinite(res.rows[-1]["loss_reconstruction"])


def test_train_metrics_columns(tmp_path, images):
    """Reference CSVs carry per-epoch train_PCC/train_SSIM/train_MSE next to
    the valid_ columns (train_vgan_stage1.py:583-618)."""
    d = create_run_dir(str(tmp_path), "train_cols", timestamp="t")
    _fit("vgan_stage1", d, images, images, n_epochs=1)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    row = res.rows[-1]
    for k in ("train_PCC", "train_SSIM", "train_MSE",
              "valid_PCC", "valid_SSIM", "valid_MSE"):
        assert k in row and np.isfinite(row[k])


def test_on_device_epochs_pairs(tmp_path, pairs):
    """on_device epochs with {'fmri','image'} dict data (stage-2 shape)."""
    cfg = TINY
    spe = N // cfg.train.batch_size
    # build stage-2-like state via the scratch experiment (no ckpt needed)
    state, steps, kwargs = BUILDERS["exp_vgan"](
        cfg, steps_per_epoch=spe, donate=False)
    d = create_run_dir(str(tmp_path), "scan_pairs", timestamp="t")
    trainer = Trainer(cfg, steps, d, tensorboard=False, **kwargs)
    trainer.fit(state, pairs, pairs, n_epochs=1, grid_every=0, on_device=True)
    res = ResultsCSV(os.path.join(d, "results.csv"))
    assert np.isfinite(res.rows[-1]["loss_encoder"])


def test_profile_flag_writes_trace(tmp_path, images):
    """--profile dumps a jax.profiler trace of the second epoch (SURVEY §5.1)."""
    cfg = TINY
    spe = N // cfg.train.batch_size
    state, steps, kwargs = BUILDERS["vgan_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    d = create_run_dir(str(tmp_path), "prof", timestamp="t")
    trainer = Trainer(cfg, steps, d, tensorboard=False, profile=True, **kwargs)
    trainer.fit(state, images, images, n_epochs=2, grid_every=0)
    prof = os.path.join(d, "profile")
    assert os.path.isdir(prof)
    found = [f for root, _, files in os.walk(prof) for f in files]
    assert found  # trace artifacts were written


def test_async_ckpt_and_retention(tmp_path, images):
    """Trainer integration: background checkpoint writes + keep-last pruning,
    and the retained checkpoint resumes (the on-chip soak's configuration)."""
    from fmri_tpu.checkpoints import list_checkpoints

    cfg = TINY
    spe = N // cfg.train.batch_size
    d = create_run_dir(str(tmp_path), "vgan_s1_async", timestamp="t")
    state, steps, kwargs = BUILDERS["vgan_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    trainer = Trainer(cfg, steps, d, tensorboard=False, async_ckpt=True,
                      ckpt_retention=dict(keep_last=1), **kwargs)
    state = trainer.fit(state, images, images, n_epochs=6, grid_every=0)

    ckpt_dir = os.path.join(d, "checkpoints")
    # epochs 0 and 5 were saved (ckpt_every=5, final=5); keep_last=1 pruned 0
    assert sorted(list_checkpoints(ckpt_dir)) == [5]

    # resume from the retained checkpoint
    state_r, steps_r, kwargs_r = BUILDERS["vgan_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    tr = Trainer(cfg, steps_r, d, tensorboard=False, **kwargs_r)
    state_r, start = tr.resume(state_r)
    assert start == 6 and int(state_r.step) == int(state.step)


def test_final_checkpoint_carries_metrics(tmp_path, images):
    """An off-cadence final epoch is saved once with the last row's metrics
    (keep-best needs them), and an on-cadence final epoch is not re-saved
    with a metrics-free meta (the clobbering found in review)."""
    from fmri_tpu.checkpoints import checkpoint_meta, list_checkpoints

    cfg = TINY
    spe = N // cfg.train.batch_size
    d = create_run_dir(str(tmp_path), "vgan_s1_meta", timestamp="t")
    state, steps, kwargs = BUILDERS["vgan_stage1"](
        cfg, steps_per_epoch=spe, donate=False)
    trainer = Trainer(cfg, steps, d, tensorboard=False, **kwargs)
    trainer.fit(state, images, images, n_epochs=2, grid_every=0)  # final=1, off-cadence

    ckpt_dir = os.path.join(d, "checkpoints")
    cps = list_checkpoints(ckpt_dir)
    assert sorted(cps) == [0, 1]
    for e in (0, 1):  # both the cadence save and the final save carry metrics
        meta = checkpoint_meta(cps[e])
        assert "valid_PCC" in meta.get("metrics", {}), (e, meta)
