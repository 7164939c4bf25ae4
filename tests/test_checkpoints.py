"""Checkpoint store tests: roundtrip, latest-epoch resume, stage handoff."""

import numpy as np
import jax
import jax.numpy as jnp

from fmri_tpu.checkpoints import (
    AsyncCheckpointWriter, graft_groups, latest_epoch, list_checkpoints,
    load_groups, prune_checkpoints, restore_checkpoint, save_checkpoint,
)
from fmri_tpu.configs import TINY
from fmri_tpu.train import RmsProp, init_cognitive, init_vaegan, make_state


def _tiny_state():
    groups = init_vaegan(jax.random.key(0), TINY)
    g = {k: {"params": groups["params"][k], "batch_stats": groups["batch_stats"][k]}
         for k in groups["params"]}
    opt = RmsProp()
    return make_state(g, {k: opt for k in g})


def _tree_allclose(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_roundtrip_and_latest(tmp_path):
    state = _tiny_state()
    d = str(tmp_path / "ckpts")
    save_checkpoint(d, 5, state, meta={"rng_seed": 8, "stage": 1})
    # perturb and save a later epoch
    bumped = state.replace(step=jnp.int32(100))
    save_checkpoint(d, 10, bumped, meta={"rng_seed": 8})
    assert latest_epoch(d) == 10

    restored, meta = restore_checkpoint(d, state)
    assert meta["epoch"] == 10
    assert int(restored.step) == 100
    _tree_allclose(restored.params, state.params)
    _tree_allclose(restored.opt_state, state.opt_state)

    older, meta5 = restore_checkpoint(d, state, epoch=5)
    assert meta5["epoch"] == 5 and meta5["stage"] == 1
    assert int(older.step) == 0


def test_stage_handoff_graft(tmp_path):
    """Stage-I -> Stage-II handoff: decoder + discriminator + teacher encoder
    come from the Stage-I checkpoint, cognitive encoder is fresh
    (``train_vgan_stage2.py:213-232``)."""
    state1 = _tiny_state()
    d = str(tmp_path / "stage1")
    save_checkpoint(d, 20, state1)

    templates = {k: {"params": state1.params[k],
                     "batch_stats": state1.batch_stats[k]}
                 for k in state1.params}
    loaded = load_groups(d, ["encoder", "decoder", "discriminator"], templates)
    _tree_allclose(loaded["decoder"]["params"], state1.params["decoder"])

    cog = init_cognitive(jax.random.key(1), TINY)
    groups = {"encoder": cog}
    groups = graft_groups(groups, loaded, {
        "decoder": "decoder", "discriminator": "discriminator",
        "teacher_encoder": "encoder"})
    assert set(groups) == {"encoder", "decoder", "discriminator", "teacher_encoder"}
    _tree_allclose(groups["teacher_encoder"]["params"], state1.params["encoder"])

    # stage-2 state: decoder + teacher frozen (no optimizer entries)
    opt = RmsProp(clip=1.0)
    state2 = make_state(groups, {"encoder": opt, "discriminator": opt})
    assert set(state2.opt_state) == {"encoder", "discriminator"}


def test_prune_retention_policy(tmp_path):
    """keep_last / keep_best / keep_every compose as a union; the latest
    checkpoint always survives; all-zeros keeps everything."""
    state = _tiny_state()
    d = str(tmp_path / "ckpts")
    pccs = {5: 0.30, 10: 0.90, 15: 0.60, 20: 0.85, 25: 0.40}
    for e, pcc in pccs.items():
        save_checkpoint(d, e, state, meta={"metrics": {"valid_PCC": pcc}})

    assert prune_checkpoints(d) == []          # no policy -> no deletions
    assert sorted(list_checkpoints(d)) == [5, 10, 15, 20, 25]

    deleted = prune_checkpoints(d, keep_last=1, keep_best=2)
    # keep 25 (last) + 10, 20 (best PCC); drop 5, 15
    assert deleted == [5, 15]
    assert sorted(list_checkpoints(d)) == [10, 20, 25]

    deleted = prune_checkpoints(d, keep_last=1, keep_every=20)
    assert deleted == [10]                     # 20 kept by keep_every, 25 latest
    assert sorted(list_checkpoints(d)) == [20, 25]

    # restore of a survivor still works
    restored, meta = restore_checkpoint(d, state, epoch=20)
    assert meta["metrics"]["valid_PCC"] == 0.85


def test_prune_without_metric_meta(tmp_path):
    """Checkpoints lacking the best-metric never count as 'best' but the
    latest still survives."""
    state = _tiny_state()
    d = str(tmp_path / "ckpts")
    for e in (1, 2, 3):
        save_checkpoint(d, e, state)
    deleted = prune_checkpoints(d, keep_best=2)
    assert deleted == [1, 2] and sorted(list_checkpoints(d)) == [3]


def test_async_writer_roundtrip(tmp_path):
    """Background save produces a checkpoint identical to the sync path and
    applies the prune policy after each write."""
    state = _tiny_state()
    d = str(tmp_path / "ckpts")
    w = AsyncCheckpointWriter()
    for e in (5, 10, 15):
        w.save(d, e, state.replace(step=jnp.int32(e)),
               meta={"metrics": {"valid_PCC": e / 100.0}},
               prune=dict(keep_last=2))
    w.wait()
    assert sorted(list_checkpoints(d)) == [10, 15]
    restored, meta = restore_checkpoint(d, state)
    assert int(restored.step) == 15 and meta["epoch"] == 15
    _tree_allclose(restored.params, state.params)
