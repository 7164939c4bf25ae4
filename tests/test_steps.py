"""Integration tests for the fused train steps: every stage of both families
runs, losses are finite, trainable groups move, frozen groups stay fixed, the
equilibrium gate freezes both params and optimizer moments, and steps are
deterministic under fixed PRNG keys (SURVEY.md §4 test pyramid, tier 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmri_tpu.configs import TINY
from fmri_tpu.train import (
    Adam, RmsProp, TrainState, init_cognitive, init_latent_disc, init_vaegan,
    make_state, make_vgan_cognitive_step, make_vgan_stage1_step,
    make_wae_cognitive_step, make_wae_stage1_step, make_wae_vgan_step,
)

CFG = TINY
B = 8


def _leaves_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _images(key=0):
    return jax.random.uniform(
        jax.random.key(key), (B, CFG.model.image_size, CFG.model.image_size, 3),
        minval=-1.0, maxval=1.0)


def _bold_batch(key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    return {
        "fmri": jax.random.normal(k1, (B, CFG.model.num_voxels)),
        "image": jax.random.uniform(
            k2, (B, CFG.model.image_size, CFG.model.image_size, 3),
            minval=-1.0, maxval=1.0),
    }


def _vgan_state(seed=0):
    groups = init_vaegan(jax.random.key(seed), CFG)
    opt = RmsProp()
    g = {k: {"params": groups["params"][k], "batch_stats": groups["batch_stats"][k]}
         for k in groups["params"]}
    return make_state(g, {k: opt for k in g})


@pytest.fixture(scope="module")
def vgan_step():
    return make_vgan_stage1_step(CFG, "vae-gan", donate=False)


def test_vgan_stage1_runs_and_moves(vgan_step):
    state = _vgan_state()
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    margin, eq, lam = jnp.float32(0.35), jnp.float32(0.68), jnp.float32(1e-6)
    x = _images()
    for i in range(3):
        state, m = vgan_step.train_step(state, x, jax.random.key(i), margin, eq, lam)
    assert np.isfinite(float(m["loss_encoder"]))
    assert np.isfinite(float(m["loss_decoder"]))
    assert np.isfinite(float(m["loss_discriminator"]))
    assert not _leaves_equal(p0["encoder"], state.params["encoder"])
    assert not _leaves_equal(p0["decoder"], state.params["decoder"])
    assert int(state.step) == 3
    # eval path
    out = vgan_step.eval_step(state, x)
    assert out.shape == x.shape


def test_vgan_stage1_deterministic(vgan_step):
    args = (_images(), jax.random.key(42), jnp.float32(0.35), jnp.float32(0.68),
            jnp.float32(1e-6))
    s1, m1 = vgan_step.train_step(_vgan_state(), *args)
    s2, m2 = vgan_step.train_step(_vgan_state(), *args)
    assert _leaves_equal(s1.params, s2.params)
    assert float(m1["loss_encoder"]) == float(m2["loss_encoder"])


def test_vgan_stage1_gate_freezes_disc(vgan_step):
    # equilibrium huge -> every bce < eq - margin -> discriminator skipped,
    # and its RMSprop moments must not move either.
    state = _vgan_state()
    s1, m = vgan_step.train_step(
        state, _images(), jax.random.key(0), jnp.float32(0.1),
        jnp.float32(1e6), jnp.float32(1e-6))
    assert float(m["train_dis"]) == 0.0
    assert _leaves_equal(state.params["discriminator"], s1.params["discriminator"])
    assert _leaves_equal(state.opt_state["discriminator"], s1.opt_state["discriminator"])
    assert not _leaves_equal(state.params["decoder"], s1.params["decoder"])


def test_vgan_stage1_gate_skips_decoder(vgan_step):
    # equilibrium very negative -> every bce > eq + margin -> decoder skipped.
    state = _vgan_state()
    s1, m = vgan_step.train_step(
        state, _images(), jax.random.key(0), jnp.float32(0.1),
        jnp.float32(-1e6), jnp.float32(1e-6))
    assert float(m["train_dec"]) == 0.0
    assert float(m["train_dis"]) == 1.0
    assert _leaves_equal(state.params["decoder"], s1.params["decoder"])


def _cognitive_state(stage, seed=0, with_teacher=True):
    ks = jax.random.split(jax.random.key(seed), 4)
    vg = init_vaegan(ks[0], CFG)
    cog = init_cognitive(ks[1], CFG)
    groups = {
        "encoder": cog,
        "decoder": {"params": vg["params"]["decoder"],
                    "batch_stats": vg["batch_stats"]["decoder"]},
        "discriminator": {"params": vg["params"]["discriminator"],
                          "batch_stats": vg["batch_stats"]["discriminator"]},
        "teacher_encoder": ({"params": vg["params"]["encoder"],
                             "batch_stats": vg["batch_stats"]["encoder"]}
                            if with_teacher else {"params": {}, "batch_stats": {}}),
    }
    opt = RmsProp(clip=1.0)
    trainable = {2: ("encoder", "discriminator"), 3: ("decoder", "discriminator")}[stage]
    return make_state(groups, {k: opt for k in trainable})


def test_vgan_stage2_distillation_step():
    step = make_vgan_cognitive_step(CFG, stage=2, donate=False)
    state = _cognitive_state(2)
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    batch = _bold_batch()
    for i in range(2):
        state, m = step.train_step(state, batch, jax.random.key(i),
                                   jnp.float32(0.35), jnp.float32(0.68),
                                   jnp.float32(1e-6))
    assert np.isfinite(float(m["loss_encoder"]))
    assert not _leaves_equal(p0["encoder"], state.params["encoder"])
    assert not _leaves_equal(p0["discriminator"], state.params["discriminator"])
    # decoder and teacher are frozen
    assert _leaves_equal(p0["decoder"], state.params["decoder"])
    assert _leaves_equal(p0["teacher_encoder"], state.params["teacher_encoder"])
    out = step.eval_step(state, batch)
    assert out.shape == batch["image"].shape


def test_vgan_stage3_freezes_encoder():
    step = make_vgan_cognitive_step(CFG, stage=3, donate=False)
    state = _cognitive_state(3)
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    state, m = step.train_step(state, _bold_batch(), jax.random.key(0),
                               jnp.float32(0.35), jnp.float32(0.68),
                               jnp.float32(1e-6))
    assert _leaves_equal(p0["encoder"], state.params["encoder"])
    assert not _leaves_equal(p0["decoder"], state.params["decoder"]) or \
        float(m["train_dec"]) == 0.0
    assert np.isfinite(float(m["loss_decoder"]))


def _wae1_state(seed=0):
    ks = jax.random.split(jax.random.key(seed), 2)
    vg = init_vaegan(ks[0], CFG)
    ld = init_latent_disc(ks[1], CFG, init_scheme="uniform")
    groups = {
        "encoder": {"params": vg["params"]["encoder"],
                    "batch_stats": vg["batch_stats"]["encoder"]},
        "decoder": {"params": vg["params"]["decoder"],
                    "batch_stats": vg["batch_stats"]["decoder"]},
        "latent_disc": ld,
    }
    opt = Adam(b1=0.5)
    return make_state(groups, {k: opt for k in groups})


def test_wae_stage1_runs():
    step = make_wae_stage1_step(CFG, donate=False)
    state = _wae1_state()
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    x = _images()
    for i in range(3):
        state, m = step.train_step(state, x, jax.random.key(i))
    for k in ("loss_reconstruction", "loss_penalty",
              "loss_discriminator_fake", "loss_discriminator_real"):
        assert np.isfinite(float(m[k])), k
    for g in ("encoder", "decoder", "latent_disc"):
        assert not _leaves_equal(p0[g], state.params[g]), g
    out = step.eval_step(state, x)
    assert out.shape == x.shape


def test_wae_stage1_recon_improves():
    # The generator phase minimizes recon; on a fixed batch the recon loss
    # should drop substantially over a few dozen steps.
    step = make_wae_stage1_step(CFG, donate=False)
    state = _wae1_state()
    x = _images()
    first = None
    for i in range(30):
        state, m = step.train_step(state, x, jax.random.key(i))
        if first is None:
            first = float(m["loss_reconstruction"])
    assert float(m["loss_reconstruction"]) < first


def _wae_cog_state(stage, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    vg = init_vaegan(ks[0], CFG)
    cog = init_cognitive(ks[1], CFG)
    ld = init_latent_disc(ks[2], CFG, init_scheme="normal")
    groups = {
        "encoder": cog,
        "decoder": {"params": vg["params"]["decoder"],
                    "batch_stats": vg["batch_stats"]["decoder"]},
        "latent_disc": ld,
        "teacher_encoder": {"params": vg["params"]["encoder"],
                            "batch_stats": vg["batch_stats"]["encoder"]},
    }
    opt = Adam(b1=0.9)
    trainable = {2: ("encoder", "latent_disc"), 3: ("decoder", "latent_disc")}[stage]
    return make_state(groups, {k: opt for k in trainable})


def test_wae_stage2_trains_encoder_only():
    step = make_wae_cognitive_step(CFG, stage=2, donate=False)
    state = _wae_cog_state(2)
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    state, m = step.train_step(state, _bold_batch(), jax.random.key(0))
    assert not _leaves_equal(p0["encoder"], state.params["encoder"])
    assert not _leaves_equal(p0["latent_disc"], state.params["latent_disc"])
    assert _leaves_equal(p0["decoder"], state.params["decoder"])
    assert _leaves_equal(p0["teacher_encoder"], state.params["teacher_encoder"])
    assert np.isfinite(float(m["loss_reconstruction"]))


def test_wae_stage3_trains_decoder_only():
    step = make_wae_cognitive_step(CFG, stage=3, donate=False)
    state = _wae_cog_state(3)
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    state, m = step.train_step(state, _bold_batch(), jax.random.key(0))
    assert not _leaves_equal(p0["decoder"], state.params["decoder"])
    assert not _leaves_equal(p0["latent_disc"], state.params["latent_disc"])
    assert _leaves_equal(p0["encoder"], state.params["encoder"])
    assert np.isfinite(float(m["loss_penalty"]))  # logged though not optimised


def test_wae_vgan_step_runs():
    step = make_wae_vgan_step(CFG, donate=False)
    ks = jax.random.split(jax.random.key(0), 2)
    vg = init_vaegan(ks[0], CFG)
    ld = init_latent_disc(ks[1], CFG, init_scheme="uniform")
    groups = {k: {"params": vg["params"][k], "batch_stats": vg["batch_stats"][k]}
              for k in vg["params"]}
    groups["latent_disc"] = ld
    opt = RmsProp()
    state = make_state(groups, {k: opt for k in groups})
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    state, m = step.train_step(state, _images(), jax.random.key(1),
                               jnp.float32(0.35), jnp.float32(0.68),
                               jnp.float32(1e-6))
    for k in ("loss_encoder", "loss_penalty", "loss_discriminator_fake"):
        assert np.isfinite(float(m[k])), k
    assert not _leaves_equal(p0["latent_disc"], state.params["latent_disc"])
    assert not _leaves_equal(p0["encoder"], state.params["encoder"])


def test_rmsprop_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    grads = [np.random.default_rng(i + 1).normal(size=(4, 3)).astype(np.float32)
             for i in range(5)]
    # torch reference
    p_t = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.RMSprop([p_t], lr=1e-2, alpha=0.9, eps=1e-8)
    for g in grads:
        p_t.grad = torch.tensor(g)
        opt_t.step()
    # ours
    opt = RmsProp(decay=0.9, eps=1e-8)
    p = jnp.asarray(w0)
    st = opt.init(p)
    for g in grads:
        p, st = opt.update(jnp.asarray(g), st, p, jnp.float32(1e-2), 1.0)
    np.testing.assert_allclose(np.asarray(p), p_t.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    grads = [np.random.default_rng(i + 1).normal(size=(4, 3)).astype(np.float32)
             for i in range(5)]
    p_t = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt_t = torch.optim.Adam([p_t], lr=1e-3, betas=(0.5, 0.999), eps=1e-8)
    for g in grads:
        p_t.grad = torch.tensor(g)
        opt_t.step()
    opt = Adam(b1=0.5, b2=0.999, eps=1e-8)
    p = jnp.asarray(w0)
    st = opt.init(p)
    for g in grads:
        p, st = opt.update(jnp.asarray(g), st, p, jnp.float32(1e-3), 1.0)
    np.testing.assert_allclose(np.asarray(p), p_t.detach().numpy(), rtol=1e-5, atol=1e-6)


class TestSplicedBackward:
    """The spliced segment-wise backward must produce identical updates to
    the naive three-pullback backward (reference gradient semantics,
    ``train_vgan_stage1.py:406-432``) in every mode."""

    @pytest.mark.parametrize("mode", ["vae-gan", "beta-vae", "vae", "dcgan"])
    def test_spliced_equals_naive(self, mode):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fmri_tpu.configs import TINY
        from fmri_tpu.train import (
            RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
        )

        cfg = TINY
        groups = init_vaegan(jax.random.key(0), cfg)
        g = {k: {"params": groups["params"][k],
                 "batch_stats": groups["batch_stats"][k]}
             for k in groups["params"]}
        x = jax.random.uniform(
            jax.random.key(1),
            (8, cfg.model.image_size, cfg.model.image_size, 3),
            minval=-1.0, maxval=1.0)
        args = (x, jax.random.key(2), jnp.float32(0.35), jnp.float32(0.68),
                jnp.float32(0.3))
        results = {}
        for backward in ("naive", "spliced"):
            step = make_vgan_stage1_step(cfg, mode, donate=False,
                                         backward=backward)
            state = make_state(g, {k: RmsProp() for k in g})
            new_state, metrics = step.train_step(state, *args)
            results[backward] = (new_state, metrics)
        sn, mn = results["naive"]
        ss, ms = results["spliced"]
        for k in mn:
            np.testing.assert_allclose(float(np.asarray(mn[k])),
                                       float(np.asarray(ms[k])),
                                       rtol=1e-5, atol=1e-5, err_msg=k)
        for a, b_ in zip(jax.tree_util.tree_leaves(sn.params),
                         jax.tree_util.tree_leaves(ss.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-6)
        for a, b_ in zip(jax.tree_util.tree_leaves(sn.batch_stats),
                         jax.tree_util.tree_leaves(ss.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("stage,mode,teacher", [
        (2, "vae-gan", True), (2, "vae", False), (3, "vae-gan", False),
    ])
    def test_cognitive_spliced_equals_naive(self, stage, mode, teacher):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fmri_tpu.configs import TINY
        from fmri_tpu.train import (
            RmsProp, init_cognitive, init_vaegan, make_state,
            make_vgan_cognitive_step,
        )

        cfg = TINY
        ks = jax.random.split(jax.random.key(0), 2)
        vg = init_vaegan(ks[0], cfg)
        cogg = init_cognitive(ks[1], cfg)
        groups = {
            "encoder": cogg,
            "decoder": {"params": vg["params"]["decoder"],
                        "batch_stats": vg["batch_stats"]["decoder"]},
            "discriminator": {"params": vg["params"]["discriminator"],
                              "batch_stats": vg["batch_stats"]["discriminator"]},
            "teacher_encoder": {"params": vg["params"]["encoder"],
                                "batch_stats": vg["batch_stats"]["encoder"]},
        }
        trainable = (("encoder", "discriminator") if stage == 2
                     else ("decoder", "discriminator"))
        batch = {
            "fmri": jax.random.normal(jax.random.key(1),
                                      (8, cfg.model.num_voxels)),
            "image": jax.random.uniform(
                jax.random.key(2),
                (8, cfg.model.image_size, cfg.model.image_size, 3),
                minval=-1.0, maxval=1.0),
        }
        args = (batch, jax.random.key(3), jnp.float32(0.35), jnp.float32(0.68),
                jnp.float32(0.3))
        results = {}
        for backward in ("naive", "spliced"):
            step = make_vgan_cognitive_step(cfg, stage, mode,
                                            use_teacher=teacher, donate=False,
                                            backward=backward)
            state = make_state(groups,
                               {k: RmsProp(clip=1.0) for k in trainable})
            new_state, metrics = step.train_step(state, *args)
            results[backward] = (new_state, metrics)
        sn, mn = results["naive"]
        ss, ms = results["spliced"]
        for k in mn:
            np.testing.assert_allclose(float(np.asarray(mn[k])),
                                       float(np.asarray(ms[k])),
                                       rtol=1e-5, atol=1e-5, err_msg=k)
        for a, b_ in zip(jax.tree_util.tree_leaves(sn.params),
                         jax.tree_util.tree_leaves(ss.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-6)
        for a, b_ in zip(jax.tree_util.tree_leaves(sn.batch_stats),
                         jax.tree_util.tree_leaves(ss.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)



    def test_wae_vgan_spliced_equals_naive(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fmri_tpu.configs import TINY
        from fmri_tpu.train import (
            RmsProp, init_latent_disc, init_vaegan, make_state,
            make_wae_vgan_step,
        )

        cfg = TINY
        k1, k2 = jax.random.split(jax.random.key(0))
        groups = init_vaegan(k1, cfg)
        g = {k: {"params": groups["params"][k],
                 "batch_stats": groups["batch_stats"][k]}
             for k in groups["params"]}
        g["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
        x = jax.random.uniform(
            jax.random.key(1),
            (8, cfg.model.image_size, cfg.model.image_size, 3),
            minval=-1.0, maxval=1.0)
        args = (x, jax.random.key(2), jnp.float32(0.35), jnp.float32(0.68),
                jnp.float32(0.3))
        results = {}
        for backward in ("naive", "spliced"):
            step = make_wae_vgan_step(cfg, "vae-gan", donate=False,
                                      backward=backward)
            state = make_state(g, {k: RmsProp() for k in g})
            new_state, metrics = step.train_step(state, *args)
            results[backward] = (new_state, metrics)
        sn, mn = results["naive"]
        ss, ms = results["spliced"]
        for k in mn:
            np.testing.assert_allclose(float(np.asarray(mn[k])),
                                       float(np.asarray(ms[k])),
                                       rtol=1e-5, atol=1e-5, err_msg=k)
        for a, b_ in zip(jax.tree_util.tree_leaves(sn.params),
                         jax.tree_util.tree_leaves(ss.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-6)


    def test_wae_stage1_spliced_equals_naive(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fmri_tpu.configs import TINY
        from fmri_tpu.train import (
            Adam, init_latent_disc, init_vaegan, make_state, make_wae_stage1_step,
        )

        cfg = TINY
        k1, k2 = jax.random.split(jax.random.key(0))
        groups = init_vaegan(k1, cfg)
        g = {k: {"params": groups["params"][k],
                 "batch_stats": groups["batch_stats"][k]}
             for k in ("encoder", "decoder")}
        g["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
        x = jax.random.uniform(
            jax.random.key(1),
            (8, cfg.model.image_size, cfg.model.image_size, 3),
            minval=-1.0, maxval=1.0)
        results = {}
        for backward in ("naive", "spliced"):
            step = make_wae_stage1_step(cfg, donate=False, backward=backward)
            opt = Adam(b1=cfg.train.adam_b1, b2=cfg.train.adam_b2)
            state = make_state(g, {k: opt for k in g})
            new_state, metrics = step.train_step(state, x, jax.random.key(2))
            results[backward] = (new_state, metrics)
        sn, mn = results["naive"]
        ss, ms = results["spliced"]
        for k in mn:
            np.testing.assert_allclose(float(np.asarray(mn[k])),
                                       float(np.asarray(ms[k])),
                                       rtol=1e-5, atol=1e-5, err_msg=k)
        for a, b_ in zip(jax.tree_util.tree_leaves(sn.params),
                         jax.tree_util.tree_leaves(ss.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-6)
        for a, b_ in zip(jax.tree_util.tree_leaves(sn.batch_stats),
                         jax.tree_util.tree_leaves(ss.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)


class TestSupervisedLoops:
    """Generic supervised loops (train_utils.py:474-675)."""

    def test_decoder_mode_learns(self):
        import numpy as np
        import jax
        import jax.numpy as jnp

        from fmri_tpu.configs import TINY
        from fmri_tpu.data.pipeline import Batches
        from fmri_tpu.models.nets import VoxelDecoder
        from fmri_tpu.train import RmsProp
        from fmri_tpu.train.optim import Adam
        from fmri_tpu.train.state import TrainState
        from fmri_tpu.train.supervised import (
            make_supervised_step, run_epoch, run_validation,
        )

        cfg = TINY.model
        module = VoxelDecoder(cfg)
        v = module.init(jax.random.key(0),
                        jnp.zeros((2, cfg.num_voxels)), train=True)
        opt = Adam(b1=0.9, b2=0.999)
        state = TrainState(params={"model": v["params"]},
                           batch_stats={"model": v["batch_stats"]},
                           opt_state={"model": opt.init(v["params"])},
                           step=jnp.zeros((), jnp.int32))
        loss_fn = lambda out, gt: jnp.mean((out - gt) ** 2)
        train_step, eval_step = make_supervised_step(
            module, opt, loss_fn, "decoder",
            lr_schedule=lambda s: jnp.float32(1e-2))

        rng = np.random.default_rng(0)
        data = {"fmri": rng.normal(size=(16, cfg.num_voxels)).astype(np.float32),
                "image": rng.uniform(-1, 1, (16, cfg.image_size,
                                             cfg.image_size, 3)).astype(np.float32)}
        losses = []
        for _ in range(4):
            state, m = run_epoch(train_step, state, iter(Batches(data, 8)))
            losses.append(m["loss"])
        assert losses[-1] < losses[0]
        vm = run_validation(eval_step, state, iter(Batches(data, 8)))
        assert np.isfinite(vm["loss"])

    def test_mode_routing(self):
        import numpy as np

        from fmri_tpu.train.supervised import route_batch

        batch = {"fmri": np.ones(3), "image": np.zeros(3)}
        i, t = route_batch("encoder", batch)
        assert i is batch["image"] and t is batch["fmri"]
        i, t = route_batch("cogenc", batch)
        assert i is batch["fmri"] and t is batch["image"]
        x = np.ones(4)
        i, t = route_batch("vae", x)
        assert i is x and t is x
        import pytest as _pytest
        with _pytest.raises(ValueError):
            route_batch("nope", batch)


class TestFusedDecoderBatch:
    """cfg.model.fused_decoder_batch: one 2B decode with ``vsplit=2``
    per-sub-batch BN stats — mathematically identical to the reference's two
    sequential decodes (outputs, gradients, AND running stats), so the flag
    is a pure layout change.  spliced == naive under the flag too."""

    def test_vsplit_decode_equals_sequential(self):
        """Decoder.apply(vsplit=2) on [z; z_p] == two sequential applies:
        outputs, final BN running stats, and parameter gradients."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fmri_tpu.configs import TINY
        from fmri_tpu.models.nets import Decoder
        from fmri_tpu.train.common import apply_with_stats

        c = TINY.model
        dec = Decoder(c)
        variables = dec.init(jax.random.key(0), jnp.zeros((2, c.latent_dim)),
                             train=False)
        params, stats0 = variables["params"], variables["batch_stats"]
        b = 6
        z = jax.random.normal(jax.random.key(1), (b, c.latent_dim))
        z_p = jax.random.normal(jax.random.key(2), (b, c.latent_dim))
        cot = jax.random.normal(
            jax.random.key(3), (2 * b, c.image_size, c.image_size, 3))

        def seq(p):
            xt, s1 = apply_with_stats(dec, p, stats0, z, train=True)
            xp, s2 = apply_with_stats(dec, p, s1, z_p, train=True)
            out = jnp.concatenate([xt, xp], axis=0)
            return jnp.sum(out * cot), (out, s2)

        def fused(p):
            out, s = apply_with_stats(
                dec, p, stats0, jnp.concatenate([z, z_p], axis=0),
                train=True, vsplit=2)
            return jnp.sum(out * cot), (out, s)

        (l_s, (out_s, stats_s)), g_s = jax.value_and_grad(seq, has_aux=True)(params)
        (l_f, (out_f, stats_f)), g_f = jax.value_and_grad(fused, has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                   rtol=1e-5, atol=1e-5)
        for (ks, a), (kf, f) in zip(
                jax.tree_util.tree_leaves_with_path(stats_s),
                jax.tree_util.tree_leaves_with_path(stats_f)):
            assert ks == kf
            np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=str(ks))
        for (ks, a), (kf, f) in zip(
                jax.tree_util.tree_leaves_with_path(g_s),
                jax.tree_util.tree_leaves_with_path(g_f)):
            assert ks == kf
            np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                                       rtol=2e-4, atol=2e-5, err_msg=str(ks))

    def test_fused_step_equals_sequential_step(self):
        """Full stage-1 train step: the fused flag changes NOTHING but
        speed — metrics and BN running stats tight, params to RMSprop
        fp-amplification tolerance (see the naive/spliced bound below)."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from fmri_tpu.configs import TINY
        from fmri_tpu.train import (
            RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
        )

        groups = init_vaegan(jax.random.key(0), TINY)
        g = {k: {"params": groups["params"][k],
                 "batch_stats": groups["batch_stats"][k]}
             for k in groups["params"]}
        x = jax.random.uniform(
            jax.random.key(1),
            (8, TINY.model.image_size, TINY.model.image_size, 3),
            minval=-1.0, maxval=1.0)
        args = (x, jax.random.key(2), jnp.float32(0.35), jnp.float32(0.68),
                jnp.float32(0.3))
        out = {}
        for fused in (False, True):
            cfg = TINY.replace(model=dataclasses.replace(
                TINY.model, fused_decoder_batch=fused))
            step = make_vgan_stage1_step(cfg, "vae-gan", donate=False)
            state = make_state(g, {k: RmsProp() for k in g})
            out[fused] = step.train_step(state, *args)
        for k in out[False][1]:
            np.testing.assert_allclose(
                float(np.asarray(out[False][1][k])),
                float(np.asarray(out[True][1][k])),
                rtol=1e-5, atol=1e-5, err_msg=k)
        for (ks, a), (kf, f) in zip(
                jax.tree_util.tree_leaves_with_path(out[False][0].batch_stats),
                jax.tree_util.tree_leaves_with_path(out[True][0].batch_stats)):
            assert ks == kf
            np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=str(ks))
        for a, f in zip(jax.tree_util.tree_leaves(out[False][0].params),
                        jax.tree_util.tree_leaves(out[True][0].params)):
            np.testing.assert_allclose(np.asarray(f), np.asarray(a), atol=1e-3)

    def test_fused_wae_vgan_step_equals_sequential(self):
        """WAE/Dual-GAN stage-I step: flag on == flag off (same x_tilde/x_p
        decode pair as the flagship, plus the latent-D phases untouched)."""
        import dataclasses

        ks = jax.random.split(jax.random.key(0), 2)
        vg = init_vaegan(ks[0], CFG)
        g = {k: {"params": vg["params"][k], "batch_stats": vg["batch_stats"][k]}
             for k in vg["params"]}
        g["latent_disc"] = init_latent_disc(ks[1], CFG, init_scheme="uniform")
        args = (_images(), jax.random.key(1), jnp.float32(0.35),
                jnp.float32(0.68), jnp.float32(0.3))
        out = {}
        for fused in (False, True):
            cfg = CFG.replace(model=dataclasses.replace(
                CFG.model, fused_decoder_batch=fused))
            step = make_wae_vgan_step(cfg, donate=False)
            state = make_state(g, {k: RmsProp() for k in g})
            out[fused] = step.train_step(state, *args)
        for k in out[False][1]:
            np.testing.assert_allclose(
                float(np.asarray(out[False][1][k])),
                float(np.asarray(out[True][1][k])),
                rtol=1e-5, atol=1e-5, err_msg=k)
        for (ks_, a), (kf, f) in zip(
                jax.tree_util.tree_leaves_with_path(out[False][0].batch_stats),
                jax.tree_util.tree_leaves_with_path(out[True][0].batch_stats)):
            assert ks_ == kf
            np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=str(ks_))
        for a, f in zip(jax.tree_util.tree_leaves(out[False][0].params),
                        jax.tree_util.tree_leaves(out[True][0].params)):
            np.testing.assert_allclose(np.asarray(f), np.asarray(a), atol=1e-3)

    @pytest.mark.parametrize("stage", [2, 3])
    def test_fused_cognitive_step_equals_sequential(self, stage):
        """Stage-2 (fuse gt_x+x_p, the grad-free decodes) and stage-3 (fuse
        x_tilde+x_p) cognitive steps: flag on == flag off."""
        import dataclasses

        batch = _bold_batch()
        args = (batch, jax.random.key(2), jnp.float32(0.35), jnp.float32(0.68),
                jnp.float32(0.3))
        out = {}
        for fused in (False, True):
            cfg = CFG.replace(model=dataclasses.replace(
                CFG.model, fused_decoder_batch=fused))
            step = make_vgan_cognitive_step(cfg, stage=stage, donate=False)
            out[fused] = step.train_step(_cognitive_state(stage), *args)
        for k in out[False][1]:
            np.testing.assert_allclose(
                float(np.asarray(out[False][1][k])),
                float(np.asarray(out[True][1][k])),
                rtol=1e-5, atol=1e-5, err_msg=k)
        for (ks, a), (kf, f) in zip(
                jax.tree_util.tree_leaves_with_path(out[False][0].batch_stats),
                jax.tree_util.tree_leaves_with_path(out[True][0].batch_stats)):
            assert ks == kf
            np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=str(ks))
        for a, f in zip(jax.tree_util.tree_leaves(out[False][0].params),
                        jax.tree_util.tree_leaves(out[True][0].params)):
            np.testing.assert_allclose(np.asarray(f), np.asarray(a), atol=1e-3)

    def test_fused_spliced_equals_fused_naive(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from fmri_tpu.configs import TINY
        from fmri_tpu.train import (
            RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
        )

        cfg = TINY.replace(model=dataclasses.replace(
            TINY.model, fused_decoder_batch=True))
        groups = init_vaegan(jax.random.key(0), cfg)
        g = {k: {"params": groups["params"][k],
                 "batch_stats": groups["batch_stats"][k]}
             for k in groups["params"]}
        x = jax.random.uniform(
            jax.random.key(1),
            (8, cfg.model.image_size, cfg.model.image_size, 3),
            minval=-1.0, maxval=1.0)
        args = (x, jax.random.key(2), jnp.float32(0.35), jnp.float32(0.68),
                jnp.float32(0.3))
        out = {}
        for backward in ("naive", "spliced"):
            step = make_vgan_stage1_step(cfg, "vae-gan", donate=False,
                                         backward=backward)
            state = make_state(g, {k: RmsProp() for k in g})
            new_state, metrics = step.train_step(state, *args)
            out[backward] = (new_state, metrics)
        # metrics (loss scalars) must agree tightly
        for k in out["naive"][1]:
            np.testing.assert_allclose(
                float(np.asarray(out["naive"][1][k])),
                float(np.asarray(out["spliced"][1][k])),
                rtol=1e-5, atol=1e-5, err_msg=k)
        # parameters: RMSprop normalizes by sqrt(avg g^2), so near-zero
        # gradients amplify fp reassociation noise between the two backward
        # structures into ~lr-sized update differences on a handful of
        # elements; bound the absolute drift instead
        for a, b_ in zip(jax.tree_util.tree_leaves(out["naive"][0].params),
                         jax.tree_util.tree_leaves(out["spliced"][0].params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-3)
        for v in out["spliced"][1].values():
            assert np.isfinite(float(np.asarray(v)))
