"""Per-family roofline: FLOP/step (XLA cost model) vs measured throughput.

Extends the flagship ceiling analysis (docs/design.md §8d) to the whole model
zoo: for each training family's fused step this reports the compiled
program's FLOP count, the measured wall per step, the sustained TF/s, the
fraction of the chip's bf16 MXU peak, and the 100%-MXU arithmetic roof in
imgs/s — the number that decides whether remaining headroom is worth chasing
(reference work distribution: ``train/train_vgan_stage1.py:406-432`` runs the
same math as three sequential backward passes).

Usage (on the TPU; ~30 s compile per family on first run)::

    python benchmarks/family_roofline.py [--preset res64-bf16] [--json out]

Timing syncs by pulling a scalar to host (axon ``block_until_ready`` returns
early — CLAUDE.md).  Run on an otherwise-idle host.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # for bench.py

import bench  # noqa: E402  (shared state builders + timing constants)

BF16_PEAK_TFS = 197.0  # v5e MXU bf16 peak (docs/design.md §8d)


def _flops(jitted, *args) -> float:
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def _vgan_stage1(preset):
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        RmsProp, init_vaegan, make_state, make_vgan_stage1_step,
    )

    cfg = get_config(preset)
    c = cfg.model
    step = make_vgan_stage1_step(cfg, "vae-gan", donate=True)
    groups = {k: {"params": g["params"][k], "batch_stats": g["batch_stats"][k]}
              for g in [init_vaegan(jax.random.key(0), cfg)]
              for k in g["params"]}
    state = make_state(groups, {k: RmsProp() for k in groups})
    x = jax.random.uniform(jax.random.key(1),
                           (bench.BATCH, c.image_size, c.image_size, 3),
                           minval=-1.0, maxval=1.0)
    g = (jnp.float32(0.35), jnp.float32(0.68), jnp.float32(1e-6))
    keys = bench._prebuilt_keys(bench.WARMUP + bench.ITERS)
    box = [state]

    def run(i):
        box[0], m = step.train_step(box[0], x, keys[i], *g)
        return m

    return step.train_step, (state, x, keys[0], *g), run, "loss_encoder"


def _wae_stage1(preset):
    import jax

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        Adam, init_latent_disc, init_vaegan, make_state, make_wae_stage1_step,
    )

    cfg = get_config(preset)
    c = cfg.model
    step = make_wae_stage1_step(cfg, donate=True)
    k1, k2 = jax.random.split(jax.random.key(0))
    vg = init_vaegan(k1, cfg)
    groups = {k: {"params": vg["params"][k], "batch_stats": vg["batch_stats"][k]}
              for k in ("encoder", "decoder")}
    groups["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
    state = make_state(groups, {k: Adam() for k in groups})
    x = jax.random.uniform(jax.random.key(1),
                           (bench.BATCH, c.image_size, c.image_size, 3),
                           minval=-1.0, maxval=1.0)
    keys = bench._prebuilt_keys(bench.WARMUP + bench.ITERS)
    box = [state]

    def run(i):
        box[0], m = step.train_step(box[0], x, keys[i])
        return m

    return step.train_step, (state, x, keys[0]), run, "loss_reconstruction"


def _wae_vgan_stage1(preset):
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        RmsProp, init_latent_disc, init_vaegan, make_state, make_wae_vgan_step,
    )

    cfg = get_config(preset)
    c = cfg.model
    step = make_wae_vgan_step(cfg, "vae-gan", donate=True)
    k1, k2 = jax.random.split(jax.random.key(0))
    vg = init_vaegan(k1, cfg)
    groups = {k: {"params": vg["params"][k], "batch_stats": vg["batch_stats"][k]}
              for k in vg["params"]}
    groups["latent_disc"] = init_latent_disc(k2, cfg, init_scheme="uniform")
    state = make_state(groups, {k: RmsProp() for k in groups})
    x = jax.random.uniform(jax.random.key(1),
                           (bench.BATCH, c.image_size, c.image_size, 3),
                           minval=-1.0, maxval=1.0)
    g = (jnp.float32(0.35), jnp.float32(0.68), jnp.float32(1e-6))
    keys = bench._prebuilt_keys(bench.WARMUP + bench.ITERS)
    box = [state]

    def run(i):
        box[0], m = step.train_step(box[0], x, keys[i], *g)
        return m

    return step.train_step, (state, x, keys[0], *g), run, "loss_reconstruction"


def _vgan_cognitive(preset, stage):
    import jax.numpy as jnp

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import RmsProp, make_state, make_vgan_cognitive_step

    cfg = get_config(preset)
    step = make_vgan_cognitive_step(cfg, stage=stage, donate=True)
    trained = ("encoder", "discriminator") if stage == 2 else (
        "decoder", "discriminator")
    state = make_state(bench._cognitive_groups(cfg),
                       {k: RmsProp(clip=1.0) for k in trained})
    batch = bench._pair_batch(cfg)
    g = (jnp.float32(0.35), jnp.float32(0.68), jnp.float32(1e-6))
    keys = bench._prebuilt_keys(bench.WARMUP + bench.ITERS)
    box = [state]

    def run(i):
        box[0], m = step.train_step(box[0], batch, keys[i], *g)
        return m

    return step.train_step, (state, batch, keys[0], *g), run, "loss_encoder"


def _wae_cognitive(preset, stage):
    import jax

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import (
        Adam, init_latent_disc, make_state, make_wae_cognitive_step,
    )

    cfg = get_config(preset)
    step = make_wae_cognitive_step(cfg, stage, donate=True)
    groups = bench._cognitive_groups(cfg)
    del groups["discriminator"]
    groups["latent_disc"] = init_latent_disc(
        jax.random.key(3), cfg, init_scheme="normal")
    opt = Adam(b1=0.5, b2=0.999)
    trained = "encoder" if stage == 2 else "decoder"
    state = make_state(groups, {trained: opt, "latent_disc": opt})
    batch = bench._pair_batch(cfg)
    keys = bench._prebuilt_keys(bench.WARMUP + bench.ITERS)
    box = [state]

    def run(i):
        box[0], m = step.train_step(box[0], batch, keys[i])
        return m

    return step.train_step, (state, batch, keys[0]), run, "loss_reconstruction"


FAMILIES = [
    ("stage1_vgan", _vgan_stage1, None),
    ("stage1_wae", _wae_stage1, None),
    ("stage1_wae_vgan", _wae_vgan_stage1, None),
    ("stage2_vgan", lambda p: _vgan_cognitive(p, 2), None),
    ("stage3_vgan", lambda p: _vgan_cognitive(p, 3), None),
    # WAE family trains fp32 presets
    ("stage2_wae", lambda p: _wae_cognitive(p, 2), "res64"),
    ("stage3_wae", lambda p: _wae_cognitive(p, 3), "res64"),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="res64-bf16")
    ap.add_argument("--json", default=None, help="append JSONL here")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the suite batch (256) — the §8e batch "
                         "sweep probes whether per-layer fixed costs "
                         "amortize at 512/1024 (VERDICT r2 #3)")
    ap.add_argument("--families", nargs="*", default=None,
                    help="subset of family names to run")
    args = ap.parse_args(argv)
    if args.batch:
        bench.BATCH = args.batch  # builders read it at build time

    from fmri_tpu.utils.compile_cache import enable as _compile_cache
    _compile_cache()  # the AOT cost-analysis compile then serves the run too

    rows = []
    for name, build, preset_override in FAMILIES:
        if args.families and name not in args.families:
            continue
        preset = preset_override or args.preset
        jitted, ex_args, run, sync_key = build(preset)
        flops = _flops(jitted, *ex_args)
        # same timing harness as the bench suite (host-pull sync discipline)
        sec = bench.BATCH / bench._time_steps(run, sync_key, bench.BATCH)
        tfs = flops / sec / 1e12
        roof = bench.BATCH / (flops / (BF16_PEAK_TFS * 1e12))
        row = {
            "family": name, "preset": preset, "batch": bench.BATCH,
            "gflop_per_step": round(flops / 1e9, 1),
            "ms_per_step": round(sec * 1e3, 2),
            "imgs_per_sec": round(bench.BATCH / sec, 1),
            "tf_per_sec": round(tfs, 1),
            "pct_of_peak": round(100 * tfs / BF16_PEAK_TFS, 1),
            "roof_imgs_per_sec": round(roof, 0),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
