"""Inference / evaluation CLI — the ``inference/inference_gan.py`` equivalent.

    python -m fmri_tpu.eval.inference --family vgan --stage 3 \
        --ckpt results/vgan_stage3/<run>/checkpoints --dataset bold -i ... -o out

Behaviors (reference ``inference_gan.py``):
  * ``--evaluate`` (default): full-dataset PCC/SSIM/MSE/IS + 2/5/10-way
    objective assessment, CSV + bar chart (``:269-307``);
  * ``--save-images``: dump reconstructions resized to ``--resize`` px
    (``:273-275,339-442``).

The (dataset x mode) composite dispatch (``:213-258``) becomes (family x
stage): the checkpoint already contains every needed group.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _apply_platform_override() -> None:
    """Honor FMRI_TPU_PLATFORM (e.g. 'cpu') even when a site hook pins the
    JAX platform at interpreter startup (the axon hook overrides
    JAX_PLATFORMS, so tests/tools need a config-level override)."""
    plat = os.environ.get("FMRI_TPU_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--family", choices=["vgan", "wae", "wae-vgan"], required=True)
    p.add_argument("--stage", type=int, choices=[1, 2, 3], default=1)
    p.add_argument("--preset", default="res64")
    p.add_argument("--ckpt", required=True, help="checkpoint dir of the run")
    p.add_argument("--load-epoch", type=int, default=None)
    p.add_argument("--dataset", default="synthetic",
                   choices=["coco", "bold", "mnist69", "synthetic"])
    p.add_argument("--input", "-i", default=None)
    p.add_argument("--valid-input", default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--output", "-o", default="inference_out")
    p.add_argument("--logs", "-l", default=None, help="unused; CLI parity")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-voxels", type=int, default=None,
                   help="override the preset's fMRI voxel count (must match "
                        "the checkpoint's CognitiveEncoder)")
    p.add_argument("--max-batches", type=int, default=0, help="0 = all")
    p.add_argument("--no-evaluate", action="store_true",
                   help="skip metrics; just reconstruct + save images")
    p.add_argument("--no-is", action="store_true", help="skip Inception Score")
    p.add_argument("--sample", action="store_true",
                   help="reparameterize at eval (VAE/GAN families)")
    p.add_argument("--save-images", action="store_true")
    p.add_argument("--resize", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic-n", type=int, default=None,
                   help="synthetic dataset size (default 4*batch)")
    return p


def make_step_fns(family: str, stage: int, cfg):
    """(family x stage) -> (StepFns, data_kind) — the full step bundle
    (train/eval/generate); serving uses eval + generate."""
    from fmri_tpu.train import (
        make_vgan_cognitive_step, make_vgan_stage1_step,
        make_wae_cognitive_step, make_wae_stage1_step, make_wae_vgan_step,
    )

    if family == "wae-vgan":
        return make_wae_vgan_step(cfg, donate=False), "image"
    if family == "vgan":
        if stage == 1:
            return make_vgan_stage1_step(cfg, donate=False), "image"
        return make_vgan_cognitive_step(cfg, stage, donate=False), "pair"
    if stage == 1:
        return make_wae_stage1_step(cfg, donate=False), "image"
    return make_wae_cognitive_step(cfg, stage, donate=False), "pair"


def make_eval_step(family: str, stage: int, cfg):
    fns, kind = make_step_fns(family, stage, cfg)
    return fns.eval_step, kind


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _apply_platform_override()
    from fmri_tpu.utils.compile_cache import enable as _compile_cache
    _compile_cache()  # persistent XLA cache: 12x faster cold starts

    import dataclasses

    from fmri_tpu.checkpoints.store import load_eval_state
    from fmri_tpu.configs import get_config
    from fmri_tpu.data.pipeline import Batches
    from fmri_tpu.eval.evaluate import (
        objective_scores, quality_metrics, reconstruct_dataset,
        save_objective_bar_chart, save_objective_csv, save_reconstructions,
    )
    from fmri_tpu.train import run as train_run

    cfg = get_config(args.preset)
    if args.batch_size:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size))
    if args.num_voxels is not None:
        from fmri_tpu.configs.presets import override_num_voxels

        cfg = override_num_voxels(cfg, args.num_voxels)

    eval_step, data_kind = make_eval_step(args.family, args.stage, cfg)
    state, meta = load_eval_state(args.ckpt, epoch=args.load_epoch)

    # reuse the training CLI's data loading (same flags/layout)
    if data_kind == "image":
        _, valid = train_run._load_images(args, cfg)
    else:
        _, valid = train_run._load_pairs(args, cfg)

    batches = Batches(valid, cfg.train.batch_size, shuffle=False, drop_last=False)
    recons, targets = reconstruct_dataset(
        eval_step, state, iter(batches), data_kind=data_kind,
        mean=cfg.data.mean, std=cfg.data.std, sample=args.sample,
        seed=args.seed, max_batches=args.max_batches)

    os.makedirs(args.output, exist_ok=True)
    summary = {"checkpoint_epoch": meta.get("epoch"),
               "num_images": int(len(recons))}
    if not args.no_evaluate:
        summary.update(quality_metrics(recons, targets, with_is=not args.no_is))
        scores = objective_scores(recons, targets, seed=args.seed)
        save_objective_csv(scores, os.path.join(args.output, "objective.csv"))
        save_objective_bar_chart(
            scores, os.path.join(args.output, "objective.png"))
        summary["objective"] = scores
    if args.save_images:
        save_reconstructions(recons, os.path.join(args.output, "images"),
                             resize_to=args.resize)
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
