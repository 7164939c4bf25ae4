"""Training CLI — the single entry point replacing the reference's 7 scripts.

Usage (reference flag contract ``-i/-o/-l`` preserved,
``train_vgan_stage1.py:36-81``):

    python -m fmri_tpu.train.run --family vgan --stage 1 --dataset coco \
        -i /data/coco/train2017 -o results -l logs
    python -m fmri_tpu.train.run --family vgan --stage 2 --dataset bold \
        -i /data/bold_roi --prev-ckpt results/vgan_stage1/<run>/checkpoints ...
    python -m fmri_tpu.train.run --family wae --stage 3 --dataset bold \
        --prev-ckpt <stage2 ckpts> --stage1-ckpt <stage1 ckpts> ...

Families x stages map to the reference scripts:
  vgan 1/2/3      -> train_vgan_stage{1,2,3}.py
  wae 1/2/3       -> train_wae_stage{1,2,3}.py
  wae-vgan 1      -> wae_vgan_stage1.py

``--dataset synthetic`` runs the MNIST-style smoke path
(``train_vgan_stage1.py:198-221``) with generated data — no files needed.
``--evaluate`` turns the run into a metrics-only pass over the validation set
(the reference's ``evaluate=True`` early-exit, ``train_vgan_stage1.py:247-257``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional, Tuple

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
    p.add_argument("--family", choices=["vgan", "wae", "wae-vgan", "exp"],
                   required=True)
    p.add_argument("--stage", type=int, choices=[1, 2, 3], default=1)
    p.add_argument("--exp", default=None,
                   choices=["decoder", "vae", "vgan", "dcgan-stage1",
                            "dcgan-stage2"],
                   help="ablation experiment (--family exp; "
                        "reference experiments/ scripts)")
    p.add_argument("--preset", default="res64",
                   help="config preset: res64 | res100 | tiny")
    p.add_argument("--mode", default="vae-gan",
                   choices=["vae-gan", "vae", "beta-vae", "dcgan"],
                   help="loss algebra for the vgan family "
                        "(train_vgan_stage1.py:359-387)")
    p.add_argument("--dataset", default="synthetic",
                   choices=["coco", "bold", "mnist69", "synthetic"])
    p.add_argument("--input", "-i", default=None,
                   help="data root (images dir for coco, bold_roi dir or "
                        "pickle for bold, .mat for mnist69); the reference "
                        "trains Stage I on COCO train+test concatenated "
                        "(train_vgan_stage1.py:193) — pass a dir containing "
                        "both, or use --valid-input for a separate val dir")
    p.add_argument("--output", "-o", default="results")
    p.add_argument("--logs", "-l", default=None, help="unused; kept for "
                   "reference CLI parity (logs go to the run dir)")
    p.add_argument("--valid-input", default=None,
                   help="separate validation data root (default: split train)")
    p.add_argument("--prev-ckpt", default=None,
                   help="previous stage's checkpoint dir (stages 2/3)")
    p.add_argument("--stage1-ckpt", default=None,
                   help="stage-1 checkpoint dir (wae stage 3 teacher)")
    p.add_argument("--load-epoch", type=int, default=None,
                   help="epoch to load from --prev-ckpt (default latest)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-voxels", type=int, default=None,
                   help="override the preset's fMRI voxel count (the "
                        "reference measures it from the data, "
                        "train_vgan_stage2.py:182 — use for masks/ROIs no "
                        "preset names)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lam", type=float, default=None,
                   help="WAE/Dual-GAN latent-D weight (the reference's "
                        "--lam, wae_vgan_stage1.py:87; default 1.0)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--no-teacher", action="store_true",
                   help="vgan stage 2 without distillation "
                        "(--mode vae path, train_vgan_stage2.py:234-238)")
    p.add_argument("--eval-batches", type=int, default=1,
                   help="validation batches per epoch (reference uses 1)")
    p.add_argument("--evaluate", action="store_true",
                   help="metrics-only pass; requires --resume-dir or --prev-ckpt")
    p.add_argument("--resume-dir", default=None,
                   help="existing run dir to resume (reads its checkpoints)")
    p.add_argument("--debug", action="store_true",
                   help="route artifacts to <output>/debug, skip checkpoints")
    p.add_argument("--profile", action="store_true",
                   help="dump a jax.profiler trace of epoch 2")
    p.add_argument("--mesh", default=None,
                   help="'data=N[,model=M]' device mesh for SPMD runs")
    p.add_argument("--cache-dir", default=None,
                   help="where to cache packed image arrays (.npz)")
    p.add_argument("--synthetic-n", type=int, default=None,
                   help="synthetic dataset size (default 4*batch)")
    p.add_argument("--on-device-epochs", action="store_true",
                   help="run each epoch as one lax.scan over the "
                        "device-resident dataset (needs it to fit in HBM)")
    p.add_argument("--async-ckpt", action="store_true",
                   help="write checkpoints on a background thread "
                        "(overlaps the next epoch's compute)")
    p.add_argument("--keep-last", type=int, default=0,
                   help="retain only the K most recent checkpoints "
                        "(0 = keep all, the reference behaviour)")
    p.add_argument("--keep-best", type=int, default=0,
                   help="also retain the K checkpoints with the best "
                        "valid_PCC (0 = off)")
    return p


def _parse_mesh(spec: Optional[str]):
    if not spec:
        return None, False
    from fmri_tpu.parallel.mesh import make_mesh

    kv = dict(part.split("=") for part in spec.split(","))
    model = int(kv.get("model", 1))
    mesh = make_mesh(data=int(kv["data"]) if "data" in kv else None, model=model)
    return mesh, model > 1


def _open_packed_split(args, cfg, keys):
    """Open a mmap streaming dir (``fmri_tpu.data.packed``) as (train, valid).

    Arrays stay memory-mapped uint8/float32 on the host; batches ship to the
    device undecoded and ``train_augment`` dequantizes there.  ``--valid-input``
    may name a second packed dir; otherwise a leading 10% slice (a view, still
    lazy) is held out.
    """
    from fmri_tpu.data import is_packed_dir, open_packed

    train, _ = open_packed(args.input)
    have = set(train) if isinstance(train, dict) else {"image"}
    if set(keys) - have:
        raise SystemExit(
            f"packed dir {args.input} lacks arrays {sorted(set(keys) - have)}")
    if args.valid_input:
        if not is_packed_dir(args.valid_input):
            raise SystemExit("--valid-input must also be a packed dir when "
                             "--input is one")
        valid, _ = open_packed(args.valid_input)
        have_v = set(valid) if isinstance(valid, dict) else {"image"}
        if set(keys) - have_v:
            raise SystemExit(
                f"packed dir {args.valid_input} lacks arrays "
                f"{sorted(set(keys) - have_v)}")
        return train, valid
    n = len(next(iter(train.values()))) if isinstance(train, dict) else len(train)
    k = max(n // 10, cfg.train.batch_size)
    if n - k < cfg.train.batch_size:
        raise SystemExit(
            f"packed dir {args.input} has {n} examples; after holding out "
            f"{k} for validation the train split is smaller than one batch "
            f"({cfg.train.batch_size}) — provide more data, a --valid-input "
            f"dir, or a smaller --batch-size")
    if isinstance(train, dict):
        return ({key: v[k:] for key, v in train.items()},
                {key: v[:k] for key, v in train.items()})
    return train[k:], train[:k]


def _load_images(args, cfg) -> Tuple[np.ndarray, np.ndarray]:
    """Stage-I image data: train/valid float32 [N, S, S, 3] arrays."""
    from fmri_tpu.data import CocoImages, is_packed_dir

    c = cfg.data
    if args.input and is_packed_dir(args.input):
        train, valid = _open_packed_split(args, cfg, ("image",))
        if isinstance(train, dict):  # a pairs dir also serves stage 1
            train, valid = train["image"], valid["image"]
        return train, valid
    if args.dataset == "synthetic":
        from fmri_tpu.data.synthetic import synthetic_images

        n = args.synthetic_n or max(4 * cfg.train.batch_size, 64)
        imgs, _ = synthetic_images(n, c.image_size, seed=0)
        k = max(len(imgs) // 10, cfg.train.batch_size)
        return imgs[k:], imgs[:k]
    if args.dataset != "coco":
        raise SystemExit(f"stage 1 expects --dataset coco|synthetic, got {args.dataset}")
    cache = (os.path.join(args.cache_dir, "coco_train.npz")
             if args.cache_dir else None)
    train = CocoImages(args.input, crop=c.image_crop,
                       size=c.image_size).as_array(cache)
    if args.valid_input:
        vcache = (os.path.join(args.cache_dir, "coco_valid.npz")
                  if args.cache_dir else None)
        valid = CocoImages(args.valid_input, crop=c.image_crop,
                           size=c.image_size).as_array(vcache)
    else:
        k = max(len(train) // 10, cfg.train.batch_size)
        train, valid = train[k:], train[:k]
    return train, valid


def _load_pairs(args, cfg):
    """Stage-II/III paired data: {'fmri','image'} dict arrays."""
    from fmri_tpu.data import (
        BoldRoiDataset, Mnist69, concatenate_bold_data, split_dataset,
    )

    c = cfg.data
    if args.input and os.path.isdir(args.input):
        from fmri_tpu.data import is_packed_dir

        if is_packed_dir(args.input):
            return _open_packed_split(args, cfg, ("fmri", "image"))
    if args.dataset == "synthetic":
        from fmri_tpu.data.synthetic import synthetic_pairs

        n = args.synthetic_n or max(4 * cfg.train.batch_size, 64)
        data = synthetic_pairs(n, c.image_size, cfg.model.num_voxels, seed=0)
        k = max(n // 10, cfg.train.batch_size)
        return ({key: v[k:] for key, v in data.items()},
                {key: v[:k] for key, v in data.items()})
    if args.dataset == "mnist69":
        arrays = Mnist69(args.input, size=c.image_size).as_arrays()
        k = max(len(arrays["fmri"]) // 5, cfg.train.batch_size)  # 80/20 (:196)
        return ({key: v[:-k] for key, v in arrays.items()},
                {key: v[-k:] for key, v in arrays.items()})
    if args.dataset != "bold":
        raise SystemExit(f"stages 2/3 expect --dataset bold|mnist69|synthetic")
    if os.path.isdir(args.input):
        # auto-detect the CSI* subject dirs present (the reference hard-codes
        # subjects in data_config.py; a subset layout should just work)
        subs = tuple(sorted(
            d for d in os.listdir(args.input)
            if d.startswith("CSI") and os.path.isdir(os.path.join(args.input, d))))
        records = concatenate_bold_data(args.input.rstrip("/") + "/",
                                        subjects=subs or None)
    else:
        import pickle

        with open(args.input, "rb") as f:
            records = pickle.load(f)
    train_recs, valid_recs = split_dataset(records, cfg.data.data_split,
                                           cfg.data.split_seed)

    def pack(recs, tag):
        cache = (os.path.join(args.cache_dir, f"bold_{tag}.npz")
                 if args.cache_dir else None)
        return BoldRoiDataset(recs, crop=c.image_crop,
                              size=c.image_size).as_arrays(cache)

    return pack(train_recs, "train"), pack(valid_recs, "valid")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _apply_platform_override()
    from fmri_tpu.utils.compile_cache import enable as _compile_cache
    _compile_cache()  # persistent XLA cache: 12x faster cold starts

    import dataclasses

    import jax

    from fmri_tpu.configs import get_config
    from fmri_tpu.train import BUILDERS, Trainer
    from fmri_tpu.utils.runlog import create_run_dir

    cfg = get_config(args.preset)
    tr = cfg.train
    overrides = {}
    if args.epochs is not None:
        overrides["n_epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.lam is not None:
        overrides["wae_vgan_lam"] = args.lam
    if args.seed is not None:
        overrides["seed"] = args.seed
    if overrides:
        cfg = cfg.replace(train=dataclasses.replace(tr, **overrides))
    if args.num_voxels is not None:
        from fmri_tpu.configs.presets import override_num_voxels

        cfg = override_num_voxels(cfg, args.num_voxels)

    if args.family == "exp":
        if not args.exp:
            raise SystemExit("--family exp needs --exp")
        builder_name = "exp_" + args.exp.replace("-", "_")
    else:
        family_key = {"vgan": "vgan", "wae": "wae",
                      "wae-vgan": "wae_vgan"}[args.family]
        if args.family == "wae-vgan" and args.stage != 1:
            raise SystemExit("wae-vgan has only stage 1 (wae_vgan_stage1.py)")
        builder_name = f"{family_key}_stage{args.stage}"
    if builder_name not in BUILDERS:
        raise SystemExit(f"unknown stage combination: {builder_name}")
    image_data = (args.stage == 1 and args.family != "exp") or \
        builder_name == "exp_dcgan_stage1"

    # ---- data ----
    if image_data:
        train_data, valid_data = _load_images(args, cfg)
    else:
        train_data, valid_data = _load_pairs(args, cfg)
    n_train = (len(train_data) if not isinstance(train_data, dict)
               else len(train_data["fmri"]))
    steps_per_epoch = max(n_train // cfg.train.batch_size, 1)

    # ---- builder ----
    bkw = dict(steps_per_epoch=steps_per_epoch, seed=cfg.train.seed)
    if args.family in ("vgan", "wae-vgan"):
        bkw["mode"] = args.mode
        if args.stage == 2:
            bkw["use_teacher"] = not args.no_teacher
    if builder_name == "exp_dcgan_stage2":
        if not args.prev_ckpt:
            raise SystemExit("exp dcgan-stage2 needs --prev-ckpt (dcgan stage 1)")
        bkw["stage1_ckpt"] = args.prev_ckpt
        bkw["epoch"] = args.load_epoch
    if args.family != "exp" and args.stage >= 2:
        if not args.prev_ckpt:
            raise SystemExit("stages 2/3 need --prev-ckpt")
        key = "stage1_ckpt" if args.stage == 2 else "stage2_ckpt"
        bkw[key] = args.prev_ckpt
        bkw["epoch"] = args.load_epoch
        if builder_name == "wae_stage3":
            if not args.stage1_ckpt:
                raise SystemExit("wae stage 3 needs --stage1-ckpt (teacher)")
            bkw["stage1_ckpt"] = args.stage1_ckpt

    state, steps, tkw = BUILDERS[builder_name](cfg, **bkw)

    mesh, voxel_tp = _parse_mesh(args.mesh)
    run_dir = args.resume_dir or create_run_dir(
        args.output, builder_name, debug=args.debug)
    retention = None
    if args.keep_last or args.keep_best:
        retention = dict(keep_last=args.keep_last, keep_best=args.keep_best)
    trainer = Trainer(cfg, steps, run_dir, mesh=mesh,
                      voxel_tp=voxel_tp and args.stage >= 2,
                      debug=args.debug, profile=args.profile,
                      async_ckpt=args.async_ckpt, ckpt_retention=retention,
                      **tkw)

    start_epoch = 0
    if args.resume_dir:
        state, start_epoch = trainer.resume(state, epoch=args.load_epoch)

    if args.evaluate:
        from fmri_tpu.data.pipeline import Batches

        vm = trainer.evaluate_batches(
            state, iter(Batches(valid_data, cfg.train.batch_size)),
            jax.random.key(cfg.train.seed), max_batches=0)
        print(json.dumps({f"valid_{k}": v for k, v in vm.items()}, indent=2))
        return 0

    trainer.fit(state, train_data, valid_data, start_epoch=start_epoch,
                eval_batches=args.eval_batches,
                on_device=args.on_device_epochs)
    print(f"run artifacts: {run_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
