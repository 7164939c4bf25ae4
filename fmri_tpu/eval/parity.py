"""One-command quality-parity harness (BASELINE.md table 2).

The moment real BOLD5000 data and a released reference ``.pth`` land, this
produces the parity numbers in one invocation::

    python -m fmri_tpu.eval.parity \
        --family vgan --stage 3 --preset res100 \
        --ref-ckpt /path/vaegan_cog_3st_20210928.pth \
        --ckpt runs/stage3/ckpt \
        --dataset bold --input <packed_dir> --output parity_out

It glues three existing subsystems end-to-end:

  1. ``fmri_tpu.checkpoints.torch_import`` — converts the reference
     checkpoint into a framework checkpoint dir (layout-validated, exact
     forward parity per ``tests/test_reference_parity.py``);
  2. ``fmri_tpu.eval.inference`` — reconstructs the validation set and
     computes the reference's own metric battery: mean PCC / SSIM / MSE
     (+ optional IS) and the 2/5/10-way objective identification scores
     (``/root/reference/inference/inference_gan.py:269-307``,
     ``train/train_utils.py:678-816``);
  3. a side-by-side report: one row per checkpoint (the imported reference
     one, and optionally a framework-trained one via ``--ckpt``), emitted
     as ``parity.json`` + a markdown table ready to paste into BASELINE.md.

Runs end-to-end on the synthetic fixtures today (``--dataset synthetic``,
the default) — exercised by ``tests/test_parity_cli.py`` — so the real-data
invocation (docs/parity_runbook.md) is a data-path change only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

_KIND_BY_FAMILY_STAGE = {
    ("vgan", 1): "vae-gan",
    ("vgan", 2): "vae-gan-cognitive",
    ("vgan", 3): "vae-gan-cognitive",
    ("wae", 1): "wae-gan",
    ("wae", 2): "wae-gan-cognitive",
    ("wae", 3): "wae-gan-cognitive",
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--family", choices=["vgan", "wae"], default="vgan")
    p.add_argument("--stage", type=int, choices=[1, 2, 3], default=3)
    p.add_argument("--preset", default="res100",
                   help="res100 = the reference's checked-in config "
                        "(models_config.py:13-21)")
    p.add_argument("--ref-ckpt", default=None,
                   help="reference .pth (torch.save(model.state_dict())); "
                        "converted and evaluated as the 'reference' row")
    p.add_argument("--ref-epoch", type=int, default=None,
                   help="epoch number recorded for the converted checkpoint")
    p.add_argument("--ckpt", default=None,
                   help="framework checkpoint dir; evaluated as the "
                        "'framework' row")
    p.add_argument("--load-epoch", type=int, default=None)
    p.add_argument("--dataset", default="synthetic",
                   help="synthetic | bold5000/coco dirs (same values as "
                        "fmri_tpu.eval.inference --dataset)")
    p.add_argument("--input", "-i", default=None)
    p.add_argument("--valid-input", default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--num-voxels", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--no-is", action="store_true",
                   help="skip the Inception Score column")
    p.add_argument("--synthetic-n", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", "-o", default="parity_out")
    return p


def _inference_args(args, ckpt: str, outdir: str) -> List[str]:
    argv = ["--family", args.family, "--stage", str(args.stage),
            "--preset", args.preset, "--ckpt", ckpt,
            "--dataset", args.dataset, "--output", outdir,
            "--seed", str(args.seed), "--max-batches", str(args.max_batches)]
    for flag, val in (("--input", args.input),
                      ("--valid-input", args.valid_input),
                      ("--cache-dir", args.cache_dir),
                      ("--num-voxels", args.num_voxels),
                      ("--batch-size", args.batch_size),
                      ("--synthetic-n", args.synthetic_n),
                      ("--load-epoch", args.load_epoch)):
        if val is not None:
            argv += [flag, str(val)]
    if args.no_is:
        argv.append("--no-is")
    return argv


def _evaluate(args, ckpt: str, outdir: str) -> Dict:
    from fmri_tpu.eval import inference

    rc = inference.main(_inference_args(args, ckpt, outdir))
    if rc != 0:
        raise RuntimeError(f"inference failed for {ckpt}")
    with open(os.path.join(outdir, "summary.json")) as f:
        return json.load(f)


def _row(name: str, s: Dict) -> Dict:
    out = {"checkpoint": name, "num_images": s.get("num_images"),
           "pcc": s.get("pcc"), "ssim": s.get("ssim"), "mse": s.get("mse")}
    for k in ("is_mean", "is_std", "is_proxy"):
        if k in s:
            out[k] = s[k]
    obj = s.get("objective", {})
    for i, top in enumerate(obj.get("top", [])):
        out[f"pcc_{top}way"] = obj["pcc"][i]
        out[f"ssim_{top}way"] = obj["ssim"][i]
    return out


def _markdown(rows: List[Dict]) -> str:
    cols = ["checkpoint", "pcc", "ssim", "mse",
            "pcc_2way", "pcc_5way", "pcc_10way",
            "ssim_2way", "ssim_5way", "ssim_10way"]
    present = [c for c in cols if any(c in r for r in rows)]
    fmt = lambda v: f"{v:.4f}" if isinstance(v, float) else str(v)
    lines = ["| " + " | ".join(present) + " |",
             "|" + "---|" * len(present)]
    for r in rows:
        lines.append("| " + " | ".join(fmt(r.get(c, "")) for c in present)
                     + " |")
    return "\n".join(lines)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.ref_ckpt and not args.ckpt:
        print("nothing to evaluate: pass --ref-ckpt and/or --ckpt",
              file=sys.stderr)
        return 2
    os.makedirs(args.output, exist_ok=True)
    rows: List[Dict] = []

    if args.ref_ckpt:
        from fmri_tpu.checkpoints import torch_import

        kind = _KIND_BY_FAMILY_STAGE[(args.family, args.stage)]
        conv_dir = os.path.join(args.output, "converted_ref_ckpt")
        conv_argv = ["--input", args.ref_ckpt, "--output", conv_dir,
                     "--kind", kind, "--preset", args.preset]
        if args.ref_epoch is not None:
            conv_argv += ["--epoch", str(args.ref_epoch)]
        if args.num_voxels is not None:
            conv_argv += ["--num-voxels", str(args.num_voxels)]
        rc = torch_import.main(conv_argv)
        if rc != 0:
            raise RuntimeError(f"conversion failed for {args.ref_ckpt}")
        s = _evaluate(args, conv_dir, os.path.join(args.output, "ref"))
        rows.append(_row(f"reference ({os.path.basename(args.ref_ckpt)})", s))

    if args.ckpt:
        s = _evaluate(args, args.ckpt, os.path.join(args.output, "framework"))
        rows.append(_row(f"framework ({args.ckpt})", s))

    report = {"preset": args.preset, "family": args.family,
              "stage": args.stage, "dataset": args.dataset, "rows": rows}
    with open(os.path.join(args.output, "parity.json"), "w") as f:
        json.dump(report, f, indent=2)
    md = _markdown(rows)
    with open(os.path.join(args.output, "parity.md"), "w") as f:
        f.write(md + "\n")
    print(md)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
