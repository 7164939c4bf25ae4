"""Paired-seed fp32-vs-bf16 quality experiment (design.md §4, VERDICT r2 #8).

Round 2's 2x2 {precision} x {seed} grid was inconclusive because seed
variance swamped the precision effect.  The discriminating design is PAIRED:
for each seed, run the full 3-stage synthetic vgan chain twice — once fp32
(`res64`), once bf16 (`res64-bf16`) — with the SAME seed and therefore the
same data order (the PRNG contract folds epoch/batch from the seed and is
precision-independent), and draw the conclusion from the per-seed DELTAS
(bf16 - fp32), not the raw scores.

Usage (TPU, idle host; ~N_SEEDS x 2 chains):

    python benchmarks/bf16_paired.py [--seeds 0 1 2 3] [--epochs 60 20 10]
        [--synthetic-n 512] [--out benchmarks/results_bf16_paired.json]

Prints the paired table and writes JSON; paste the table into
docs/design.md §4 and promote/reject the `-bf16` defaults on the evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env=None, timeout=1800):
    """One CLI stage, bounded: the tunneled TPU occasionally stalls a
    device op indefinitely mid-run — a hung stage is killed and surfaced
    as RuntimeError so the chain-level retry redoes it."""
    try:
        r = subprocess.run([sys.executable, "-m", *cmd], capture_output=True,
                           text=True, cwd=ROOT, env=env or dict(os.environ),
                           timeout=timeout)
    except subprocess.TimeoutExpired as e:
        raise RuntimeError(f"{' '.join(cmd)} hung past {timeout}s") from e
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{r.stderr[-4000:]}")
    return r.stdout


def _find_run_dir(root):
    hits = [d for d, _dirs, files in os.walk(root) if "results.csv" in files]
    assert len(hits) == 1, hits
    return hits[0]


def chain(preset: str, seed: int, epochs, synthetic_n: int, out_root: str):
    """stage1 -> stage2 -> stage3 -> inference summary dict.

    Resumable at chain granularity: a completed chain's summary is reused
    only when its recorded run parameters match this invocation's (a stale
    workdir from a different --epochs/--synthetic-n would silently
    mislabel the experiment); a partial or mismatched one (e.g. killed by
    a transient tunnel error — the axon TPU occasionally drops a contact
    with FAILED_PRECONDITION) is wiped and redone."""
    params = {"preset": preset, "seed": seed, "epochs": list(epochs),
              "synthetic_n": synthetic_n}
    summary_path = os.path.join(out_root, "inf", "summary.json")
    params_path = os.path.join(out_root, "chain_params.json")
    if os.path.exists(summary_path) and os.path.exists(params_path):
        with open(params_path) as f:
            if json.load(f) == params:
                with open(summary_path) as f2:
                    return json.load(f2)
    if os.path.exists(out_root):
        import shutil

        shutil.rmtree(out_root)
    os.makedirs(out_root)
    with open(params_path, "w") as f:
        json.dump(params, f)
    base = ["fmri_tpu.train.run", "--preset", preset, "--dataset", "synthetic",
            "--synthetic-n", str(synthetic_n), "--seed", str(seed)]
    d1 = os.path.join(out_root, "s1")
    _run(base + ["--family", "vgan", "--stage", "1",
                 "--epochs", str(epochs[0]), "-o", d1])
    c1 = os.path.join(_find_run_dir(d1), "checkpoints")
    d2 = os.path.join(out_root, "s2")
    _run(base + ["--family", "vgan", "--stage", "2",
                 "--epochs", str(epochs[1]), "--prev-ckpt", c1, "-o", d2])
    c2 = os.path.join(_find_run_dir(d2), "checkpoints")
    d3 = os.path.join(out_root, "s3")
    _run(base + ["--family", "vgan", "--stage", "3",
                 "--epochs", str(epochs[2]), "--prev-ckpt", c2, "-o", d3])
    c3 = os.path.join(_find_run_dir(d3), "checkpoints")
    inf = os.path.join(out_root, "inf")
    _run(["fmri_tpu.eval.inference", "--family", "vgan", "--stage", "3",
          "--preset", preset, "--dataset", "synthetic",
          "--synthetic-n", str(synthetic_n), "--seed", str(seed),
          "--ckpt", c3, "--no-is", "-o", inf])
    with open(os.path.join(inf, "summary.json")) as f:
        return json.load(f)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    ap.add_argument("--epochs", type=int, nargs=3, default=[60, 20, 10])
    ap.add_argument("--synthetic-n", type=int, default=512)
    ap.add_argument("--workdir", default="/tmp/fmri_tpu_bf16_paired")
    ap.add_argument("--out",
                    default=os.path.join(ROOT, "benchmarks",
                                         "results_bf16_paired.json"))
    args = ap.parse_args(argv)

    rows = []
    for seed in args.seeds:
        pair = {}
        for preset in ("res64", "res64-bf16"):
            wd = os.path.join(args.workdir, f"seed{seed}_{preset}")
            try:
                s = chain(preset, seed, args.epochs, args.synthetic_n, wd)
            except RuntimeError as e:  # one retry for transient TPU drops
                print(f"seed {seed} {preset}: retrying after {e}",
                      file=sys.stderr, flush=True)
                s = chain(preset, seed, args.epochs, args.synthetic_n, wd)
            top2 = s["objective"]["pcc"][0]  # 2-way PCC identification
            pair[preset] = {"pcc": s["pcc"], "ssim": s["ssim"],
                            "top2": top2}
            print(f"seed {seed} {preset}: pcc={s['pcc']:.3f} "
                  f"ssim={s['ssim']:.3f} top2={top2:.2f}", flush=True)
        rows.append({
            "seed": seed, **{p.replace('-', '_'): v for p, v in pair.items()},
            "delta_pcc": pair["res64-bf16"]["pcc"] - pair["res64"]["pcc"],
            "delta_ssim": pair["res64-bf16"]["ssim"] - pair["res64"]["ssim"],
            "delta_top2": pair["res64-bf16"]["top2"] - pair["res64"]["top2"],
        })

    import statistics as st

    deltas = [r["delta_pcc"] for r in rows]
    summary = {
        "n_seeds": len(rows),
        "mean_delta_pcc": st.mean(deltas),
        "stdev_delta_pcc": st.stdev(deltas) if len(deltas) > 1 else 0.0,
        "all_positive": all(d > 0 for d in deltas),
        "all_negative": all(d < 0 for d in deltas),
    }
    report = {"rows": rows, "summary": summary,
              "epochs": args.epochs, "synthetic_n": args.synthetic_n}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)

    print("\n| seed | pcc fp32 | pcc bf16 | delta pcc | delta ssim | delta top2 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['seed']} | {r['res64']['pcc']:.3f} | "
              f"{r['res64_bf16']['pcc']:.3f} | {r['delta_pcc']:+.3f} | "
              f"{r['delta_ssim']:+.3f} | {r['delta_top2']:+.2f} |")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
