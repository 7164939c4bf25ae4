"""Full-dataset evaluation: PCC / SSIM / MSE / Inception Score + n-way
objective identification, with reconstruction dumps.

Ports the behavior of ``train/train_utils.py:678-816`` and the evaluation
branch of ``inference/inference_gan.py:269-307``:

  * per-batch reconstructions via the family's eval step;
  * metrics on denormalized images; reconstructions optionally resized (the
    reference saves them at 200px, ``inference_gan.py:273-275``) and saved;
  * Inception Score through the pluggable classifier
    (``fmri_tpu.metrics.inception``);
  * 2/5/10-way objective assessment (vmap'd, ``fmri_tpu.metrics.quality``)
    with the reference's bar-chart + CSV artifacts.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import numpy as np

from fmri_tpu.data.transforms import denormalize, eval_preprocess, resize_batch
from fmri_tpu.metrics.inception import inception_score
from fmri_tpu.metrics.quality import (
    mse, objective_assessment, pearson_correlation, ssim,
)


def reconstruct_dataset(eval_step, state, batches: Iterable, *,
                        data_kind: str = "pair",
                        mean: Sequence[float] = (0.5, 0.5, 0.5),
                        std: Sequence[float] = (0.5, 0.5, 0.5),
                        sample: bool = False, seed: int = 0,
                        max_batches: int = 0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the eval step over a dataset; returns (recons, targets) as
    denormalized float arrays in [0, 1] range convention of the metrics."""
    rng = jax.random.key(seed)
    recons, targets = [], []
    for i, batch in enumerate(batches):
        if max_batches and i >= max_batches:
            break
        if isinstance(batch, dict):
            target = batch["image"]
            batch = dict(batch, image=eval_preprocess(batch["image"], mean, std))
            inp = batch if data_kind == "pair" else batch["image"]
        else:
            target = batch
            inp = eval_preprocess(batch, mean, std)
        rng, k = jax.random.split(rng)
        recon = eval_step(state, inp, k if sample else None)
        recons.append(np.asarray(denormalize(recon, mean, std)))
        targets.append(np.asarray(target))
    return np.concatenate(recons), np.concatenate(targets)


def quality_metrics(recons: np.ndarray, targets: np.ndarray, *,
                    with_is: bool = True) -> Dict[str, float]:
    """Mean PCC/SSIM/MSE (+ Inception Score) over full arrays
    (``train_utils.py:678-749``).  On TPU the SSIM uses the fused Pallas
    windowed-moments kernel (``fmri_tpu.ops.pallas_ssim``); elsewhere the XLA
    depthwise-conv path — both paths are equivalence-tested."""
    import jax.numpy as jnp

    r, t = jnp.asarray(recons), jnp.asarray(targets)
    if jax.devices()[0].platform == "tpu":
        from fmri_tpu.ops.pallas_ssim import ssim_pallas

        ssim_val = float(ssim_pallas(r, t))
    else:
        ssim_val = float(ssim(r, t))
    out = {
        "pcc": float(pearson_correlation(r, t)),
        "ssim": ssim_val,
        "mse": float(mse(r, t)),
    }
    if with_is:
        is_mean, is_std, proxy = inception_score(recons)
        out["is_mean"] = is_mean
        out["is_std"] = is_std
        out["is_proxy"] = float(proxy)
    return out


def objective_scores(recons: np.ndarray, targets: np.ndarray,
                     tops: Sequence[int] = (2, 5, 10),
                     seed: int = 0) -> Dict[str, list]:
    """n-way identification table (``inference_gan.py:283-298``):
    {'top': [...], 'pcc': [...], 'ssim': [...]}, chance = 1/top."""
    out = {"top": [], "pcc": [], "ssim": []}
    for top in tops:
        s = objective_assessment(recons, targets, top=top, seed=seed)
        out["top"].append(top)
        out["pcc"].append(float(s[0]))
        out["ssim"].append(float(s[1]))
    return out


def save_objective_csv(scores: Dict[str, list], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(scores))
        w.writeheader()
        for i in range(len(scores["top"])):
            w.writerow({k: scores[k][i] for k in scores})


def save_objective_bar_chart(scores: Dict[str, list], path: str) -> None:
    """Bar chart with chance-level lines (``inference_gan.py:288-306``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    labels = [f"{t}-way" for t in scores["top"]]
    fig = plt.figure()
    bars = plt.bar(labels, scores["pcc"], width=0.5)
    n = len(labels)
    for i, t in enumerate(scores["top"]):
        plt.axhline(y=1.0 / t, xmin=i / n, xmax=(i + 1) / n,
                    linewidth=1, color="k")
    for bar, v in zip(bars, scores["pcc"]):
        plt.text(bar.get_x() + 0.10, v + 0.005, f"{v * 100:.2f}")
    plt.ylabel("Pixel correlation (%)")
    plt.title("Objective assessment")
    fig.savefig(path)
    plt.close(fig)


def save_reconstructions(recons: np.ndarray, out_dir: str,
                         resize_to: Optional[int] = 200) -> None:
    """Per-image PNG dump, resized like the reference (``:273-275``)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    arr = recons
    if resize_to:
        import jax.numpy as jnp

        arr = np.asarray(resize_batch(jnp.asarray(recons), resize_to))
    arr = np.clip(arr, 0.0, 1.0)
    for i, img in enumerate(arr):
        Image.fromarray((img * 255.0 + 0.5).astype(np.uint8)).save(
            os.path.join(out_dir, f"recon_{i:05d}.png"))
