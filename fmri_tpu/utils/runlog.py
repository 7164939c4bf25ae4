"""Run-directory artifacts: logging, CSV results, TensorBoard, image grids.

The reference inlines four observability channels into every trainer
(SURVEY.md §5.5): Python logging to a timestamped file
(``train_vgan_stage1.py:107-114``), TensorBoard writers (``:226-229``),
per-epoch CSV (``:601-618``), and matplotlib grids/loss plots
(``:465-560,625-651``).  Here they are one reusable module with the same
artifact layout:

    <out_root>/<family>/<family>_<timestamp>/
        config.json            (reference: config.txt args dump, :137-138)
        train.log
        results.csv
        checkpoints/ckpt_<epoch>/
        images/{train,valid}/epoch_<n>.png
        plots/{GD_loss,ER_loss}.png
        tb/                    (TensorBoard event files, optional)
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np


def create_run_dir(out_root: str, family: str, *, debug: bool = False,
                   timestamp: Optional[str] = None) -> str:
    """Timestamped run dir ``<root>[/debug]/<family>/<family>_<ts>/``
    (reference ``train_vgan_stage1.py:126-134``; DEBUG reroute at ``:126``)."""
    ts = timestamp or time.strftime("%Y%m%d-%H%M%S")
    parts = [out_root] + (["debug"] if debug else []) + [family, f"{family}_{ts}"]
    run_dir = os.path.join(*parts)
    os.makedirs(run_dir, exist_ok=True)
    return run_dir


def setup_logging(run_dir: str, name: str = "train") -> logging.Logger:
    logger = logging.getLogger(f"fmri_tpu.{name}.{run_dir}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fh = logging.FileHandler(os.path.join(run_dir, f"{name}.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(sh)
    return logger


def dump_config(run_dir: str, cfg, extra: Optional[Mapping] = None) -> None:
    """Resolved-config dump (reference dumps argparse JSON to ``config.txt``,
    ``train_vgan_stage1.py:137-138``)."""
    payload = json.loads(cfg.to_json()) if hasattr(cfg, "to_json") else dict(cfg)
    if extra:
        payload["run"] = dict(extra)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)


class ResultsCSV:
    """Append-per-epoch results table (reference ``results`` dict -> pandas CSV,
    ``train_vgan_stage1.py:601-618``).  Column set is fixed by the first row;
    resume re-reads prior rows so the epoch offset survives restarts (the
    reference derives it from this same file, ``:239-247``)."""

    def __init__(self, path: str):
        self.path = path
        self.rows: List[Dict[str, float]] = []
        self.fields: Optional[List[str]] = None
        if os.path.exists(path):
            with open(path) as f:
                reader = csv.DictReader(f)
                self.fields = list(reader.fieldnames or [])
                for row in reader:
                    self.rows.append({k: float(v) if v not in ("", None) else float("nan")
                                      for k, v in row.items()})

    @property
    def last_epoch(self) -> int:
        return int(self.rows[-1]["epoch"]) if self.rows else -1

    def append(self, row: Mapping[str, float]) -> None:
        row = {k: float(v) for k, v in row.items()}
        self.rows.append(row)
        if self.fields is None:
            self.fields = list(row.keys())
        new_cols = [k for k in row if k not in self.fields]
        if new_cols:
            # column set evolved (e.g. resuming a run recorded by an older
            # version): rewrite the file with the union instead of silently
            # dropping the new metrics
            self.fields = self.fields + new_cols
            with open(self.path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self.fields)
                w.writeheader()
                for r in self.rows:
                    w.writerow({k: r.get(k, "") for k in self.fields})
            return
        write_header = not os.path.exists(self.path)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self.fields, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow({k: row.get(k, "") for k in self.fields})

    def column(self, key: str) -> List[float]:
        return [r.get(key, float("nan")) for r in self.rows]


class TensorBoard:
    """Thin optional wrapper over ``torch.utils.tensorboard`` (the reference's
    writer family, ``train_vgan_stage1.py:226-229``).  No-ops if unavailable."""

    def __init__(self, run_dir: str, enabled: bool = True):
        self._w = None
        if enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._w = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self._w = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def image_grid(self, tag: str, images: np.ndarray, step: int,
                   nrow: int = 8) -> None:
        if self._w is not None:
            grid = make_grid(images, nrow=nrow)
            self._w.add_image(tag, grid.transpose(2, 0, 1), step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """Tile [N, H, W, C] images (values in [0, 1]) into one HWC grid (the
    torchvision ``make_grid`` pattern at ``train_vgan_stage1.py:475-483``)."""
    images = np.clip(np.asarray(images, np.float32), 0.0, 1.0)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nr = (n + ncol - 1) // ncol
    grid = np.ones((nr * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """PNG dump of an image grid (reference matplotlib panels,
    ``train_vgan_stage1.py:465-485``)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grid = make_grid(images, nrow=nrow)
    Image.fromarray((grid * 255.0 + 0.5).astype(np.uint8)).save(path)


def save_loss_plots(results: ResultsCSV, run_dir: str) -> None:
    """G/D and E/R loss plots (reference ``finally`` block,
    ``train_vgan_stage1.py:625-651``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plots_dir = os.path.join(run_dir, "plots")
    os.makedirs(plots_dir, exist_ok=True)

    def plot(keys_labels: Sequence, title: str, fname: str) -> None:
        fig = plt.figure(figsize=(10, 5))
        plt.title(title)
        any_data = False
        for key, label in keys_labels:
            ys = results.column(key)
            if ys and not all(np.isnan(ys)):
                plt.plot(ys, label=label)
                any_data = True
        plt.xlabel("epochs")
        plt.ylabel("loss")
        if any_data:
            plt.legend()
        fig.savefig(os.path.join(plots_dir, fname))
        plt.close(fig)

    plot([("loss_decoder", "G"), ("loss_discriminator", "D")],
         "Generator and Discriminator Loss During Training", "GD_loss.png")
    plot([("loss_encoder", "E"), ("loss_reconstruction", "R")],
         "Encoder and Reconstruction Loss During Training", "ER_loss.png")
