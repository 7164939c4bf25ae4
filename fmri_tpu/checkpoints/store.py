"""Checkpoint save/restore and cross-stage handoff (orbax-backed).

Reference mechanism (SURVEY.md §5.4): ``torch.save(model.state_dict())`` every
5/10 epochs (``train_vgan_stage1.py:596-598``, ``train_wae_stage1.py:461-463``),
resume by rebuilding the graph and ``load_state_dict`` of
``<name>_<epoch>.pth`` (``train_vgan_stage1.py:239-247``), and cross-stage
handoff by loading stage N-1's checkpoint and cherry-picking sub-modules
(decoder / discriminator reuse, ``train_vgan_stage2.py:213-232``).  Notably the
reference **never saves optimizer state** — resume restarts RMSprop/Adam
moments from zero.

This store improves on that deliberately: a checkpoint is the full
``{params, batch_stats, opt_state, step}`` TrainState plus ``{epoch, rng_seed}``
metadata, so resume is bit-exact.  The stage-handoff contract is by group name
(``encoder`` / ``decoder`` / ``discriminator`` / ``latent_disc`` /
``teacher_encoder``) via :func:`load_groups` / :func:`graft_groups`.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # lazy at runtime: avoids a circular import with fmri_tpu.train
    from fmri_tpu.train.state import TrainState

_CKPT_RE = re.compile(r"^ckpt_(\d+)$")


def _ckpt_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"ckpt_{epoch:05d}")


def list_checkpoints(ckpt_dir: str) -> Dict[int, str]:
    """Map epoch -> checkpoint path for every checkpoint under ``ckpt_dir``."""
    out: Dict[int, str] = {}
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(ckpt_dir, name)):
            out[int(m.group(1))] = os.path.join(os.path.abspath(ckpt_dir), name)
    return out


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    cps = list_checkpoints(ckpt_dir)
    return max(cps) if cps else None


def _write_checkpoint(ckpt_dir: str, epoch: int, host_tree: Dict[str, Any],
                      meta: Dict[str, Any]) -> str:
    """Write an already-host-resident tree to ``ckpt_dir/ckpt_<epoch>``."""
    import orbax.checkpoint as ocp

    path = _ckpt_path(ckpt_dir, epoch)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, host_tree, force=True)
    meta = dict(meta)
    meta["epoch"] = epoch
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def _host_tree(state: "TrainState") -> Dict[str, Any]:
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    return jax.device_get(tree)


def save_checkpoint(ckpt_dir: str, epoch: int, state: "TrainState",
                    meta: Optional[Mapping[str, Any]] = None) -> str:
    """Write ``ckpt_dir/ckpt_<epoch>`` with the full TrainState + metadata."""
    return _write_checkpoint(ckpt_dir, epoch, _host_tree(state), dict(meta or {}))


def restore_checkpoint(ckpt_dir: str, template: "TrainState",
                       epoch: Optional[int] = None
                       ) -> "Tuple[TrainState, Dict[str, Any]]":
    """Restore a TrainState (shapes/dtypes from ``template``) and its metadata.

    ``epoch=None`` restores the latest checkpoint — the reference's
    ``pretrained_gan + load_epoch`` resume path (``train_vgan_stage1.py:239-247``)
    with the epoch offset recorded in the checkpoint itself instead of being
    re-derived from a results CSV.
    """
    import orbax.checkpoint as ocp

    if epoch is None:
        epoch = latest_epoch(ckpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = _ckpt_path(ckpt_dir, epoch)
    tree = {"params": template.params, "batch_stats": template.batch_stats,
            "opt_state": template.opt_state, "step": template.step}
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(tree))
    from fmri_tpu.train.state import TrainState

    state = TrainState(params=restored["params"],
                       batch_stats=restored["batch_stats"],
                       opt_state=restored["opt_state"],
                       step=np.asarray(restored["step"]))
    meta_path = os.path.join(path, "meta.json")
    meta: Dict[str, Any] = {"epoch": epoch}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    return state, meta


def load_eval_state(ckpt_dir: str, epoch: Optional[int] = None) -> "Tuple[TrainState, Dict[str, Any]]":
    """Restore a checkpoint for inference: full params/batch_stats, empty
    optimizer state (eval never touches it).  Template-free — shapes come from
    the stored tree — so any stage's checkpoint loads without rebuilding its
    optimizer wiring (the reference rebuilds the whole composite and
    ``load_state_dict``s it, ``inference_gan.py:213-264``)."""
    import orbax.checkpoint as ocp

    if epoch is None:
        epoch = latest_epoch(ckpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = _ckpt_path(ckpt_dir, epoch)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    from fmri_tpu.train.state import TrainState

    state = TrainState(params=restored["params"],
                       batch_stats=restored["batch_stats"],
                       opt_state={}, step=np.asarray(restored["step"]))
    meta_path = os.path.join(path, "meta.json")
    meta: Dict[str, Any] = {"epoch": epoch}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    return state, meta


def load_groups(ckpt_dir: str, names: Sequence[str],
                templates: Mapping[str, Any],
                epoch: Optional[int] = None) -> Dict[str, Dict[str, Any]]:
    """Load only the named parameter groups (+ their batch stats) from a
    checkpoint — the cross-stage handoff read (reference: building Stage II
    from the Stage-I decoder/discriminator, ``train_vgan_stage2.py:213-232``).

    ``templates``: {name: {'params': tree, 'batch_stats': tree}} giving the
    shapes to restore into.  Returns the same structure with loaded values.
    """
    import orbax.checkpoint as ocp

    if epoch is None:
        epoch = latest_epoch(ckpt_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = _ckpt_path(ckpt_dir, epoch)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    del templates  # shapes come from the stored tree; kept for API symmetry
    missing = [n for n in names if n not in restored["params"]]
    if missing:
        raise KeyError(f"groups {missing} not in checkpoint {path}; "
                       f"available: {sorted(restored['params'])}")
    return {n: {"params": restored["params"][n],
                "batch_stats": restored["batch_stats"].get(n, {})}
            for n in names}


def checkpoint_meta(path: str) -> Dict[str, Any]:
    """Read a checkpoint's ``meta.json`` ({} if absent)."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def prune_checkpoints(ckpt_dir: str, *, keep_last: int = 0, keep_best: int = 0,
                      best_metric: str = "valid_PCC", best_mode: str = "max",
                      keep_every: int = 0) -> "list[int]":
    """Delete checkpoints not covered by the retention policy; return the
    deleted epochs.

    The retained set is the UNION of: the ``keep_last`` most recent epochs,
    the ``keep_best`` epochs with the best ``best_metric`` recorded in their
    ``meta.json`` (``best_mode`` 'max'|'min'; checkpoints without the metric
    are never counted as best), and every ``keep_every``-th epoch.  A zero
    disables that clause; all zeros means keep everything (the reference's
    behaviour — it never deletes a ``.pth``, ``train_vgan_stage1.py:596-598``).
    The latest checkpoint is always retained.
    """
    cps = list_checkpoints(ckpt_dir)
    if not cps or (not keep_last and not keep_best and not keep_every):
        return []
    epochs = sorted(cps)
    keep = {epochs[-1]}
    if keep_last:
        keep.update(epochs[-keep_last:])
    if keep_every:
        keep.update(e for e in epochs if e % keep_every == 0)
    if keep_best:
        scored = []
        for e in epochs:
            v = checkpoint_meta(cps[e]).get("metrics", {}).get(best_metric)
            if v is not None:
                scored.append((float(v), e))
        scored.sort(reverse=(best_mode == "max"))
        keep.update(e for _, e in scored[:keep_best])
    import shutil

    deleted = []
    for e in epochs:
        if e not in keep:
            shutil.rmtree(cps[e])
            deleted.append(e)
    return deleted


class AsyncCheckpointWriter:
    """Background checkpoint writer: the device->host transfer happens on the
    caller's thread (so donated buffers from the next step can't clobber the
    values), the orbax/file write happens on a worker thread, overlapping the
    next epoch's compute.  One in-flight save at a time; a new save or
    :meth:`wait` joins the previous one first and re-raises its error.
    """

    def __init__(self) -> None:
        self._thread = None
        self._error: Optional[BaseException] = None
        self.last_path: Optional[str] = None

    def save(self, ckpt_dir: str, epoch: int, state: "TrainState",
             meta: Optional[Mapping[str, Any]] = None, *,
             prune: Optional[Mapping[str, Any]] = None) -> None:
        import threading

        self.wait()
        host = _host_tree(state)  # sync transfer before the caller mutates state
        meta = dict(meta or {})

        def _work() -> None:
            try:
                self.last_path = _write_checkpoint(ckpt_dir, epoch, host, meta)
                if prune:
                    prune_checkpoints(ckpt_dir, **prune)
            except BaseException as e:  # re-raised on the caller's thread
                self._error = e

        self._thread = threading.Thread(target=_work, daemon=True,
                                        name=f"ckpt-write-{epoch}")
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def graft_groups(groups: Dict[str, Dict[str, Any]],
                 source: Mapping[str, Dict[str, Any]],
                 mapping: Mapping[str, str]) -> Dict[str, Dict[str, Any]]:
    """Graft source groups into a fresh group dict under (possibly renamed)
    keys: ``mapping`` maps target-group -> source-group, e.g. Stage II's
    ``{'decoder': 'decoder', 'discriminator': 'discriminator',
    'teacher_encoder': 'encoder'}``."""
    out = dict(groups)
    for dst, src in mapping.items():
        out[dst] = {"params": source[src]["params"],
                    "batch_stats": source[src].get("batch_stats", {})}
    return out
