"""The unified training loop driving every stage/family.

The reference duplicates ~600 lines of epoch/batch/logging/checkpoint
boilerplate across 7 trainer scripts (SURVEY.md §2.3).  Here one ``Trainer``
runs any fused step function (``steps_vgan`` / ``steps_wae``) with a
``StageSpec``-like constructor describing what differs per stage:

  * data kind — plain image batches (Stage I) vs {'fmri','image'} pairs;
  * device-side augmentation (flip for Stage-I COCO, shift for Stage-II/III);
  * whether the step takes the equilibrium-game scalars (VAE/GAN family) or
    not (WAE family);
  * per-epoch schedule state: margin/equilibrium/lambda decay with the
    reference's cap rules (``train_vgan_stage1.py:448-458``).

TPU-native properties:
  * metrics accumulate on device and flush once per epoch (the reference
    syncs loss scalars to host every batch, ``train_vgan_stage1.py:391-394``);
  * batches prefetch asynchronously (``fmri_tpu.data.pipeline``), optionally
    sharded over a mesh;
  * optional ``jax.profiler`` trace of a training-step window.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Dict, Iterable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fmri_tpu.configs.presets import Config
from fmri_tpu.checkpoints.store import (
    AsyncCheckpointWriter, prune_checkpoints, restore_checkpoint,
    save_checkpoint,
)
from fmri_tpu.data.pipeline import Batches, device_iterator
from fmri_tpu.data.transforms import denormalize, train_augment
from fmri_tpu.metrics.quality import mse as mse_fn
from fmri_tpu.metrics.quality import pearson_correlation, ssim
from fmri_tpu.train.state import TrainState
from fmri_tpu.train.steps_vgan import StepFns
from fmri_tpu.utils.runlog import (
    ResultsCSV, TensorBoard, dump_config, save_image_grid, save_loss_plots,
    setup_logging,
)


class EarlyStopping:
    """Patience-based stopper with NaN stop (reference ``EarlyStopping``,
    ``train_utils.py:17-69``; ``patience=0`` disables, ``:32-34`` — and the
    main trainers never arm it, ``gan_config.py:15``)."""

    def __init__(self, patience: int = 0, mode: str = "max"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        if math.isnan(value):
            return True  # NaN guard (train_utils.py:41-42)
        if self.patience == 0:
            return False
        better = (self.best is None or
                  (value > self.best if self.mode == "max" else value < self.best))
        if better:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs > self.patience


class GameSchedules:
    """Per-epoch decay of the equilibrium game scalars
    (``train_vgan_stage1.py:451-458``): margin/eq multiplied by their decay,
    ``equilibrium = max(equilibrium, margin)``, ``lambda_mse`` capped at 1."""

    def __init__(self, cfg: Config):
        t = cfg.train
        self.margin = t.margin
        self.equilibrium = t.equilibrium
        self.lambda_mse = t.lambda_mse
        self._dm, self._de, self._dl = t.decay_margin, t.decay_equilibrium, t.decay_mse

    def epoch_end(self) -> None:
        self.margin *= self._dm
        self.equilibrium *= self._de
        if self.margin > self.equilibrium:
            self.equilibrium = self.margin
        self.lambda_mse *= self._dl
        if self.lambda_mse > 1.0:
            self.lambda_mse = 1.0

    def args(self):
        return (jnp.float32(self.margin), jnp.float32(self.equilibrium),
                jnp.float32(self.lambda_mse))


class Trainer:
    """Drives a fused step function through epochs with eval/logging/ckpt.

    Args:
      cfg: full config tree.
      steps: (train_step, eval_step) from a ``make_*_step`` factory.
      run_dir: artifact directory (see ``fmri_tpu.utils.runlog``).
      data_kind: 'image' (Stage I) or 'pair' ({'fmri','image'}).
      uses_gate: step signature takes (margin, equilibrium, lambda_mse).
      augment: dict(flip=, max_shift=) for the device-side train transform.
      eval_sample: reparameterize at eval (VAE/GAN families sample even in
        eval, ``vae_gan.py:288-297``; WAE decodes the mean).
      mesh / voxel_tp: optional sharding for multi-chip runs.
    """

    def __init__(self, cfg: Config, steps: StepFns, run_dir: str, *,
                 data_kind: str = "image", uses_gate: bool = True,
                 augment: Optional[Mapping[str, Any]] = None,
                 eval_sample: bool = True, mesh=None, voxel_tp: bool = False,
                 debug: bool = False, tensorboard: bool = True,
                 profile: bool = False, async_ckpt: bool = False,
                 ckpt_retention: Optional[Mapping[str, Any]] = None):
        self.cfg = cfg
        self.steps = steps
        self.run_dir = run_dir
        self.data_kind = data_kind
        self.uses_gate = uses_gate
        self.eval_sample = eval_sample
        self.mesh = mesh
        self.voxel_tp = voxel_tp
        if mesh is not None:
            dsize = mesh.shape.get("data", 1)
            if cfg.train.batch_size % dsize:
                raise ValueError(
                    f"batch_size={cfg.train.batch_size} is not divisible by "
                    f"the mesh data axis ({dsize} devices); pick a batch "
                    f"size that shards evenly")
        self.debug = debug
        self.profile = profile
        self.logger = setup_logging(run_dir)
        self.results = ResultsCSV(os.path.join(run_dir, "results.csv"))
        self.tb = TensorBoard(run_dir, enabled=tensorboard)
        self.ckpt_dir = os.path.join(run_dir, "checkpoints")
        # Retention policy (keep-last-K / keep-best-K / keep-every-N) and
        # async writes — deliberate extensions over the reference, which saves
        # every 5/10 epochs forever and blocks training during torch.save
        # (train_vgan_stage1.py:596-598).
        self._ckpt_retention = dict(ckpt_retention) if ckpt_retention else None
        self._ckpt_writer = AsyncCheckpointWriter() if async_ckpt else None

        aug = dict(flip=False, max_shift=0)
        aug.update(augment or {})
        self._augment_cfg = dict(aug)
        mean, std = tuple(cfg.data.mean), tuple(cfg.data.std)
        self._mean, self._std = mean, std

        def _augment(rng, batch):
            if isinstance(batch, dict):
                img = train_augment(rng, batch["image"], flip=aug["flip"],
                                    max_shift=aug["max_shift"], mean=mean, std=std)
                return dict(batch, image=img)
            return train_augment(rng, batch, flip=aug["flip"],
                                 max_shift=aug["max_shift"], mean=mean, std=std)

        def _eval_prep(batch):
            if isinstance(batch, dict):
                return dict(batch, image=train_augment(
                    jax.random.key(0), batch["image"], mean=mean, std=std))
            return train_augment(jax.random.key(0), batch, mean=mean, std=std)

        self._augment = jax.jit(_augment)
        self._eval_prep = jax.jit(_eval_prep)

        def _metrics(recon, target):
            r = denormalize(recon, mean, std)
            t = denormalize(target, mean, std)
            return {"PCC": pearson_correlation(r, t), "SSIM": ssim(r, t),
                    "MSE": mse_fn(recon, target)}

        self._quality = jax.jit(_metrics)

    # ------------------------------------------------------------------

    def _target_of(self, batch):
        return batch["image"] if isinstance(batch, dict) else batch

    def _eval_input(self, batch):
        if self.data_kind == "pair":
            return batch  # eval_step reads batch['fmri']
        return self._target_of(batch)

    def resume(self, state: TrainState, epoch: Optional[int] = None):
        """Restore (state, start_epoch) from this run's checkpoint dir
        (reference resume contract, ``train_vgan_stage1.py:239-247``)."""
        state, meta = restore_checkpoint(self.ckpt_dir, state, epoch=epoch)
        return state, int(meta["epoch"]) + 1

    def evaluate_batches(self, state: TrainState, batches: Iterable,
                         rng: jax.Array, max_batches: int = 0,
                         save_images_to: Optional[str] = None,
                         nrow: int = 8) -> Dict[str, float]:
        """Mean PCC/SSIM/MSE over (up to) ``max_batches`` validation batches
        (0 = all).  The reference evaluates exactly one batch per epoch
        ("memory issue" break, ``train_vgan_stage1.py:594``); pass
        ``max_batches=1`` for strict parity."""
        sums: Dict[str, float] = {}
        count = 0
        last = None
        for i, batch in enumerate(batches):
            if max_batches and i >= max_batches:
                break
            batch = self._eval_prep(batch)
            rng, k = jax.random.split(rng)
            recon = self.steps.eval_step(state, self._eval_input(batch),
                                         k if self.eval_sample else None)
            m = self._quality(recon, self._target_of(batch))
            for key, v in m.items():
                sums[key] = sums.get(key, 0.0) + float(v)
            count += 1
            last = (recon, self._target_of(batch))
        if count == 0:
            return {}
        if save_images_to and last is not None:
            recon, target = last
            r = np.asarray(denormalize(recon, self._mean, self._std))
            t = np.asarray(denormalize(target, self._mean, self._std))
            save_image_grid(r[: nrow * 2], save_images_to, nrow=nrow)
            base, ext = os.path.splitext(save_images_to)
            save_image_grid(t[: nrow * 2], f"{base}_original{ext}", nrow=nrow)
            # 'generated' panel: decode-from-noise samples, matching the
            # reference's reconstructed/generated/original triple
            # (train_vgan_stage1.py:545-565)
            if self.steps.generate_step is not None:
                gen = self.steps.generate_step(state, rng, nrow * 2)
                g = np.asarray(denormalize(gen, self._mean, self._std))
                save_image_grid(g, f"{base}_generated{ext}", nrow=nrow)
                self.tb.image_grid("generated", g, int(state.step), nrow=nrow)
            # the same panels to TensorBoard (reference writer.add_image,
            # train_vgan_stage1.py:545-565)
            self.tb.image_grid("reconstructed", r[: nrow * 2], int(state.step),
                               nrow=nrow)
            self.tb.image_grid("original", t[: nrow * 2], int(state.step),
                               nrow=nrow)
        return {k: v / count for k, v in sums.items()}

    # ------------------------------------------------------------------

    def fit(self, state: TrainState, train_data, valid_data=None, *,
            n_epochs: Optional[int] = None, start_epoch: int = 0,
            eval_batches: int = 1, grid_every: int = 2,
            seed: Optional[int] = None, on_device: bool = False,
            epoch_callback: Optional[Callable] = None) -> TrainState:
        """Train for ``n_epochs``.  ``on_device=True`` runs each epoch as one
        jitted ``lax.scan`` over the device-resident dataset
        (``fmri_tpu.train.epoch_scan``) — no per-step host dispatch; use when
        the packed training set fits in HBM."""
        cfg = self.cfg
        t = cfg.train
        n_epochs = n_epochs if n_epochs is not None else t.n_epochs
        seed = seed if seed is not None else t.seed
        dump_config(self.run_dir, cfg, extra={
            "data_kind": self.data_kind, "seed": seed, "on_device": on_device,
            "start_epoch": start_epoch, "n_epochs": n_epochs})

        train_batches = Batches(train_data, t.batch_size, shuffle=True, seed=seed)
        train_batches.epoch = start_epoch
        valid_batches = (Batches(valid_data, t.batch_size, shuffle=False)
                         if valid_data is not None else None)

        epoch_runner = None
        device_data = None
        n_train = 0
        if on_device:
            from fmri_tpu.train.epoch_scan import make_epoch_runner

            epoch_runner = make_epoch_runner(
                cfg, self.steps, uses_gate=self.uses_gate,
                augment=self._augment_cfg, donate=False)
            if self.mesh is not None:
                from fmri_tpu.parallel.mesh import shard_batch

                device_data = shard_batch(train_data, self.mesh,
                                          voxel_tp=self.voxel_tp)
            else:
                device_data = jax.device_put(train_data)
            n_train = (len(train_data["fmri"]) if isinstance(train_data, dict)
                       else len(train_data))

        sched = GameSchedules(cfg)
        for _ in range(start_epoch):  # fast-forward schedule state on resume
            sched.epoch_end()
        stopper = EarlyStopping(patience=t.patience, mode="max")
        root_key = jax.random.key(seed)

        state = self._place(state)
        final_epoch = start_epoch
        last_row: Optional[Dict[str, float]] = None
        saved_epoch: Optional[int] = None
        try:
            for epoch in range(start_epoch, n_epochs):
                final_epoch = epoch
                ep_key = jax.random.fold_in(root_key, epoch)
                if self.profile and epoch == start_epoch + 1:
                    jax.profiler.start_trace(os.path.join(self.run_dir, "profile"))

                if epoch_runner is not None:
                    from fmri_tpu.train.epoch_scan import epoch_permutation

                    perm = jax.device_put(epoch_permutation(
                        n_train, t.batch_size, seed, epoch))
                    gate = sched.args() if self.uses_gate else ()
                    state, dm = epoch_runner(state, device_data, perm,
                                             ep_key, *gate)
                    epoch_metrics = {k: float(np.asarray(v))
                                     for k, v in dm.items()}
                else:
                    acc: Dict[str, Any] = {}
                    nb = 0
                    it = device_iterator(iter(train_batches), mesh=self.mesh,
                                         voxel_tp=self.voxel_tp)
                    for b_idx, batch in enumerate(it):
                        k = jax.random.fold_in(ep_key, b_idx)
                        k_aug, k_step = jax.random.split(k)
                        # trace annotation: step markers for jax.profiler /
                        # perfetto (the reference has no tracing, SURVEY §5.1)
                        with jax.profiler.StepTraceAnnotation(
                                "train_step", step_num=b_idx):
                            batch = self._augment(k_aug, batch)
                            if self.uses_gate:
                                state, m = self.steps.train_step(
                                    state, batch, k_step, *sched.args())
                            else:
                                state, m = self.steps.train_step(
                                    state, batch, k_step)
                        # device-side accumulation; no host sync in the loop
                        for key, v in m.items():
                            acc[key] = v if key not in acc else acc[key] + v
                        nb += 1
                    epoch_metrics = {k: float(np.asarray(v)) / nb
                                     for k, v in acc.items()}

                if self.profile and epoch == start_epoch + 1:
                    jax.profiler.stop_trace()
                    self.logger.info(
                        "profile trace written; summarize with: python -m "
                        "fmri_tpu.utils.profile_report %s",
                        os.path.join(self.run_dir, "profile"))
                sched.epoch_end()

                row: Dict[str, float] = {"epoch": float(epoch)}
                row.update(epoch_metrics)

                if valid_batches is not None and (epoch % t.eval_every == 0):
                    grid_path = None
                    if grid_every and epoch % grid_every == 0:
                        grid_path = os.path.join(self.run_dir, "images", "valid",
                                                 f"epoch_{epoch:04d}.png")
                    vm = self.evaluate_batches(
                        state, iter(valid_batches),
                        jax.random.fold_in(ep_key, 0x7FFFFFFF),
                        max_batches=eval_batches, save_images_to=grid_path)
                    row.update({f"valid_{k}": v for k, v in vm.items()})
                    # train-batch metrics, mirroring the reference's per-epoch
                    # train_PCC/train_SSIM/train_MSE columns
                    # (train_vgan_stage1.py:583-618)
                    tm = self.evaluate_batches(
                        state, iter(Batches(train_data, t.batch_size)),
                        jax.random.fold_in(ep_key, 0x7FFFFFFE),
                        max_batches=max(eval_batches, 1))
                    row.update({f"train_{k}": v for k, v in tm.items()})

                self.results.append(row)
                for key, v in row.items():
                    if key != "epoch":
                        self.tb.scalar(key, v, epoch)
                self.logger.info(
                    "epoch %d | %s", epoch,
                    " ".join(f"{k}={v:.5f}" for k, v in row.items() if k != "epoch"))

                last_row = row
                if t.ckpt_every and epoch % t.ckpt_every == 0 and not self.debug:
                    self._save_ckpt(epoch, state, seed, row)
                    saved_epoch = epoch

                if epoch_callback is not None:
                    epoch_callback(epoch, state, row)

                # NaN anywhere stops training (train_utils.py:41-42);
                # patience tracks valid_PCC (maximize) — never patience-stop
                # on a loss with a maximize comparator
                if any(math.isnan(v) for v in row.values()):
                    guard = float("nan")
                elif "valid_PCC" in row:
                    guard = row["valid_PCC"]
                else:
                    guard = stopper.best if stopper.best is not None else 0.0
                if stopper.update(guard):
                    self.logger.info("early stop at epoch %d", epoch)
                    break
        except KeyboardInterrupt:  # reference saves plots on interrupt (:620-651)
            self.logger.info("interrupted; saving plots")
        finally:
            save_loss_plots(self.results, self.run_dir)
            self.tb.close()
            # Drain any in-flight background checkpoint write even on the
            # exception path — a daemon thread killed mid-write would leave a
            # truncated latest checkpoint.  Errors are logged here (not
            # raised: they must not mask an in-flight training exception);
            # the success path re-raises via the wait() below.
            if self._ckpt_writer is not None:
                try:
                    self._ckpt_writer.wait()
                except Exception:
                    self.logger.exception("background checkpoint write failed")

        # Final checkpoint, carrying the last epoch's metrics so retention's
        # keep-best sees them; skip when the in-loop cadence already saved
        # this exact epoch (avoids a duplicate write that would clobber meta).
        if not self.debug and saved_epoch != final_epoch:
            self._save_ckpt(final_epoch, state, seed, last_row)
        if self._ckpt_writer is not None:
            self._ckpt_writer.wait()
        return state

    def _save_ckpt(self, epoch: int, state: TrainState, seed: int,
                   row: Optional[Mapping[str, float]] = None) -> None:
        meta = {"seed": seed}
        if row:
            meta["metrics"] = {k: float(v) for k, v in row.items() if k != "epoch"}
        if self._ckpt_writer is not None:
            self._ckpt_writer.save(self.ckpt_dir, epoch, state, meta,
                                   prune=self._ckpt_retention)
        else:
            save_checkpoint(self.ckpt_dir, epoch, state, meta)
            if self._ckpt_retention:
                prune_checkpoints(self.ckpt_dir, **self._ckpt_retention)

    def _place(self, state: TrainState) -> TrainState:
        if self.mesh is None:
            return state
        from fmri_tpu.parallel.mesh import shard_state

        return shard_state(state, self.mesh, voxel_tp=self.voxel_tp)
