"""Generic supervised training/validation loops.

The reference's ``training_loop`` / ``validation_loop``
(``train/train_utils.py:474-675``) drive any (model, optimizer, loss) triple
with a ``mode`` key that routes batch fields to (inputs, targets):

  * ``'cogenc'`` / ``'decoder'`` — fmri -> image
  * ``'encoder'``                — image -> fmri
  * ``'vae'`` / ``'autoencoder'`` — x -> x

Here the same contract becomes one fused jitted step (forward + loss + update)
plus a host epoch driver that accumulates loss/metrics on device.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from fmri_tpu.train.common import apply_with_stats
from fmri_tpu.train.state import TrainState

MODE_ROUTES = {
    "cogenc": ("fmri", "image"),
    "decoder": ("fmri", "image"),
    "encoder": ("image", "fmri"),
    "vae": (None, None),          # batch is the input and the target
    "autoencoder": (None, None),
}


def route_batch(mode: str, batch) -> Tuple[Any, Any]:
    """Select (inputs, targets) per mode (``train_utils.py:514-528``)."""
    try:
        in_key, gt_key = MODE_ROUTES[mode]
    except KeyError:
        raise ValueError(f"wrong mode in training loop: {mode!r}")
    if in_key is None:
        return batch, batch
    return batch[in_key], batch[gt_key]


def make_supervised_step(module, optimizer, loss_fn: Callable, mode: str,
                         lr_schedule=None, donate: bool = False):
    """Fused supervised step: ``loss_fn(module(inputs), targets)`` -> update.

    ``module`` is a Flax module whose ``__call__(x, train=...)`` may use
    BatchNorm; state groups: {'model'}.
    """
    if lr_schedule is None:
        lr_schedule = lambda step: jnp.float32(1e-3)

    def train_step(state: TrainState, batch):
        inputs, targets = route_batch(mode, batch)

        def loss_wrapped(params):
            out, new_stats = apply_with_stats(
                module, params, state.batch_stats["model"], inputs, train=True)
            return loss_fn(out, targets), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params["model"])
        lr = lr_schedule(state.step)
        new_params, new_opt = optimizer.update(
            grads, state.opt_state["model"], state.params["model"], lr, 1.0)
        new_state = TrainState(params={"model": new_params},
                               batch_stats={"model": new_stats},
                               opt_state={"model": new_opt},
                               step=state.step + 1)
        return new_state, {"loss": loss, "lr": lr}

    def eval_step(state: TrainState, batch):
        inputs, targets = route_batch(mode, batch)
        variables = {"params": state.params["model"]}
        if state.batch_stats["model"]:
            variables["batch_stats"] = state.batch_stats["model"]
        out = module.apply(variables, inputs, train=False)
        return out, {"loss": loss_fn(out, targets)}

    donate_args = (0,) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_args),
            jax.jit(eval_step))


def run_epoch(train_step, state: TrainState, batches: Iterable,
              metrics: Optional[Mapping[str, Callable]] = None
              ) -> Tuple[TrainState, Dict[str, float]]:
    """One training epoch: mean loss over batches (``train_utils.py:474-578``);
    optional metric callables accumulate like the reference's metric dict."""
    import numpy as np

    total: Dict[str, Any] = {}
    nb = 0
    for batch in batches:
        state, m = train_step(state, batch)
        for k, v in m.items():
            total[k] = v if k not in total else total[k] + v
        nb += 1
    out = {k: float(np.asarray(v)) / nb for k, v in total.items()}
    return state, out


def run_validation(eval_step, state: TrainState, batches: Iterable
                   ) -> Dict[str, float]:
    """Mean validation loss (``validation_loop``, ``train_utils.py:581-675``)."""
    import numpy as np

    total = 0.0
    nb = 0
    for batch in batches:
        _, m = eval_step(state, batch)
        total += float(np.asarray(m["loss"]))
        nb += 1
    return {"loss": total / max(nb, 1)}
