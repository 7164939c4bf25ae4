"""Shared pieces of the fused train steps."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from fmri_tpu.models.nets import BN_MOMENTUM


def apply_with_stats(module, params, stats, *args, **kwargs):
    """Run a module in train mode with mutable batch stats.

    Returns (outputs, new_stats).
    """
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out, upd = module.apply(variables, *args, mutable=["batch_stats"], **kwargs)
    return out, upd.get("batch_stats", {})


def bn_extra_ticks(old_stats: Any, new_stats: Any, extra: int,
                   momentum: float = BN_MOMENTUM) -> Any:
    """Advance BatchNorm running stats by ``extra`` additional EMA ticks of the
    same batch statistics.

    The reference re-runs identical forwards inside one step (e.g. the WAE
    generator phase recomputes the encoder, ``train_wae_stage1.py:275,296``),
    which ticks the BN running-average multiple times per batch.  We run the
    forward once and replay the EMA algebra: with ``new = m*old + (1-m)*batch``
    after one tick, k total ticks give ``m^k*old + (1-m^k)*batch``.
    """
    if extra <= 0:
        return new_stats
    k = 1 + extra
    mk = momentum**k

    def fix(o, n):
        batch = (n - momentum * o) / (1.0 - momentum)
        return mk * o + (1.0 - mk) * batch

    return jax.tree_util.tree_map(fix, old_stats, new_stats)


def gate_float(flag) -> jax.Array:
    return jnp.asarray(flag, jnp.float32)
