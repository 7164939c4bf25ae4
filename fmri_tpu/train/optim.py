"""Optimizers with runtime learning rates and branchless gating.

The reference drives three ``torch.optim`` instances per trainer and *skips*
``optimizer.step()`` when the equilibrium gate disables a head
(``train_vgan_stage1.py:396-432``).  Inside a jitted TPU step that control flow
must be branchless: every optimizer here exposes

    ``update(grads, state, params, lr, gate) -> (new_params, new_state)``

where ``gate`` is a traced 0/1 scalar.  When ``gate == 0`` both the parameter
update *and* the optimizer-state update are suppressed (``jnp.where`` on the
state), matching torch's skipped-step semantics exactly (a skipped torch step
leaves the moment buffers untouched).

Numerics match torch:
  * RMSprop (``train_vgan_stage1.py:275-283``): sq_avg = a*sq_avg + (1-a)*g^2;
    p -= lr * g / (sqrt(sq_avg) + eps)   [eps outside the sqrt].
  * Adam (``train_wae_stage1.py:221-224``): bias-corrected moments,
    p -= lr * m_hat / (sqrt(v_hat) + eps).
  * Optional elementwise gradient clamp to [-c, c] *before* the moment update,
    matching ``p.grad.data.clamp_(-1, 1)`` (``train_vgan_stage2.py:391,406``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _tree_where(gate, new, old):
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(gate, n, o), new, old)


def _clip(grads, clip: Optional[float]):
    if clip is None:
        return grads
    return jax.tree_util.tree_map(lambda g: jnp.clip(g, -clip, clip), grads)


class RmsState(NamedTuple):
    sq_avg: jax.Array  # pytree


class RmsProp(NamedTuple):
    decay: float = 0.9
    eps: float = 1e-8
    clip: Optional[float] = None

    def init(self, params) -> RmsState:
        return RmsState(jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(self, grads, state: RmsState, params, lr, gate=1.0):
        grads = _clip(grads, self.clip)
        new_sq = jax.tree_util.tree_map(
            lambda s, g: self.decay * s + (1.0 - self.decay) * g * g,
            state.sq_avg, grads)
        new_params = jax.tree_util.tree_map(
            lambda p, g, s: p - lr * g / (jnp.sqrt(s) + self.eps),
            params, grads, new_sq)
        return (
            _tree_where(gate, new_params, params),
            RmsState(_tree_where(gate, new_sq, state.sq_avg)),
        )


class AdamState(NamedTuple):
    mu: jax.Array       # pytree
    nu: jax.Array       # pytree
    count: jax.Array    # scalar int32 (increments only on applied steps)


class Adam(NamedTuple):
    b1: float = 0.5
    b2: float = 0.999
    eps: float = 1e-8
    clip: Optional[float] = None

    def init(self, params) -> AdamState:
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(z, jax.tree_util.tree_map(jnp.zeros_like, params),
                         jnp.zeros((), jnp.int32))

    def update(self, grads, state: AdamState, params, lr, gate=1.0):
        grads = _clip(grads, self.clip)
        count = state.count + jnp.asarray(gate, jnp.int32)
        t = jnp.maximum(count, 1).astype(jnp.float32)
        new_mu = jax.tree_util.tree_map(
            lambda m, g: self.b1 * m + (1.0 - self.b1) * g, state.mu, grads)
        new_nu = jax.tree_util.tree_map(
            lambda v, g: self.b2 * v + (1.0 - self.b2) * g * g, state.nu, grads)
        bc1 = 1.0 - self.b1**t
        bc2 = 1.0 - self.b2**t
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + self.eps),
            params, new_mu, new_nu)
        return (
            _tree_where(gate, new_params, params),
            AdamState(_tree_where(gate, new_mu, state.mu),
                      _tree_where(gate, new_nu, state.nu),
                      jnp.where(gate, count, state.count)),
        )


# ------------------------- LR schedules -------------------------


def exponential_lr(base_lr: float, gamma: float, steps_per_epoch: int):
    """``ExponentialLR(gamma)`` stepped per epoch (``train_vgan_stage1.py:277,448``)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** epoch.astype(jnp.float32)

    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float, steps_per_epoch: int):
    """``StepLR(step_size, gamma)`` stepped per epoch (``train_wae_stage1.py:226-228``)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size).astype(jnp.float32)

    return schedule
