"""Functional train state: parameter groups, batch stats, optimizer states.

The reference holds three ``torch.optim`` instances over the sub-modules of a
composite ``nn.Module`` (``train_vgan_stage1.py:275-283``).  Here the state is
one pytree with named groups — ``encoder`` / ``decoder`` / ``discriminator``
(+ ``latent_disc``, ``teacher_encoder`` where applicable) — so that

  * cross-stage checkpoint handoff is a sub-tree copy (the reference's
    decoder-only / encoder-only ``load_state_dict`` pattern,
    ``train_vgan_stage2.py:213-232``), and
  * frozen groups are simply groups without an optimizer entry.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
from flax import struct

from fmri_tpu.configs.presets import Config
from fmri_tpu.models.nets import (
    CognitiveEncoder, Decoder, ImageDiscriminator, LatentDiscriminator,
    VisualEncoder, VoxelDecoder,
)


@struct.dataclass
class TrainState:
    params: Any        # {group: params pytree}
    batch_stats: Any   # {group: batch-stats pytree} (may miss BN-free groups)
    opt_state: Any     # {group: optimizer state} (trainable groups only)
    step: jax.Array    # scalar int32, counts applied train steps


def _split_vars(variables) -> tuple[Any, Any]:
    return variables["params"], variables.get("batch_stats", {})


def init_vaegan(rng: jax.Array, cfg: Config, batch: int = 2) -> Dict[str, Any]:
    """Initialise the Stage-I VAE/GAN triplet (``VaeGan.__init__``,
    ``vae_gan.py:240-250``).  Returns {'params': ..., 'batch_stats': ...}."""
    c = cfg.model
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((batch, c.image_size, c.image_size, 3), jnp.float32)
    z = jnp.zeros((batch, c.latent_dim), jnp.float32)
    enc_v = VisualEncoder(c).init(k1, x, train=True)
    dec_v = Decoder(c).init(k2, z, train=True)
    disc_v = ImageDiscriminator(c).init(k3, jnp.concatenate([x] * 3, 0), train=True)
    params = {"encoder": enc_v["params"], "decoder": dec_v["params"],
              "discriminator": disc_v["params"]}
    stats = {"encoder": enc_v["batch_stats"], "decoder": dec_v["batch_stats"],
             "discriminator": disc_v["batch_stats"]}
    return {"params": params, "batch_stats": stats}


def init_cognitive(rng: jax.Array, cfg: Config, batch: int = 2) -> Dict[str, Any]:
    """Initialise a CognitiveEncoder group (``train_vgan_stage2.py:229``)."""
    c = cfg.model
    v = CognitiveEncoder(c).init(
        rng, jnp.zeros((batch, c.num_voxels), jnp.float32), train=True)
    return {"params": v["params"], "batch_stats": v["batch_stats"]}


def init_latent_disc(rng: jax.Array, cfg: Config, init_scheme: str = "normal",
                     batch: int = 2) -> Dict[str, Any]:
    c = cfg.model
    v = LatentDiscriminator(c, init_scheme=init_scheme).init(
        rng, jnp.zeros((batch, c.latent_dim), jnp.float32))
    return {"params": v["params"], "batch_stats": {}}


def init_voxel_decoder(rng: jax.Array, cfg: Config, batch: int = 2) -> Dict[str, Any]:
    """Initialise the supervised fMRI->image decoder (``exp_decoder.py:172-174``)."""
    c = cfg.model
    v = VoxelDecoder(c).init(
        rng, jnp.zeros((batch, c.num_voxels), jnp.float32), train=True)
    return {"params": v["params"], "batch_stats": v["batch_stats"]}


def make_state(groups: Mapping[str, Dict[str, Any]],
               optimizers: Mapping[str, Any]) -> TrainState:
    """Assemble a TrainState from named {'params','batch_stats'} groups and a
    per-group optimizer mapping (groups absent from ``optimizers`` are frozen)."""
    params = {name: g["params"] for name, g in groups.items()}
    stats = {name: g.get("batch_stats", {}) for name, g in groups.items()}
    opt_state = {name: opt.init(params[name]) for name, opt in optimizers.items()}
    return TrainState(params=params, batch_stats=stats, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))
