"""Flax modules for the Dual-VAE/GAN and WAE/GAN model families.

TPU-native re-design of the reference architectures in
``/root/reference/models/vae_gan.py`` (cited per-module below).  Differences by
design, not omission:

  * Layout is NHWC (channels ride the TPU lane dimension) instead of NCHW.
  * The discriminator computes the feature-matching tap and the GAN score in a
    single pass over the 3-way-concat batch instead of the reference's two full
    passes (``vae_gan.py:284-285``) — identical math, half the FLOPs, and the
    BN running-stat EMA ticks once per step instead of twice (running stats are
    never consumed: the discriminator is not used at eval time).
  * BatchNorm ``momentum=0.9`` in torch convention (new-batch weight) equals
    Flax ``momentum=0.1`` (running-average decay); epsilon 1e-5 matches torch.
  * Parameter init matches ``VaeGan.init_parameters`` (``vae_gan.py:252-264``):
    weights ~ U(-a, a) with a = 1/sqrt(3*fan_in), biases zero.  The standalone
    ``WaeDiscriminator`` init N(0, 0.01) (``vae_gan.py:522-525``) is kept for
    the cognitive WAE stages where no global re-init runs.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fmri_tpu.configs.presets import ModelConfig
from fmri_tpu.models.norm import BatchNorm
from fmri_tpu.ops.conv import conv2d, conv2d_transpose

# torch BatchNorm(momentum=0.9) => running = 0.1*running + 0.9*batch
# flax BatchNorm(momentum=m)    => running = m*running + (1-m)*batch
BN_MOMENTUM = 0.1
BN_EPS = 1e-5

# VaeGan.init_parameters (vae_gan.py:258-262): U(-a, a), a = 1/sqrt(3*fan_in).
# variance_scaling uniform has variance scale/fan_in = a^2/3 => scale = 1/9.
ref_uniform_init = nn.initializers.variance_scaling(1.0 / 9.0, "fan_in", "uniform")
# WaeDiscriminator ctor init (vae_gan.py:522-525): N(0, 0.0099999).
wae_normal_init = nn.initializers.normal(stddev=0.01)


def _cd(cfg: ModelConfig):
    """Compute dtype for MXU ops (None = float32; 'bfloat16' = fast path).
    BatchNorm and parameters always stay float32."""
    return None if cfg.compute_dtype in (None, "float32") else jnp.dtype(cfg.compute_dtype)


def _dense(features, cfg: ModelConfig, *, use_bias=True, kernel_init=None,
           name=None) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=kernel_init or ref_uniform_init,
                    dtype=_cd(cfg), name=name)


class EncoderBlock(nn.Module):
    """Conv(k5, s2, p2, no bias) + BN + ReLU with optional pre-BN tap.

    Reference ``EncoderBlock`` (``vae_gan.py:11-35``); the ``out=True`` tap at
    ``:26-30`` feeds the discriminator's feature-matching loss.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int = 2
    compute_dtype: str | None = None
    pallas_backward: bool = False
    alt_backward: bool = False
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, tap: bool = False):
        kernel = self.param(
            "kernel", ref_uniform_init,
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        y = conv2d(x, kernel, stride=self.stride, padding=self.padding,
                   compute_dtype=self.compute_dtype,
                   pallas_backward=self.pallas_backward,
                   alt_backward=self.alt_backward)
        pre_bn = y
        y = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, pallas=self.pallas_bn
        )(y)
        y = nn.relu(y)
        if tap:
            return y, pre_bn
        return y


class DecoderBlock(nn.Module):
    """ConvTranspose(k5, s2, p2, no bias, output_padding) + BN + ReLU.

    Reference ``DecoderBlock`` (``vae_gan.py:38-60``); ``out=True`` selects
    ``output_padding=1`` for exact spatial doubling.
    """

    features: int
    output_pad: bool = False
    kernel_size: int = 5
    stride: int = 2
    padding: int = 2
    compute_dtype: str | None = None
    pallas_backward: bool = False
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool, vsplit: int = 1):
        kernel = self.param(
            "kernel", ref_uniform_init,
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        y = conv2d_transpose(
            x, kernel, stride=self.stride, padding=self.padding,
            output_padding=1 if self.output_pad else 0,
            compute_dtype=self.compute_dtype,
            pallas_backward=self.pallas_backward,
        )
        y = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, pallas=self.pallas_bn, vsplit=vsplit
        )(y)
        return nn.relu(y)


class VisualEncoder(nn.Module):
    """Image -> (mu, logvar).  Reference ``Encoder`` (``vae_gan.py:63-96``)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self.cfg
        for feats in c.encoder_channels:
            x = EncoderBlock(feats, c.kernel_size, c.stride, c.padding,
                             c.compute_dtype, c.pallas_backward,
                             c.alt_backward, c.pallas_bn)(x, train=train)
        x = x.reshape((x.shape[0], -1))
        x = _dense(c.fc_output, c, use_bias=False)(x).astype(jnp.float32)
        x = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
        )(x)
        x = nn.relu(x)
        mu = _dense(c.latent_dim, c)(x).astype(jnp.float32)
        logvar = _dense(c.latent_dim, c)(x).astype(jnp.float32)
        return mu, logvar


class CognitiveEncoder(nn.Module):
    """fMRI ROI voxels -> (mu, logvar).  Reference (``vae_gan.py:190-232``).

    The 3620-voxel input axis is the natural tensor-parallel shard axis
    (see ``fmri_tpu.parallel.mesh``); ``fc1`` is a single [num_voxels, 1024]
    matmul that maps cleanly onto the MXU.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, v, *, train: bool):
        c = self.cfg
        x = _dense(c.cog_hidden, c, use_bias=False, name="fc1")(v)
        x = x.astype(jnp.float32)
        x = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
        )(x)
        x = nn.relu(x)
        mu = _dense(c.latent_dim, c)(x).astype(jnp.float32)
        logvar = _dense(c.latent_dim, c)(x).astype(jnp.float32)
        return mu, logvar


class Decoder(nn.Module):
    """Latent -> image in [-1, 1].  Reference ``Decoder`` (``vae_gan.py:99-132``).

    The single shared generator: used by every composite in both families.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z, *, train: bool, vsplit: int = 1):
        # ``vsplit=k``: z is k back-to-back latent batches decoded in ONE
        # fused pass with sequential-BN semantics (``models/norm.py``) —
        # used by the fused train steps to batch the x_tilde/x_p decodes.
        c = self.cfg
        size0 = c.encoder_channels[-1]
        x = _dense(c.fc_input * c.fc_input * size0, c, use_bias=False)(z)
        x = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, vsplit=vsplit
        )(x.astype(jnp.float32))
        x = nn.relu(x)
        x = x.reshape((x.shape[0], c.fc_input, c.fc_input, size0))
        # Blocks: size0 -> size0 -> decoder_channels[1] -> decoder_channels[2]
        # (vae_gan.py:112-116), then final 3-channel conv + tanh (:118-121).
        feats = (size0, c.decoder_channels[1], c.decoder_channels[2])
        for f, op in zip(feats, c.output_pad_dec):
            x = DecoderBlock(f, output_pad=op, kernel_size=c.kernel_size,
                             stride=c.stride, padding=c.padding,
                             compute_dtype=c.compute_dtype,
                             pallas_backward=c.pallas_backward,
                             pallas_bn=c.pallas_bn)(x, train=train,
                                                    vsplit=vsplit)
        kernel = self.param(
            "out_kernel", ref_uniform_init, (5, 5, x.shape[-1], c.decoder_channels[3]))
        bias = self.param("out_bias", nn.initializers.zeros, (c.decoder_channels[3],))
        x = conv2d(x, kernel, stride=1, padding=2,
                   compute_dtype=c.compute_dtype,
                   pallas_backward=c.pallas_backward,
                   alt_backward=c.alt_backward) + bias
        return jnp.tanh(x)


class ImageDiscriminator(nn.Module):
    """Image discriminator with feature-matching tap.

    Reference ``Discriminator`` (``vae_gan.py:135-187``).  ``__call__`` runs the
    3-way-concat batch once and returns ``(features, score)`` where ``features``
    is the flattened pre-BN conv output of layer ``recon_level`` (the 'REC'
    mode output, ``:167-173``) and ``score`` the sigmoid real/fake probability
    (the 'GAN' mode output, ``:155-161,183``).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self.cfg
        # Layer 0: conv(k5, stride_gan, p2, bias) + ReLU (vae_gan.py:145-147).
        kernel = self.param(
            "in_kernel", ref_uniform_init, (5, 5, x.shape[-1], c.discrim_channels[0]))
        bias = self.param("in_bias", nn.initializers.zeros, (c.discrim_channels[0],))
        x = nn.relu(conv2d(x, kernel, stride=c.stride_gan, padding=2,
                           compute_dtype=c.compute_dtype,
                           pallas_backward=c.pallas_backward,
                           alt_backward=c.alt_backward) + bias)
        features = None
        for i, feats in enumerate(c.discrim_channels[1:], start=1):
            block = EncoderBlock(feats, c.kernel_size, c.stride, c.padding,
                                 c.compute_dtype, c.pallas_backward,
                                 c.alt_backward, c.pallas_bn)
            if i == c.recon_level:
                x, pre_bn = block(x, train=train, tap=True)
                features = pre_bn.reshape((pre_bn.shape[0], -1))
            else:
                x = block(x, train=train)
        x = x.reshape((x.shape[0], -1))
        x = _dense(c.fc_output_gan, c, use_bias=False)(x).astype(jnp.float32)
        x = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
        )(x)
        x = nn.relu(x)
        x = _dense(1, c)(x).astype(jnp.float32)
        score = nn.sigmoid(x)
        return features, score


class LatentDiscriminator(nn.Module):
    """Latent-space MLP discriminator for the WAE family.

    Reference ``WaeDiscriminator`` (``vae_gan.py:499-529``):
    4x[Dense(512)+ReLU] -> Dense(1) -> sigmoid.  ``init_scheme`` selects between
    the ctor init N(0, 0.01) and the global uniform re-init applied inside
    ``WaeGan.init_parameters`` (``vae_gan.py:452-464``).
    """

    cfg: ModelConfig
    init_scheme: str = "normal"  # "normal" (ctor) | "uniform" (WaeGan re-init)

    @nn.compact
    def __call__(self, z):
        k_init = wae_normal_init if self.init_scheme == "normal" else ref_uniform_init
        cd = _cd(self.cfg)
        x = z
        for _ in range(4):
            x = nn.relu(nn.Dense(self.cfg.wae_disc_hidden, kernel_init=k_init,
                                 dtype=cd)(x))
        x = nn.Dense(1, kernel_init=k_init, dtype=cd)(x).astype(jnp.float32)
        return nn.sigmoid(x)


class VoxelDecoder(nn.Module):
    """Supervised fMRI->image decoder: the ``exp_decoder`` ablation's model —
    a Decoder whose latent FC is replaced by
    Dense(num_voxels -> fc_flat, no bias) + BN + **Tanh**
    (``experiments/exp_decoder.py:172-174``), followed by the standard
    transposed-conv stack."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, v, *, train: bool):
        c = self.cfg
        size0 = c.encoder_channels[-1]
        x = _dense(c.fc_input * c.fc_input * size0, c, use_bias=False)(v)
        x = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
        )(x.astype(jnp.float32))
        x = jnp.tanh(x)
        x = x.reshape((x.shape[0], c.fc_input, c.fc_input, size0))
        feats = (size0, c.decoder_channels[1], c.decoder_channels[2])
        for f, op in zip(feats, c.output_pad_dec):
            x = DecoderBlock(f, output_pad=op, kernel_size=c.kernel_size,
                             stride=c.stride, padding=c.padding,
                             compute_dtype=c.compute_dtype,
                             pallas_backward=c.pallas_backward,
                             pallas_bn=c.pallas_bn)(x, train=train)
        kernel = self.param(
            "out_kernel", ref_uniform_init, (5, 5, x.shape[-1], c.decoder_channels[3]))
        bias = self.param("out_bias", nn.initializers.zeros, (c.decoder_channels[3],))
        x = conv2d(x, kernel, stride=1, padding=2,
                   compute_dtype=c.compute_dtype,
                   pallas_backward=c.pallas_backward,
                   alt_backward=c.alt_backward) + bias
        return jnp.tanh(x)


class WaeDecoder(nn.Module):
    """Alternate wide (1024-channel) decoder — **dead code in the reference**
    (``vae_gan.py:625-655``, only a commented call site at ``:446``), kept for
    capability parity: Dense(z -> fc_input^2 * 1024) + BN + ReLU ->
    DecoderBlocks 1024->512->256->128 -> Conv(->3) + Tanh.

    Deliberate fix vs upstream: the reference hard-codes the fc width to
    ``16*16*1024`` (``:630``) but reshapes to ``config.fc_input`` (=13 at
    its checked-in res100 config, ``:650``) — its forward raises a reshape
    error at its own config (verified by executing the class,
    ``tests/test_reference_parity.py``).  Here the fc width follows
    ``fc_input`` so the module is usable at every preset."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z, *, train: bool):
        c = self.cfg
        x = _dense(c.fc_input * c.fc_input * 1024, c, use_bias=False)(z)
        x = BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS
        )(x.astype(jnp.float32))
        x = nn.relu(x)
        x = x.reshape((x.shape[0], c.fc_input, c.fc_input, 1024))
        for f, op in zip((512, 256, 128), c.output_pad_dec):
            x = DecoderBlock(f, output_pad=op, kernel_size=c.kernel_size,
                             stride=c.stride, padding=c.padding,
                             compute_dtype=c.compute_dtype,
                             pallas_backward=c.pallas_backward,
                             pallas_bn=c.pallas_bn)(x, train=train)
        kernel = self.param("out_kernel", ref_uniform_init, (5, 5, x.shape[-1], 3))
        bias = self.param("out_bias", nn.initializers.zeros, (3,))
        x = conv2d(x, kernel, stride=1, padding=2,
                   compute_dtype=c.compute_dtype,
                   pallas_backward=c.pallas_backward,
                   alt_backward=c.alt_backward) + bias
        return jnp.tanh(x)


class _ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool):
        bn = lambda y: BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, epsilon=BN_EPS)(y)
        h = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    use_bias=False)(x)
        h = nn.relu(bn(h))
        h = nn.Conv(self.features, (3, 3), use_bias=False)(h)
        h = bn(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False)(x)
            x = bn(x)
        return nn.relu(h + x)


class ResNetEncoder(nn.Module):
    """Residual VAE encoder — **dead code in the reference**
    (``vae_gan.py:658-702``, only a commented call site at ``:245``), kept for
    capability parity.  The reference wraps torchvision's *pretrained*
    resnet152 trunk (``vae_gan.py:661-668``); pretrained weights are not
    shippable in this offline TPU build, so by default the trunk is a compact
    residual stack trained from scratch with the same head contract: trunk ->
    GAP -> Dense(1024)+BN -> Dense(768)+BN -> (mu, logvar) heads
    (``vae_gan.py:677-686,693-702``).

    With exported torchvision weights available
    (``fmri_tpu.models.resnet152``: set ``FMRI_TPU_RESNET152_NPZ`` and pass
    ``trunk_fn=resnet152_trunk_fn()``), the trunk is the *real* frozen
    pretrained resnet152 feature extractor — exactly the reference's
    configuration."""

    cfg: ModelConfig
    fc_hidden1: int = 1024
    fc_hidden2: int = 768
    trunk_fn: Callable | None = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self.cfg
        bn1d = lambda y: BatchNorm(use_running_average=not train,
                                      momentum=BN_MOMENTUM, epsilon=BN_EPS)(y)
        if self.trunk_fn is not None:
            h = self.trunk_fn(x)  # frozen pretrained features [B, 2048]
        else:
            h = nn.Conv(64, (7, 7), (2, 2), use_bias=False)(x)
            h = nn.relu(BatchNorm(use_running_average=not train,
                                     momentum=BN_MOMENTUM, epsilon=BN_EPS)(h))
            for feats, stride in ((64, 1), (128, 2), (256, 2), (512, 2)):
                h = _ResBlock(feats, stride)(h, train=train)
            h = jnp.mean(h, axis=(1, 2))  # global average pool (resnet avgpool)
        h = nn.relu(bn1d(nn.Dense(self.fc_hidden1)(h)))
        h = nn.relu(bn1d(nn.Dense(self.fc_hidden2)(h)))
        mu = nn.Dense(c.latent_dim)(h)
        logvar = nn.Dense(c.latent_dim)(h)
        return mu, logvar


def reparameterize(rng: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mu + eps * exp(logvar/2), eps ~ N(0, I)  (``vae_gan.py:266-269``)."""
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)
