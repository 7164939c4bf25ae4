"""Shape/dtype golden tests for every Flax module at both public presets,
mirroring the architecture tables in SURVEY.md §2.1 / reference
``models/vae_gan.py`` (64px/latent-128 and 100px/latent-512,
``configs/models_config.py:13-31``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmri_tpu.configs import RES64, RES100
from fmri_tpu.models import (
    CognitiveEncoder, Decoder, ImageDiscriminator, LatentDiscriminator,
    VisualEncoder, reparameterize,
)

PRESETS = [("res64", RES64), ("res100", RES100)]


def _init_apply(module, x, **kw):
    variables = module.init(jax.random.key(0), x, **kw)
    out, updates = module.apply(
        variables, x, mutable=["batch_stats"], **kw)
    return variables, out


@pytest.mark.parametrize("name,cfg", PRESETS)
def test_visual_encoder_shapes(name, cfg):
    c = cfg.model
    x = jnp.zeros((4, c.image_size, c.image_size, 3))
    _, (mu, logvar) = _init_apply(VisualEncoder(c), x, train=True)
    assert mu.shape == (4, c.latent_dim)
    assert logvar.shape == (4, c.latent_dim)


@pytest.mark.parametrize("name,cfg", PRESETS)
def test_encoder_conv_tower_matches_fc_input(name, cfg):
    # After 3 stride-2 convs (k5 p2: out = ceil(in/2)), spatial == fc_input
    # (models_config.py:14,25).
    c = cfg.model
    s = c.image_size
    for _ in range(3):
        s = -(-s // 2)
    assert s == c.fc_input


@pytest.mark.parametrize("name,cfg", PRESETS)
def test_decoder_shapes(name, cfg):
    c = cfg.model
    z = jnp.zeros((4, c.latent_dim))
    _, x = _init_apply(Decoder(c), z, train=True)
    assert x.shape == (4, c.image_size, c.image_size, 3)
    assert np.all(np.abs(np.asarray(x)) <= 1.0)  # tanh output


@pytest.mark.parametrize("name,cfg", PRESETS)
def test_discriminator_shapes(name, cfg):
    c = cfg.model
    b = 4
    x = jnp.zeros((3 * b, c.image_size, c.image_size, 3))  # 3-way concat batch
    _, (features, score) = _init_apply(ImageDiscriminator(c), x, train=True)
    assert score.shape == (3 * b, 1)
    assert np.all((np.asarray(score) >= 0) & (np.asarray(score) <= 1))
    # Feature tap: pre-BN output of block recon_level, flattened.
    # Spatial after layer0 (stride_gan) then stride-2 blocks up to recon_level.
    s = -(-c.image_size // c.stride_gan)
    for _ in range(c.recon_level):
        s = -(-s // 2)
    assert features.shape == (3 * b, s * s * c.discrim_channels[c.recon_level])


@pytest.mark.parametrize("name,cfg", PRESETS)
def test_discriminator_fc_geometry(name, cfg):
    # fc_input_gan (models_config.py:16,27) is spatial size after the full conv
    # stack; confirms the single-pass tap+score discriminator matches the table.
    c = cfg.model
    s = -(-c.image_size // c.stride_gan)
    for _ in range(len(c.discrim_channels) - 1):
        s = -(-s // 2)
    assert s == c.fc_input_gan


@pytest.mark.parametrize("name,cfg", PRESETS)
def test_cognitive_encoder_shapes(name, cfg):
    c = cfg.model
    v = jnp.zeros((4, c.num_voxels))
    _, (mu, logvar) = _init_apply(CognitiveEncoder(c), v, train=True)
    assert mu.shape == (4, c.latent_dim)
    assert logvar.shape == (4, c.latent_dim)


def test_latent_discriminator_shapes_and_init():
    c = RES64.model
    z = jnp.ones((4, c.latent_dim))
    m = LatentDiscriminator(c)
    variables = m.init(jax.random.key(0), z)
    out = m.apply(variables, z)
    assert out.shape == (4, 1)
    assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))
    # ctor init: N(0, 0.01) (vae_gan.py:522-525)
    w = variables["params"]["Dense_0"]["kernel"]
    assert np.abs(np.std(np.asarray(w)) - 0.01) < 0.002
    b = variables["params"]["Dense_0"]["bias"]
    assert np.all(np.asarray(b) == 0)


def test_reference_uniform_init_scale():
    # VaeGan.init_parameters: U(-a, a), a = 1/sqrt(3*fan_in) (vae_gan.py:258-262).
    c = RES64.model
    x = jnp.zeros((2, c.image_size, c.image_size, 3))
    variables = VisualEncoder(c).init(jax.random.key(1), x, train=True)
    k = np.asarray(variables["params"]["EncoderBlock_0"]["kernel"])
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    bound = 1.0 / np.sqrt(3.0 * fan_in)
    assert np.max(np.abs(k)) <= bound + 1e-12
    assert np.max(np.abs(k)) > 0.8 * bound  # actually fills the range


def test_reparameterize_moments():
    mu = jnp.full((2000, 8), 1.5)
    logvar = jnp.full((2000, 8), np.log(0.25))  # sigma = 0.5
    z = reparameterize(jax.random.key(0), mu, logvar)
    assert np.abs(np.mean(np.asarray(z)) - 1.5) < 0.02
    assert np.abs(np.std(np.asarray(z)) - 0.5) < 0.02


def test_batchnorm_matches_torch_momentum():
    # flax momentum 0.1 == torch momentum 0.9: after one batch, running_mean
    # = 0.9 * batch_mean.
    import flax.linen as nn
    from fmri_tpu.models import BN_MOMENTUM

    bn = nn.BatchNorm(use_running_average=False, momentum=BN_MOMENTUM)
    x = jnp.ones((16, 4)) * 2.0
    variables = bn.init(jax.random.key(0), x)
    _, updates = bn.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]), 0.9 * 2.0, rtol=1e-6)


def test_wae_decoder_shapes():
    """WaeDecoder (dead code in the reference, vae_gan.py:625-655): wide
    1024-channel decoder produces tanh images at the preset resolution."""
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import TINY
    from fmri_tpu.models import WaeDecoder

    c = TINY.model
    z = jnp.zeros((2, c.latent_dim))
    m = WaeDecoder(c)
    v = m.init(jax.random.key(0), z, train=True)
    y = m.apply(v, z, train=False)
    assert y.shape == (2, c.image_size, c.image_size, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_resnet_encoder_shapes():
    """ResNetEncoder (dead code in the reference, vae_gan.py:658-702):
    residual trunk + (mu, logvar) heads."""
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import TINY
    from fmri_tpu.models import ResNetEncoder

    c = TINY.model
    x = jnp.zeros((2, c.image_size, c.image_size, 3))
    m = ResNetEncoder(c)
    v = m.init(jax.random.key(0), x, train=True)
    mu, lv = m.apply(v, x, train=False)
    assert mu.shape == (2, c.latent_dim) and lv.shape == (2, c.latent_dim)


def test_res100_geometry():
    """The paper preset (100px / latent 512, models_config.py:13-21): encoder
    spatial chain 100->50->25->13 (fc_input 13), discriminator with
    stride_gan=2 first layer -> fc_input_gan 7; decoder output_padding
    pattern (False, True, True) restores exactly 100px."""
    import jax
    import jax.numpy as jnp

    from fmri_tpu.configs import RES100
    from fmri_tpu.models import Decoder, ImageDiscriminator, VisualEncoder

    c = RES100.model
    x = jnp.zeros((2, 100, 100, 3))
    enc = VisualEncoder(c)
    v = enc.init(jax.random.key(0), x, train=True)
    mu, lv = enc.apply(v, x, train=False)
    assert mu.shape == (2, 512)

    dec = Decoder(c)
    vd = dec.init(jax.random.key(1), mu, train=True)
    y = dec.apply(vd, mu, train=False)
    assert y.shape == (2, 100, 100, 3)

    disc = ImageDiscriminator(c)
    vdi = disc.init(jax.random.key(2), jnp.concatenate([x] * 3, 0), train=True)
    feats, score = disc.apply(vdi, jnp.concatenate([x] * 3, 0), train=False)
    assert score.shape == (6, 1)
    # feature tap at recon_level flattens the pre-BN conv activations
    assert feats.shape[0] == 6
