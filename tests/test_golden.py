"""Golden-activation regression tests (SURVEY.md §4 item 4).

Fixed-seed forward passes of every module at the public config point (res64 /
latent 128) are recorded once into ``tests/golden/res64.npz`` and asserted on
every run — protecting the numerics of future refactors (kernel swaps,
precision changes, layout changes must either match or consciously regenerate).

Regenerate after an *intentional* numeric change:

    FMRI_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "res64.npz")


def _compute_fingerprints():
    """Deterministic scalar fingerprints of each module's forward pass."""
    from fmri_tpu.configs import RES64
    from fmri_tpu.models import (
        CognitiveEncoder, Decoder, ImageDiscriminator, LatentDiscriminator,
        VisualEncoder, VoxelDecoder,
    )

    c = RES64.model
    out = {}
    x = jax.random.uniform(jax.random.key(10), (2, 64, 64, 3),
                           minval=-1.0, maxval=1.0)
    z = jax.random.normal(jax.random.key(11), (2, c.latent_dim))
    v = jax.random.normal(jax.random.key(12), (2, c.num_voxels))

    enc = VisualEncoder(c)
    ev = enc.init(jax.random.key(0), x, train=True)
    mu, lv = enc.apply(ev, x, train=False)
    out["enc_mu"] = np.asarray([jnp.sum(mu), jnp.sum(jnp.abs(mu)), jnp.sum(lv)])

    dec = Decoder(c)
    dv = dec.init(jax.random.key(1), z, train=True)
    y = dec.apply(dv, z, train=False)
    out["dec"] = np.asarray([jnp.sum(y), jnp.sum(jnp.abs(y)), jnp.std(y)])

    disc = ImageDiscriminator(c)
    civ = disc.init(jax.random.key(2), jnp.concatenate([x] * 3, 0), train=True)
    feats, score = disc.apply(civ, jnp.concatenate([x] * 3, 0), train=False)
    out["disc"] = np.asarray([jnp.sum(feats), jnp.sum(score), jnp.std(feats)])

    cog = CognitiveEncoder(c)
    cv = cog.init(jax.random.key(3), v, train=True)
    cmu, clv = cog.apply(cv, v, train=False)
    out["cog"] = np.asarray([jnp.sum(cmu), jnp.sum(clv), jnp.std(cmu)])

    ld = LatentDiscriminator(c, init_scheme="normal")
    lv_ = ld.init(jax.random.key(4), z)
    s = ld.apply(lv_, z)
    out["latent_disc"] = np.asarray([jnp.sum(s), jnp.std(s), 0.0])

    vd = VoxelDecoder(c)
    vv = vd.init(jax.random.key(5), v, train=True)
    yv = vd.apply(vv, v, train=False)
    out["voxel_dec"] = np.asarray([jnp.sum(yv), jnp.sum(jnp.abs(yv)), jnp.std(yv)])
    return out


def test_golden_res64_forward_fingerprints():
    fp = _compute_fingerprints()
    if os.environ.get("FMRI_TPU_REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **fp)
        if os.environ.get("FMRI_TPU_REGEN_GOLDEN"):
            pytest.skip("golden regenerated")
    golden = np.load(GOLDEN)
    for key, val in fp.items():
        np.testing.assert_allclose(
            val, golden[key], rtol=2e-4, atol=1e-4,
            err_msg=f"{key} drifted from golden — if intentional, regenerate "
                    f"with FMRI_TPU_REGEN_GOLDEN=1")


GOLDEN100 = os.path.join(os.path.dirname(__file__), "golden", "res100.npz")


def test_golden_res100_forward_fingerprints():
    """Same fingerprints at the paper preset (100px / latent 512,
    models_config.py:13-21)."""
    from fmri_tpu.configs import RES100
    from fmri_tpu.models import Decoder, ImageDiscriminator, VisualEncoder

    c = RES100.model
    fp = {}
    x = jax.random.uniform(jax.random.key(20), (2, 100, 100, 3),
                           minval=-1.0, maxval=1.0)
    z = jax.random.normal(jax.random.key(21), (2, c.latent_dim))

    enc = VisualEncoder(c)
    ev = enc.init(jax.random.key(0), x, train=True)
    mu, lv = enc.apply(ev, x, train=False)
    fp["enc_mu"] = np.asarray([jnp.sum(mu), jnp.sum(jnp.abs(mu)), jnp.sum(lv)])

    dec = Decoder(c)
    dv = dec.init(jax.random.key(1), z, train=True)
    y = dec.apply(dv, z, train=False)
    fp["dec"] = np.asarray([jnp.sum(y), jnp.sum(jnp.abs(y)), jnp.std(y)])

    disc = ImageDiscriminator(c)
    civ = disc.init(jax.random.key(2), jnp.concatenate([x] * 3, 0), train=True)
    feats, score = disc.apply(civ, jnp.concatenate([x] * 3, 0), train=False)
    fp["disc"] = np.asarray([jnp.sum(feats), jnp.sum(score), jnp.std(feats)])

    if os.environ.get("FMRI_TPU_REGEN_GOLDEN") or not os.path.exists(GOLDEN100):
        np.savez(GOLDEN100, **fp)
        if os.environ.get("FMRI_TPU_REGEN_GOLDEN"):
            pytest.skip("golden regenerated")
    golden = np.load(GOLDEN100)
    for key, val in fp.items():
        np.testing.assert_allclose(val, golden[key], rtol=2e-4, atol=1e-4,
                                   err_msg=key)
