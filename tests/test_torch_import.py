"""Reference-checkpoint import: convert torch state_dicts, verify forward
parity against torch oracles built to the reference's documented architecture
(``models/vae_gan.py`` — structure re-implemented here from SURVEY.md §2.1,
not copied), in eval mode with imported running stats.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax

from fmri_tpu.configs import TINY
from fmri_tpu.checkpoints.torch_import import (
    convert_decoder, convert_state_dict, convert_visual_encoder,
)
from fmri_tpu.models import (
    CognitiveEncoder, Decoder, ImageDiscriminator, LatentDiscriminator,
    VisualEncoder,
)

C = TINY.model
torch.manual_seed(0)


def _randomize_bn_stats(mod):
    """Non-trivial running stats so the stat mapping is actually exercised."""
    for m in mod.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.2, 0.2)


class TEncBlock(tnn.Module):
    """conv(k5,s2,p2,no bias)+BN+ReLU (vae_gan.py:11-35)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 5, 2, 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout, momentum=0.9)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TDecBlock(tnn.Module):
    """deconv(k5,s2,p2,op,no bias)+BN+ReLU (vae_gan.py:38-60)."""

    def __init__(self, cin, cout, out):
        super().__init__()
        self.conv = tnn.ConvTranspose2d(cin, cout, 5, stride=2, padding=2,
                                        output_padding=1 if out else 0,
                                        bias=False)
        self.bn = tnn.BatchNorm2d(cout, momentum=0.9)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        chans = [3] + list(C.encoder_channels)
        self.conv = tnn.Sequential(*[TEncBlock(chans[i], chans[i + 1])
                                     for i in range(len(C.encoder_channels))])
        flat = C.fc_input * C.fc_input * chans[-1]
        self.fc = tnn.Sequential(tnn.Linear(flat, C.fc_output, bias=False),
                                 tnn.BatchNorm1d(C.fc_output, momentum=0.9),
                                 tnn.ReLU(True))
        self.l_mu = tnn.Linear(C.fc_output, C.latent_dim)
        self.l_var = tnn.Linear(C.fc_output, C.latent_dim)

    def forward(self, x):
        t = self.conv(x)
        t = self.fc(t.view(len(t), -1))
        return self.l_mu(t), self.l_var(t)


class TDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        size0 = C.encoder_channels[-1]
        flat = C.fc_input * C.fc_input * size0
        self.fc = tnn.Sequential(tnn.Linear(C.latent_dim, flat, bias=False),
                                 tnn.BatchNorm1d(flat, momentum=0.9),
                                 tnn.ReLU(True))
        self.conv = tnn.Sequential(
            TDecBlock(size0, size0, C.output_pad_dec[0]),
            TDecBlock(size0, C.decoder_channels[1], C.output_pad_dec[1]),
            TDecBlock(C.decoder_channels[1], C.decoder_channels[2],
                      C.output_pad_dec[2]),
            tnn.Sequential(tnn.Conv2d(C.decoder_channels[2],
                                      C.decoder_channels[3], 5, 1, 2),
                           tnn.Tanh()))

    def forward(self, z):
        t = self.fc(z)
        t = t.view(len(t), -1, C.fc_input, C.fc_input)
        return self.conv(t)


class TDiscriminator(tnn.Module):
    def __init__(self):
        super().__init__()
        ch = C.discrim_channels
        self.conv = tnn.ModuleList()
        self.conv.append(tnn.Sequential(
            tnn.Conv2d(3, ch[0], 5, C.stride_gan, 2), tnn.ReLU(True)))
        for i in range(1, len(ch)):
            self.conv.append(TEncBlock(ch[i - 1], ch[i]))
        flat = C.fc_input_gan * C.fc_input_gan * ch[-1]
        self.fc = tnn.Sequential(tnn.Linear(flat, C.fc_output_gan, bias=False),
                                 tnn.BatchNorm1d(C.fc_output_gan, momentum=0.9),
                                 tnn.ReLU(True),
                                 tnn.Linear(C.fc_output_gan, 1))

    def forward(self, x):
        for lay in self.conv:
            x = lay(x)
        return torch.sigmoid(self.fc(x.view(len(x), -1)))


class TCognitive(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = tnn.Sequential(tnn.Linear(C.num_voxels, C.cog_hidden,
                                             bias=False),
                                  tnn.BatchNorm1d(C.cog_hidden, momentum=0.9),
                                  tnn.ReLU(True))
        self.l_mu = tnn.Linear(C.cog_hidden, C.latent_dim)
        self.l_var = tnn.Linear(C.cog_hidden, C.latent_dim)

    def forward(self, v):
        t = self.fc1(v)
        return self.l_mu(t), self.l_var(t)


class TWaeDiscriminator(tnn.Module):
    def __init__(self):
        super().__init__()
        h = C.wae_disc_hidden
        self.main = tnn.Sequential(
            tnn.Linear(C.latent_dim, h), tnn.ReLU(True),
            tnn.Linear(h, h), tnn.ReLU(True),
            tnn.Linear(h, h), tnn.ReLU(True),
            tnn.Linear(h, h), tnn.ReLU(True),
            tnn.Linear(h, 1), tnn.Sigmoid())

    def forward(self, z):
        return self.main(z)


def _prefixed(mod, prefix):
    return {f"{prefix}{k}": v for k, v in mod.state_dict().items()}


def _images(n=4):
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 1, (n, C.image_size, C.image_size, 3)).astype(
        np.float32)


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def test_visual_encoder_parity():
    t = TEncoder().eval()
    _randomize_bn_stats(t)
    g = convert_visual_encoder(_prefixed(t, "encoder."), TINY, prefix="encoder.")
    x = _images()
    with torch.no_grad():
        mu_t, lv_t = t(_nchw(x))
    mu_j, lv_j = VisualEncoder(C).apply(
        {"params": g["params"], "batch_stats": g["batch_stats"]},
        x, train=False)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=2e-4)


def test_decoder_parity():
    t = TDecoder().eval()
    _randomize_bn_stats(t)
    g = convert_decoder(_prefixed(t, "decoder."), TINY, prefix="decoder.")
    z = np.random.default_rng(1).normal(size=(4, C.latent_dim)).astype(np.float32)
    with torch.no_grad():
        out_t = t(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)
    out_j = Decoder(C).apply(
        {"params": g["params"], "batch_stats": g["batch_stats"]},
        z, train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4)


def test_discriminator_parity():
    t = TDiscriminator().eval()
    _randomize_bn_stats(t)
    g = convert_state_dict(
        {**_prefixed(t, "discriminator."), **_prefixed(TEncoder(), "encoder."),
         **_prefixed(TDecoder(), "decoder.")}, TINY)["discriminator"]
    x = _images(6)
    with torch.no_grad():
        score_t = t(_nchw(x)).numpy()
    _, score_j = ImageDiscriminator(C).apply(
        {"params": g["params"], "batch_stats": g["batch_stats"]},
        x, train=False)
    np.testing.assert_allclose(np.asarray(score_j), score_t, atol=2e-4)


def test_cognitive_and_latent_disc_parity():
    tc = TCognitive().eval()
    _randomize_bn_stats(tc)
    tw = TWaeDiscriminator().eval()
    sd = {**_prefixed(tc, "encoder."), **_prefixed(TDecoder(), "decoder."),
          **_prefixed(tw, "discriminator.")}
    groups = convert_state_dict(sd, TINY, kind="wae-gan-cognitive")

    v = np.random.default_rng(2).normal(size=(4, C.num_voxels)).astype(np.float32)
    with torch.no_grad():
        mu_t, lv_t = tc(torch.from_numpy(v))
    ge = groups["encoder"]
    mu_j, lv_j = CognitiveEncoder(C).apply(
        {"params": ge["params"], "batch_stats": ge["batch_stats"]},
        v, train=False)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=2e-4)

    z = np.random.default_rng(3).normal(size=(4, C.latent_dim)).astype(np.float32)
    with torch.no_grad():
        s_t = tw(torch.from_numpy(z)).numpy()
    s_j = LatentDiscriminator(C).apply(
        {"params": groups["latent_disc"]["params"]}, z)
    np.testing.assert_allclose(np.asarray(s_j), s_t, atol=1e-5)


def test_full_vaegan_roundtrip_reconstruction():
    """Import a full VaeGan state_dict and run encode->decode: the imported
    pipeline reproduces the torch pipeline's reconstruction."""
    te, td = TEncoder().eval(), TDecoder().eval()
    _randomize_bn_stats(te)
    _randomize_bn_stats(td)
    sd = {**_prefixed(te, "encoder."), **_prefixed(td, "decoder."),
          **_prefixed(TDiscriminator(), "discriminator.")}
    groups = convert_state_dict(sd, TINY, kind="vae-gan")

    x = _images(5)
    with torch.no_grad():
        mu_t, _ = te(_nchw(x))
        rec_t = td(mu_t).numpy().transpose(0, 2, 3, 1)
    ge, gd = groups["encoder"], groups["decoder"]
    mu_j, _ = VisualEncoder(C).apply(
        {"params": ge["params"], "batch_stats": ge["batch_stats"]},
        x, train=False)
    rec_j = Decoder(C).apply(
        {"params": gd["params"], "batch_stats": gd["batch_stats"]},
        np.asarray(mu_j), train=False)
    np.testing.assert_allclose(np.asarray(rec_j), rec_t, atol=5e-4)


def test_import_cli_then_inference(tmp_path):
    """.pth -> import CLI -> framework checkpoint -> inference CLI runs."""
    import os
    import subprocess
    import sys

    te, td, tdisc = TEncoder(), TDecoder(), TDiscriminator()
    sd = {**_prefixed(te, "encoder."), **_prefixed(td, "decoder."),
          **_prefixed(tdisc, "discriminator.")}
    pth = str(tmp_path / "vaegan_90.pth")
    torch.save(sd, pth)

    ckpt_dir = str(tmp_path / "imported")
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", FMRI_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.checkpoints.torch_import",
         "-i", pth, "-o", ckpt_dir, "--kind", "vae-gan", "--preset", "tiny",
         "--epoch", "90"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isdir(os.path.join(ckpt_dir, "ckpt_00090"))

    out = str(tmp_path / "inf")
    r = subprocess.run(
        [sys.executable, "-m", "fmri_tpu.eval.inference", "--family", "vgan",
         "--stage", "1", "--preset", "tiny", "--dataset", "synthetic",
         "--ckpt", ckpt_dir, "--no-is", "-o", out],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, (r.stderr[-3000:] or r.stdout[-3000:])
    assert os.path.exists(os.path.join(out, "summary.json"))


def test_export_roundtrip_strict_load():
    """Export our groups to a reference-layout state_dict; torch oracles
    load it with strict=True (exact key check) and reproduce our forwards;
    convert(export(x)) round-trips bit-exactly."""
    from fmri_tpu.checkpoints.torch_import import export_state_dict

    te, td, tdisc = TEncoder(), TDecoder(), TDiscriminator()
    for m in (te, td, tdisc):
        _randomize_bn_stats(m)
    sd0 = {**_prefixed(te, "encoder."), **_prefixed(td, "decoder."),
           **_prefixed(tdisc, "discriminator.")}
    groups = convert_state_dict(sd0, TINY, kind="vae-gan")

    sd1 = export_state_dict(groups, TINY, kind="vae-gan")
    # strict load into fresh oracles: key names and shapes must match exactly
    te2, td2, tdisc2 = TEncoder().eval(), TDecoder().eval(), TDiscriminator().eval()
    te2.load_state_dict({k[len("encoder."):]: torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in sd1.items()
        if k.startswith("encoder.")}, strict=True)
    td2.load_state_dict({k[len("decoder."):]: torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in sd1.items()
        if k.startswith("decoder.")}, strict=True)
    tdisc2.load_state_dict({k[len("discriminator."):]: torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in sd1.items()
        if k.startswith("discriminator.")}, strict=True)

    x = _images(4)
    with torch.no_grad():
        mu_a, _ = te.eval()(_nchw(x))
        mu_b, _ = te2(_nchw(x))
    np.testing.assert_allclose(mu_b.numpy(), mu_a.numpy(), atol=1e-6)

    # bit-exact numeric round trip through convert(export(.))
    groups2 = convert_state_dict(sd1, TINY, kind="vae-gan")
    a = jax.tree_util.tree_leaves(groups)
    b = jax.tree_util.tree_leaves(groups2)
    assert len(a) == len(b)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_dcgan_kind():
    sd = {**_prefixed(TDecoder(), "decoder."),
          **_prefixed(TDiscriminator(), "discriminator.")}
    groups = convert_state_dict(sd, TINY, kind="dcgan")
    assert set(groups) == {"decoder", "discriminator"}


def test_cognitive_with_teacher_net():
    """Stage-2 VaeGanCognitive state_dicts carry the whole Stage-I teacher
    under teacher_net.* (vae_gan.py:343); its encoder maps to our
    teacher_encoder group."""
    tc, td, tdisc, tt = TCognitive(), TDecoder(), TDiscriminator(), TEncoder()
    _randomize_bn_stats(tt)
    sd = {**_prefixed(tc, "encoder."), **_prefixed(td, "decoder."),
          **_prefixed(tdisc, "discriminator."),
          **_prefixed(tt, "teacher_net.encoder."),
          **_prefixed(TDecoder(), "teacher_net.decoder."),
          **_prefixed(TDiscriminator(), "teacher_net.discriminator.")}
    groups = convert_state_dict(sd, TINY, kind="vae-gan-cognitive")
    assert set(groups) == {"encoder", "decoder", "discriminator",
                           "teacher_encoder"}

    x = _images(4)
    with torch.no_grad():
        mu_t, _ = tt.eval()(_nchw(x))
    gt = groups["teacher_encoder"]
    mu_j, _ = VisualEncoder(C).apply(
        {"params": gt["params"], "batch_stats": gt["batch_stats"]},
        x, train=False)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-4)


def test_stage2_export_import_symmetry():
    """vae-gan-cognitive export emits the teacher_net.* keys back (shared
    decoder/discriminator + teacher encoder), so convert(export(x)) keeps all
    4 groups and the teacher survives the round trip."""
    from fmri_tpu.checkpoints.torch_import import export_state_dict

    tc, td, tdisc, tt = TCognitive(), TDecoder(), TDiscriminator(), TEncoder()
    sd = {**_prefixed(tc, "encoder."), **_prefixed(td, "decoder."),
          **_prefixed(tdisc, "discriminator."),
          **_prefixed(tt, "teacher_net.encoder."),
          **_prefixed(td, "teacher_net.decoder."),
          **_prefixed(tdisc, "teacher_net.discriminator.")}
    g1 = convert_state_dict(sd, TINY, kind="vae-gan-cognitive")
    sd2 = export_state_dict(g1, TINY, kind="vae-gan-cognitive")
    assert any(k.startswith("teacher_net.encoder.") for k in sd2)
    assert any(k.startswith("teacher_net.decoder.") for k in sd2)
    g2 = convert_state_dict(sd2, TINY, kind="vae-gan-cognitive")
    assert set(g2) == {"encoder", "decoder", "discriminator", "teacher_encoder"}
    a = jax.tree_util.tree_leaves(g1["teacher_encoder"])
    b = jax.tree_util.tree_leaves(g2["teacher_encoder"])
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
