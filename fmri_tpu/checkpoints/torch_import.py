"""Import the reference's PyTorch ``.pth`` checkpoints into this framework.

A user of the reference (MariaPdg/thesis-fmri-reconstruction) holds trained
``state_dict`` files saved by ``torch.save(model.state_dict(), ...)``
(``train_vgan_stage1.py:596-598``).  This module converts them into this
framework's named parameter groups so those checkpoints can be evaluated,
fine-tuned, or stage-handed-off here without retraining.

Layout conversions (reference is NCHW/torch, this framework is NHWC/flax):

* ``nn.Conv2d``  weight ``[O, I, kh, kw]``      -> HWIO ``[kh, kw, I, O]``.
* ``nn.ConvTranspose2d`` weight ``[I, O, kh, kw]`` -> ``[kh, kw, I, O]`` with a
  180-degree spatial rotation: torch's transposed conv scatters the kernel
  (a dilated *convolution*), while ``ops.conv.conv2d_transpose`` computes a
  dilated *correlation* (``ops/conv.py:54``), so the spatial taps flip.
* ``nn.Linear`` weight ``[out, in]`` -> kernel ``[in, out]``.
* FC layers that touch flattened conv activations permute the flattened axis
  from C-major (torch ``view(B, -1)`` of NCHW, e.g. ``vae_gan.py:89``) to
  HWC-major (our NHWC reshape): the encoder/discriminator FC input dim and
  the decoder FC *output* dim + its BatchNorm1d vector
  (``vae_gan.py:107-109,126-127``).
* ``bn.weight/bias`` -> BatchNorm ``scale``/``bias`` params;
  ``running_mean/running_var`` -> ``batch_stats`` ``mean``/``var``.

Reference attribute names (= state_dict key prefixes) follow
``models/vae_gan.py``: Encoder ``conv.{i}.conv/.bn``, ``fc.0/.1``,
``l_mu``/``l_var`` (``:74-85``); Decoder ``fc.0/.1``, ``conv.{0,1,2}.conv/.bn``,
``conv.3.0`` (``:107-123``); Discriminator ``conv.0.0``, ``conv.{1,2,3}``,
``fc.0/.1/.3`` (``:144-161``); CognitiveEncoder ``fc1.0/.1``, ``l_mu``/``l_var``
(``:199-207``); WaeDiscriminator ``main.{0,2,4,6,8}`` (``:510-521``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from fmri_tpu.configs.presets import Config

Array = np.ndarray
Groups = Dict[str, Dict[str, Any]]


def _np(x) -> Array:
    """torch.Tensor (cpu) or array-like -> float32 numpy array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _lin(w) -> Array:
    return _np(w).T  # [out, in] -> [in, out]


def _conv(w) -> Array:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _deconv(w) -> Array:
    # torch deconv weight is [I, O, kh, kw]; rotate taps 180 deg, then IOHW
    # -> HWIO ordering of the remaining dims.
    return np.flip(_np(w), (2, 3)).transpose(2, 3, 0, 1).copy()


def _fc_in_chw_to_hwc(w, c: int, h: int, wd: int) -> Array:
    """Linear weight [out, C*H*W] whose *input* is a flattened conv map."""
    w = _np(w)
    out = w.shape[0]
    return w.reshape(out, c, h, wd).transpose(0, 2, 3, 1).reshape(out, -1).T


def _fc_out_chw_to_hwc(w, c: int, h: int, wd: int) -> Array:
    """Linear weight [C*H*W, in] whose *output* reshapes into a conv map."""
    w = _np(w)
    zin = w.shape[1]
    return w.reshape(c, h, wd, zin).transpose(1, 2, 0, 3).reshape(-1, zin).T


def _vec_chw_to_hwc(v, c: int, h: int, wd: int) -> Array:
    return _np(v).reshape(c, h, wd).transpose(1, 2, 0).reshape(-1)


def _bn(sd: Mapping, prefix: str):
    return ({"scale": _np(sd[f"{prefix}.weight"]),
             "bias": _np(sd[f"{prefix}.bias"])},
            {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])})


def _bn_perm(sd: Mapping, prefix: str, c: int, h: int, wd: int):
    p, s = _bn(sd, prefix)
    perm = lambda v: _vec_chw_to_hwc(v, c, h, wd)
    return ({k: perm(v) for k, v in p.items()},
            {k: perm(v) for k, v in s.items()})


def convert_visual_encoder(sd: Mapping, cfg: Config, prefix: str = "") -> Dict:
    """Reference ``Encoder`` (``vae_gan.py:63-96``) -> VisualEncoder group."""
    c = cfg.model
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(len(c.encoder_channels)):
        bnp, bns = _bn(sd, f"{prefix}conv.{i}.bn")
        params[f"EncoderBlock_{i}"] = {
            "kernel": _conv(sd[f"{prefix}conv.{i}.conv.weight"]),
            "BatchNorm_0": bnp}
        stats[f"EncoderBlock_{i}"] = {"BatchNorm_0": bns}
    ch = c.encoder_channels[-1]
    params["Dense_0"] = {"kernel": _fc_in_chw_to_hwc(
        sd[f"{prefix}fc.0.weight"], ch, c.fc_input, c.fc_input)}
    bnp, bns = _bn(sd, f"{prefix}fc.1")
    params["BatchNorm_0"] = bnp
    stats["BatchNorm_0"] = bns
    params["Dense_1"] = {"kernel": _lin(sd[f"{prefix}l_mu.weight"]),
                         "bias": _np(sd[f"{prefix}l_mu.bias"])}
    params["Dense_2"] = {"kernel": _lin(sd[f"{prefix}l_var.weight"]),
                         "bias": _np(sd[f"{prefix}l_var.bias"])}
    return {"params": params, "batch_stats": stats}


def convert_decoder(sd: Mapping, cfg: Config, prefix: str = "") -> Dict:
    """Reference ``Decoder`` (``vae_gan.py:99-132``) -> Decoder group."""
    c = cfg.model
    size0 = c.encoder_channels[-1]
    params: Dict[str, Any] = {
        "Dense_0": {"kernel": _fc_out_chw_to_hwc(
            sd[f"{prefix}fc.0.weight"], size0, c.fc_input, c.fc_input)}}
    bnp, bns = _bn_perm(sd, f"{prefix}fc.1", size0, c.fc_input, c.fc_input)
    params["BatchNorm_0"] = bnp
    stats: Dict[str, Any] = {"BatchNorm_0": bns}
    for i in range(3):
        bnp, bns = _bn(sd, f"{prefix}conv.{i}.bn")
        params[f"DecoderBlock_{i}"] = {
            "kernel": _deconv(sd[f"{prefix}conv.{i}.conv.weight"]),
            "BatchNorm_0": bnp}
        stats[f"DecoderBlock_{i}"] = {"BatchNorm_0": bns}
    params["out_kernel"] = _conv(sd[f"{prefix}conv.3.0.weight"])
    params["out_bias"] = _np(sd[f"{prefix}conv.3.0.bias"])
    return {"params": params, "batch_stats": stats}


def convert_image_discriminator(sd: Mapping, cfg: Config, prefix: str = "") -> Dict:
    """Reference ``Discriminator`` (``vae_gan.py:135-187``) -> group."""
    c = cfg.model
    params: Dict[str, Any] = {
        "in_kernel": _conv(sd[f"{prefix}conv.0.0.weight"]),
        "in_bias": _np(sd[f"{prefix}conv.0.0.bias"])}
    stats: Dict[str, Any] = {}
    for i in range(1, len(c.discrim_channels)):
        bnp, bns = _bn(sd, f"{prefix}conv.{i}.bn")
        params[f"EncoderBlock_{i - 1}"] = {
            "kernel": _conv(sd[f"{prefix}conv.{i}.conv.weight"]),
            "BatchNorm_0": bnp}
        stats[f"EncoderBlock_{i - 1}"] = {"BatchNorm_0": bns}
    ch = c.discrim_channels[-1]
    params["Dense_0"] = {"kernel": _fc_in_chw_to_hwc(
        sd[f"{prefix}fc.0.weight"], ch, c.fc_input_gan, c.fc_input_gan)}
    bnp, bns = _bn(sd, f"{prefix}fc.1")
    params["BatchNorm_0"] = bnp
    stats["BatchNorm_0"] = bns
    params["Dense_1"] = {"kernel": _lin(sd[f"{prefix}fc.3.weight"]),
                         "bias": _np(sd[f"{prefix}fc.3.bias"])}
    return {"params": params, "batch_stats": stats}


def convert_cognitive_encoder(sd: Mapping, cfg: Config, prefix: str = "") -> Dict:
    """Reference ``CognitiveEncoder`` (``vae_gan.py:190-232``) -> group."""
    params: Dict[str, Any] = {
        "fc1": {"kernel": _lin(sd[f"{prefix}fc1.0.weight"])}}
    bnp, bns = _bn(sd, f"{prefix}fc1.1")
    params["BatchNorm_0"] = bnp
    stats = {"BatchNorm_0": bns}
    params["Dense_0"] = {"kernel": _lin(sd[f"{prefix}l_mu.weight"]),
                         "bias": _np(sd[f"{prefix}l_mu.bias"])}
    params["Dense_1"] = {"kernel": _lin(sd[f"{prefix}l_var.weight"]),
                         "bias": _np(sd[f"{prefix}l_var.bias"])}
    return {"params": params, "batch_stats": stats}


def convert_latent_discriminator(sd: Mapping, cfg: Config = None,
                                 prefix: str = "") -> Dict:
    """Reference ``WaeDiscriminator`` (``vae_gan.py:499-529``) -> group.
    (``cfg`` unused; kept for the uniform converter signature.)"""
    del cfg
    params: Dict[str, Any] = {}
    for j, tidx in enumerate((0, 2, 4, 6, 8)):  # Linear indices in `main`
        params[f"Dense_{j}"] = {
            "kernel": _lin(sd[f"{prefix}main.{tidx}.weight"]),
            "bias": _np(sd[f"{prefix}main.{tidx}.bias"])}
    return {"params": params, "batch_stats": {}}


# ---------------------------------------------------------------------------
# Export: this framework's groups -> reference-layout state_dict (the inverse
# of every conversion above), so weights trained here flow back to torch.
# ---------------------------------------------------------------------------


def _inv_lin(k) -> Array:
    return np.asarray(k, np.float32).T


def _inv_conv(k) -> Array:
    return np.asarray(k, np.float32).transpose(3, 2, 0, 1)  # HWIO -> OIHW


def _inv_deconv(k) -> Array:
    k = np.asarray(k, np.float32)
    return np.flip(k, (0, 1)).transpose(2, 3, 0, 1).copy()  # -> [I, O, kh, kw]


def _inv_fc_in(k, c: int, h: int, wd: int) -> Array:
    k = np.asarray(k, np.float32).T  # [out, HWC]
    out = k.shape[0]
    return k.reshape(out, h, wd, c).transpose(0, 3, 1, 2).reshape(out, -1)


def _inv_fc_out(k, c: int, h: int, wd: int) -> Array:
    k = np.asarray(k, np.float32).T  # [HWC, z]
    zin = k.shape[1]
    return k.reshape(h, wd, c, zin).transpose(2, 0, 1, 3).reshape(-1, zin)


def _inv_vec(v, c: int, h: int, wd: int) -> Array:
    return np.asarray(v, np.float32).reshape(h, wd, c).transpose(2, 0, 1).reshape(-1)


def _export_bn(out: Dict, prefix: str, params: Mapping, stats: Mapping,
               perm=None) -> None:
    f = perm or (lambda v: np.asarray(v, np.float32))
    out[f"{prefix}.weight"] = f(params["scale"])
    out[f"{prefix}.bias"] = f(params["bias"])
    out[f"{prefix}.running_mean"] = f(stats["mean"])
    out[f"{prefix}.running_var"] = f(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def export_visual_encoder(group: Mapping, cfg: Config, prefix: str = "") -> Dict:
    c = cfg.model
    p, s = group["params"], group["batch_stats"]
    out: Dict[str, Array] = {}
    for i in range(len(c.encoder_channels)):
        blk = p[f"EncoderBlock_{i}"]
        out[f"{prefix}conv.{i}.conv.weight"] = _inv_conv(blk["kernel"])
        _export_bn(out, f"{prefix}conv.{i}.bn", blk["BatchNorm_0"],
                   s[f"EncoderBlock_{i}"]["BatchNorm_0"])
    ch = c.encoder_channels[-1]
    out[f"{prefix}fc.0.weight"] = _inv_fc_in(p["Dense_0"]["kernel"], ch,
                                             c.fc_input, c.fc_input)
    _export_bn(out, f"{prefix}fc.1", p["BatchNorm_0"], s["BatchNorm_0"])
    out[f"{prefix}l_mu.weight"] = _inv_lin(p["Dense_1"]["kernel"])
    out[f"{prefix}l_mu.bias"] = np.asarray(p["Dense_1"]["bias"], np.float32)
    out[f"{prefix}l_var.weight"] = _inv_lin(p["Dense_2"]["kernel"])
    out[f"{prefix}l_var.bias"] = np.asarray(p["Dense_2"]["bias"], np.float32)
    return out


def export_decoder(group: Mapping, cfg: Config, prefix: str = "") -> Dict:
    c = cfg.model
    size0 = c.encoder_channels[-1]
    p, s = group["params"], group["batch_stats"]
    out: Dict[str, Array] = {
        f"{prefix}fc.0.weight": _inv_fc_out(p["Dense_0"]["kernel"], size0,
                                            c.fc_input, c.fc_input)}
    perm = lambda v: _inv_vec(v, size0, c.fc_input, c.fc_input)
    _export_bn(out, f"{prefix}fc.1", p["BatchNorm_0"], s["BatchNorm_0"], perm)
    for i in range(3):
        blk = p[f"DecoderBlock_{i}"]
        out[f"{prefix}conv.{i}.conv.weight"] = _inv_deconv(blk["kernel"])
        _export_bn(out, f"{prefix}conv.{i}.bn", blk["BatchNorm_0"],
                   s[f"DecoderBlock_{i}"]["BatchNorm_0"])
    out[f"{prefix}conv.3.0.weight"] = _inv_conv(p["out_kernel"])
    out[f"{prefix}conv.3.0.bias"] = np.asarray(p["out_bias"], np.float32)
    return out


def export_image_discriminator(group: Mapping, cfg: Config, prefix: str = "") -> Dict:
    c = cfg.model
    p, s = group["params"], group["batch_stats"]
    out: Dict[str, Array] = {
        f"{prefix}conv.0.0.weight": _inv_conv(p["in_kernel"]),
        f"{prefix}conv.0.0.bias": np.asarray(p["in_bias"], np.float32)}
    for i in range(1, len(c.discrim_channels)):
        blk = p[f"EncoderBlock_{i - 1}"]
        out[f"{prefix}conv.{i}.conv.weight"] = _inv_conv(blk["kernel"])
        _export_bn(out, f"{prefix}conv.{i}.bn", blk["BatchNorm_0"],
                   s[f"EncoderBlock_{i - 1}"]["BatchNorm_0"])
    ch = c.discrim_channels[-1]
    out[f"{prefix}fc.0.weight"] = _inv_fc_in(p["Dense_0"]["kernel"], ch,
                                             c.fc_input_gan, c.fc_input_gan)
    _export_bn(out, f"{prefix}fc.1", p["BatchNorm_0"], s["BatchNorm_0"])
    out[f"{prefix}fc.3.weight"] = _inv_lin(p["Dense_1"]["kernel"])
    out[f"{prefix}fc.3.bias"] = np.asarray(p["Dense_1"]["bias"], np.float32)
    return out


def export_cognitive_encoder(group: Mapping, cfg: Config, prefix: str = "") -> Dict:
    p, s = group["params"], group["batch_stats"]
    out: Dict[str, Array] = {
        f"{prefix}fc1.0.weight": _inv_lin(p["fc1"]["kernel"])}
    _export_bn(out, f"{prefix}fc1.1", p["BatchNorm_0"], s["BatchNorm_0"])
    out[f"{prefix}l_mu.weight"] = _inv_lin(p["Dense_0"]["kernel"])
    out[f"{prefix}l_mu.bias"] = np.asarray(p["Dense_0"]["bias"], np.float32)
    out[f"{prefix}l_var.weight"] = _inv_lin(p["Dense_1"]["kernel"])
    out[f"{prefix}l_var.bias"] = np.asarray(p["Dense_1"]["bias"], np.float32)
    return out


def export_latent_discriminator(group: Mapping, cfg: Config = None,
                                prefix: str = "") -> Dict:
    del cfg
    p = group["params"]
    out: Dict[str, Array] = {}
    for j, tidx in enumerate((0, 2, 4, 6, 8)):
        out[f"{prefix}main.{tidx}.weight"] = _inv_lin(p[f"Dense_{j}"]["kernel"])
        out[f"{prefix}main.{tidx}.bias"] = np.asarray(p[f"Dense_{j}"]["bias"],
                                                      np.float32)
    return out


# One table drives both directions: {kind: {group: (import_fn, export_fn,
# state_dict prefix)}}.  All converters share the (sd|group, cfg, prefix)
# signature.
_KINDS = {
    "vae-gan": {  # VaeGan (vae_gan.py:235-320)
        "encoder": (convert_visual_encoder, export_visual_encoder, "encoder."),
        "decoder": (convert_decoder, export_decoder, "decoder."),
        "discriminator": (convert_image_discriminator,
                          export_image_discriminator, "discriminator."),
    },
    "vae-gan-cognitive": {  # VaeGanCognitive (vae_gan.py:323-432)
        "encoder": (convert_cognitive_encoder, export_cognitive_encoder,
                    "encoder."),
        "decoder": (convert_decoder, export_decoder, "decoder."),
        "discriminator": (convert_image_discriminator,
                          export_image_discriminator, "discriminator."),
    },
    "wae-gan": {  # WaeGan (vae_gan.py:435-496)
        "encoder": (convert_visual_encoder, export_visual_encoder, "encoder."),
        "decoder": (convert_decoder, export_decoder, "decoder."),
        "latent_disc": (convert_latent_discriminator,
                        export_latent_discriminator, "discriminator."),
    },
    "wae-gan-cognitive": {  # WaeGanCognitive (vae_gan.py:532-578)
        "encoder": (convert_cognitive_encoder, export_cognitive_encoder,
                    "encoder."),
        "decoder": (convert_decoder, export_decoder, "decoder."),
        "latent_disc": (convert_latent_discriminator,
                        export_latent_discriminator, "discriminator."),
    },
    "dcgan": {  # DCGan (vae_gan.py:581-622): decoder + discriminator only
        "decoder": (convert_decoder, export_decoder, "decoder."),
        "discriminator": (convert_image_discriminator,
                          export_image_discriminator, "discriminator."),
    },
}


def export_state_dict(groups: Mapping[str, Mapping], cfg: Config,
                      kind: str = "vae-gan") -> Dict[str, Array]:
    """Inverse of :func:`convert_state_dict`: named groups -> a state_dict in
    the reference's layout/naming (numpy values; pass through
    ``torch.save({k: torch.from_numpy(v) ...})`` for a ``.pth``)."""
    try:
        spec = _KINDS[kind]
    except KeyError:
        raise KeyError(f"unknown kind {kind!r}; one of {sorted(_KINDS)}")
    out: Dict[str, Array] = {}
    for group, (_, fn, prefix) in spec.items():
        out.update(fn(groups[group], cfg, prefix=prefix))
    # Stage-2 VaeGanCognitive registers the whole Stage-I teacher as a
    # submodule (vae_gan.py:343); the reference shares the decoder and
    # discriminator objects between student and teacher
    # (train_vgan_stage2.py:229-232), so a strict-loadable stage-2 state_dict
    # carries teacher_net.* copies of them plus the teacher's visual encoder.
    if kind == "vae-gan-cognitive" and "teacher_encoder" in groups:
        out.update(export_visual_encoder(groups["teacher_encoder"], cfg,
                                         prefix="teacher_net.encoder."))
        out.update(export_decoder(groups["decoder"], cfg,
                                  prefix="teacher_net.decoder."))
        out.update(export_image_discriminator(
            groups["discriminator"], cfg, prefix="teacher_net.discriminator."))
    return out


def convert_state_dict(sd: Mapping, cfg: Config, kind: str = "vae-gan") -> Groups:
    """Convert a reference composite's state_dict into named groups
    ({'params': ..., 'batch_stats': ...} per group), ready for
    ``fmri_tpu.train.make_state`` / ``checkpoints.graft_groups``."""
    try:
        spec = _KINDS[kind]
    except KeyError:
        raise KeyError(f"unknown kind {kind!r}; one of {sorted(_KINDS)}")
    out: Groups = {}
    for group, (fn, _, prefix) in spec.items():
        out[group] = fn(sd, cfg, prefix=prefix)
    # VaeGanCognitive registers the Stage-I teacher as a submodule
    # (vae_gan.py:343), so stage-2 state_dicts carry teacher_net.* keys; its
    # visual encoder becomes this framework's `teacher_encoder` group.
    if (kind == "vae-gan-cognitive"
            and any(k.startswith("teacher_net.encoder.") for k in sd)):
        out["teacher_encoder"] = convert_visual_encoder(
            sd, cfg, prefix="teacher_net.encoder.")
    return out


def load_reference_checkpoint(path: str, cfg: Config,
                              kind: str = "vae-gan") -> Groups:
    """Load a reference ``.pth`` (a ``torch.save(model.state_dict())`` file —
    the only save style the reference uses, ``train_vgan_stage1.py:596-598``)
    and convert it.  Whole-module pickles are not supported: unpickling them
    would require the reference's own class definitions."""
    import torch

    # weights_only=True: enforces the plain-state_dict contract (clean error
    # on whole-module pickles) and never unpickles arbitrary objects from an
    # untrusted .pth (the default before torch 2.6 would).
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(sd, cfg, kind=kind)


def main(argv=None) -> int:
    """CLI: convert a reference ``.pth`` into a framework checkpoint dir
    usable by the inference CLI (``--ckpt``) and the stage builders
    (``--prev-ckpt`` / ``--stage1-ckpt``)."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--input", "-i", required=True,
                    help="reference .pth path (or, with --export, a framework "
                         "checkpoint dir)")
    ap.add_argument("--output", "-o", required=True,
                    help="checkpoint dir (or, with --export, a .pth path)")
    ap.add_argument("--kind", default="vae-gan", choices=sorted(_KINDS))
    ap.add_argument("--preset", default="res64")
    ap.add_argument("--epoch", type=int, default=None,
                    help="epoch number to record/select (reference filenames "
                         "carry it as <name>_<epoch>.pth)")
    ap.add_argument("--export", action="store_true",
                    help="reverse direction: framework checkpoint -> .pth")
    ap.add_argument("--num-voxels", type=int, default=None,
                    help="override the preset's fMRI voxel count (the "
                         "reference sizes the CognitiveEncoder from the "
                         "data, train_vgan_stage2.py:182)")
    args = ap.parse_args(argv)

    from fmri_tpu.train.run import _apply_platform_override

    _apply_platform_override()

    from fmri_tpu.configs import get_config

    cfg = get_config(args.preset)
    if args.num_voxels is not None:
        from fmri_tpu.configs.presets import override_num_voxels

        cfg = override_num_voxels(cfg, args.num_voxels)
    if args.export:
        import torch

        from fmri_tpu.checkpoints.store import load_eval_state

        state, _ = load_eval_state(args.input, epoch=args.epoch)
        groups = {name: {"params": state.params[name],
                         "batch_stats": state.batch_stats.get(name, {})}
                  for name in state.params}
        sd = export_state_dict(groups, cfg, kind=args.kind)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, args.output)
        print(args.output)
        return 0

    from fmri_tpu.checkpoints.store import save_checkpoint
    from fmri_tpu.train.state import make_state

    groups = load_reference_checkpoint(args.input, cfg, kind=args.kind)
    state = make_state(groups, {})  # no optimizer state in reference ckpts
    path = save_checkpoint(args.output, args.epoch or 0, state,
                           meta={"imported_from": args.input,
                                 "kind": args.kind, "preset": args.preset})
    print(path)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
