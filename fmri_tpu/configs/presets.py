"""Typed configuration tree for the TPU-native fMRI-reconstruction framework.

Replaces the reference's plain-Python constant modules
(``configs/models_config.py``, ``configs/gan_config.py``, ``configs/wae_config.py``,
``configs/data_config.py``, ``configs/inference_config.py``) with frozen dataclasses
and named presets.  The reference selects alternative resolutions by
commenting/uncommenting blocks (``configs/models_config.py:12-31``) and suffers from
duplicated keys where the last assignment wins (``models_config.py:9`` vs ``:21``);
here every preset is explicit and immutable.

Presets:
  * ``RES64``  — image_size=64,  latent_dim=128 (``models_config.py:24-31``)
  * ``RES100`` — image_size=100, latent_dim=512 (``models_config.py:13-21``, paper setting)
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference ``configs/models_config.py``)."""

    image_size: int = 64
    latent_dim: int = 128
    # Conv geometry shared by encoder blocks / decoder blocks (models_config.py:3-5).
    kernel_size: int = 5
    stride: int = 2
    padding: int = 2
    # Channel progressions (models_config.py:8-10,21).
    encoder_channels: Sequence[int] = (64, 128, 256)
    decoder_channels: Sequence[int] = (256, 128, 64, 3)
    discrim_channels: Sequence[int] = (32, 128, 256, 256)
    # Fully-connected geometry (models_config.py:14-19,25-30).
    fc_input: int = 8          # spatial size entering/leaving the FC bottleneck
    fc_output: int = 1024
    fc_input_gan: int = 8
    fc_output_gan: int = 512
    stride_gan: int = 1        # stride of the discriminator's first conv layer
    # ``output_padding`` pattern for the three transposed-conv decoder blocks
    # (models_config.py:20,31): True -> output_padding=1 (exact doubling).
    output_pad_dec: Sequence[bool] = (True, True, True)
    # Discriminator feature-matching tap index (gan_config.py:30 recon_level).
    recon_level: int = 3
    # Cognitive encoder input width: BOLD5000 padded-ROI voxel count
    # (data_config.py:72).
    num_voxels: int = 3620
    cog_hidden: int = 1024     # CognitiveEncoder fc1 width (vae_gan.py:199)
    wae_disc_hidden: int = 512  # WaeDiscriminator hidden width (vae_gan.py:505)
    # MXU compute precision: None/'float32' (reference parity) or 'bfloat16'
    # (TPU fast path: bf16 conv/matmul operands, fp32 accumulation, fp32
    # params/BatchNorm).  No reference counterpart — PyTorch 1.4 trains fp32.
    compute_dtype: str | None = None
    # Decode the reconstruction and the prior sample in ONE 2B decoder call
    # instead of two sequential B calls.  Semantic delta vs the reference:
    # the decoder's BatchNorm computes batch statistics over the combined 2B
    # batch and its EMA ticks once per step instead of twice (the reference
    # decodes sequentially via vae_gan.py:277-281).  Measured on v5e: the
    # isolated decoder forward is ~20% faster fused, but the END-TO-END step
    # is ~7% slower (worse backward scheduling), so this stays off; kept as a
    # documented, equivalence-tested experiment.
    fused_decoder_batch: bool = False
    # Route conv/deconv weight grads through the Pallas tap-matmul kernels
    # (fmri_tpu/ops/pallas_dw.py) instead of XLA's transpose-heavy
    # conv-weight-grad lowering; forward and input grads unchanged.  Gradient
    # equivalence: tests/test_pallas_dw.py, tests/test_steps.py.
    pallas_backward: bool = False
    # Swap in the fmri_tpu/ops/conv_alt.py algebraic backward rewrites where
    # they apply (subpixel-phase dX for stride-2 convs, patches dW for the
    # small-Co output conv) — the per-op weak spots of XLA's stock conv
    # backward (docs/design.md §8b).  Gradient equivalence:
    # tests/test_conv_alt.py.
    alt_backward: bool = False
    # Train-mode BatchNorm backward through the Pallas fused two-pass kernels
    # (fmri_tpu/ops/pallas_bn.py) instead of XLA's reduce fusions.
    # Single-device only (see fmri_tpu/models/norm.py); equivalence:
    # tests/test_pallas_bn.py, tests/test_conv_alt.py step test.
    pallas_bn: bool = False

    @property
    def fc_flat(self) -> int:
        return self.fc_input * self.fc_input * self.encoder_channels[-1]


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input-pipeline parameters (reference ``configs/gan_config.py:26-28,78-80``)."""

    image_crop: int = 375
    image_size: int = 64
    mean: Sequence[float] = (0.5, 0.5, 0.5)
    std: Sequence[float] = (0.5, 0.5, 0.5)
    max_shift: int = 5          # RandomShift amplitude (data_loader.py:187-217)
    num_voxels: int = 3620
    split_seed: int = 12345     # train/valid split seed (data_loader.py:495)
    data_split: float = 0.2


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer hyper-parameters (reference ``configs/gan_config.py`` /
    ``configs/wae_config.py``)."""

    batch_size: int = 64
    learning_rate: float = 1e-4
    n_epochs: int = 200
    # RMSprop family (train_vgan_stage1.py:275-283).
    rms_decay: float = 0.9
    rms_eps: float = 1e-8
    decay_lr: float = 0.98          # ExponentialLR gamma per epoch
    # Adam family for WAE (train_wae_stage1.py:221-224).
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    step_size: int = 30             # StepLR period in epochs (wae_config.py:22)
    step_gamma: float = 0.5         # StepLR gamma (wae_config.py:23 decay_lr)
    # Equilibrium/margin adaptive game (gan_config.py:36-40).
    margin: float = 0.35
    equilibrium: float = 0.68
    decay_margin: float = 1.0
    decay_equilibrium: float = 1.0
    lambda_mse: float = 1e-6
    decay_mse: float = 1.0
    beta: float = 1.0               # beta-VAE weight (gan_config.py:41)
    wae_lambda: float = 10.0        # WAE adversarial penalty weight (train_wae_stage1.py:281)
    wae_vgan_lam: float = 1.0       # WAE/Dual-GAN latent-D weight: --lam default (wae_vgan_stage1.py:87)
    wae_sigma: float = 0.5          # WAE prior scale N(0, 0.5^2) (train_wae_stage1.py:276)
    grad_clip: float | None = None  # elementwise grad clamp; stages II/III use 1.0
    seed: int = 8                   # numpy/torch seed parity (train_vgan_stage1.py:27-29)
    ckpt_every: int = 5             # checkpoint cadence (train_vgan_stage1.py:596)
    eval_every: int = 1
    patience: int = 0               # early stopping; 0 disables (gan_config.py:15)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


def _res64() -> Config:
    return Config(
        model=ModelConfig(
            image_size=64, latent_dim=128, fc_input=8, fc_output=1024,
            fc_input_gan=8, fc_output_gan=512, stride_gan=1,
            output_pad_dec=(True, True, True),
        ),
        data=DataConfig(image_size=64),
        train=TrainConfig(batch_size=64, n_epochs=200),
    )


def _res100() -> Config:
    return Config(
        model=ModelConfig(
            image_size=100, latent_dim=512, fc_input=13, fc_output=1024,
            fc_input_gan=7, fc_output_gan=256, stride_gan=2,
            output_pad_dec=(False, True, True),
        ),
        data=DataConfig(image_size=100),
        train=TrainConfig(batch_size=100, n_epochs=400),
    )


def _tiny() -> Config:
    """Small config for tests/smoke runs (16px; the toy-dataset analogue of the
    reference's MNIST smoke path, ``train_vgan_stage1.py:198-221``)."""
    return Config(
        model=ModelConfig(
            image_size=16, latent_dim=16, fc_input=2, fc_output=32,
            fc_input_gan=2, fc_output_gan=32, stride_gan=1,
            encoder_channels=(8, 16, 16), decoder_channels=(16, 8, 8, 3),
            discrim_channels=(8, 16, 16, 16),
            output_pad_dec=(True, True, True),
            num_voxels=128, cog_hidden=32, wae_disc_hidden=32,
        ),
        data=DataConfig(image_size=16, image_crop=20, num_voxels=128),
        train=TrainConfig(batch_size=8, n_epochs=2),
    )


def override_num_voxels(cfg: Config, n: int) -> Config:
    """Apply a measured voxel count to both the model and data configs.

    The reference sizes the CognitiveEncoder from the data, not a config
    constant (``train_vgan_stage2.py:182``); this is the equivalent for
    CLI-driven runs whose masks/ROIs produce a count no preset names
    (the ``--num-voxels`` flag on train/inference/serve)."""
    if n < 1:
        raise ValueError(f"num_voxels must be >= 1, got {n}")
    return cfg.replace(
        model=dataclasses.replace(cfg.model, num_voxels=n),
        data=dataclasses.replace(cfg.data, num_voxels=n),
    )


def _fullbrain() -> Config:
    """res64 model over a whole-brain voxel vector instead of the padded
    3,620-voxel ROI concatenation (the reference's production input,
    ``data_config.py:62-72``).  98,304 voxels is a gray-matter-scale count
    (BOLD5000 volumes are 69x106x106); it is divisible by every power-of-two
    mesh model axis up to 32, so the CognitiveEncoder's fc1 kernel
    [voxels -> hidden] shards cleanly under voxel tensor parallelism
    (``fmri_tpu.parallel.mesh.cognitive_param_specs`` — the SURVEY §5.7
    scaling axis).  fc1 is ~100M params (402 MB fp32): comfortable on one
    v5e, and the TP path exists for configs beyond a single chip's HBM."""
    return override_num_voxels(_res64(), 98304)


def _with_bf16(cfg: Config) -> Config:
    return Config(model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
                  data=cfg.data, train=cfg.train)


RES64: Config = _res64()
RES100: Config = _res100()
TINY: Config = _tiny()
FULLBRAIN: Config = _fullbrain()
RES64_BF16: Config = _with_bf16(RES64)
RES100_BF16: Config = _with_bf16(RES100)
FULLBRAIN_BF16: Config = _with_bf16(FULLBRAIN)

PRESETS = {"res64": RES64, "res100": RES100, "tiny": TINY,
           "res64-bf16": RES64_BF16, "res100-bf16": RES100_BF16,
           "fullbrain": FULLBRAIN, "fullbrain-bf16": FULLBRAIN_BF16}


def get_config(name: str = "res64") -> Config:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
