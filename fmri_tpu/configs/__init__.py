from fmri_tpu.configs.presets import (  # noqa: F401
    Config, DataConfig, ModelConfig, TrainConfig, PRESETS, RES64, RES100, TINY,
    get_config,
)
