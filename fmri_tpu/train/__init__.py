from fmri_tpu.train.optim import Adam, RmsProp, exponential_lr, step_lr  # noqa: F401
from fmri_tpu.train.state import (  # noqa: F401
    TrainState, init_cognitive, init_latent_disc, init_vaegan, make_state,
)
from fmri_tpu.train.steps_vgan import (  # noqa: F401
    StepFns, make_vgan_cognitive_step, make_vgan_stage1_step,
)
from fmri_tpu.train.steps_wae import (  # noqa: F401
    make_wae_cognitive_step, make_wae_stage1_step, make_wae_vgan_step,
)
from fmri_tpu.train.trainer import (  # noqa: F401
    EarlyStopping, GameSchedules, Trainer,
)
from fmri_tpu.train.stages import BUILDERS  # noqa: F401
