from fmri_tpu.checkpoints.store import (  # noqa: F401
    AsyncCheckpointWriter, checkpoint_meta, graft_groups, latest_epoch,
    list_checkpoints, load_groups, prune_checkpoints, restore_checkpoint,
    save_checkpoint,
)
from fmri_tpu.checkpoints.torch_import import (  # noqa: F401
    convert_state_dict, load_reference_checkpoint,
)
