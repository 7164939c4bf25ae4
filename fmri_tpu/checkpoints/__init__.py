from fmri_tpu.checkpoints.store import (  # noqa: F401
    graft_groups, latest_epoch, list_checkpoints, load_groups,
    restore_checkpoint, save_checkpoint,
)
