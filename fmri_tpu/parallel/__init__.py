from fmri_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, batch_sharding, cognitive_param_specs,
    decoder_param_specs, initialize_multihost, make_mesh, replicated,
    shard_batch, shard_batch_multihost, shard_params, shard_state,
)
