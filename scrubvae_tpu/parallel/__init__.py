from scrubvae_tpu.parallel.mesh import (  # noqa: F401
    TP_RULES,
    data_axis_size,
    data_sharding,
    make_mesh,
    param_specs,
    place_state,
    replicate,
    shard_batch,
    tp_mask,
)
