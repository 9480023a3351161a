from ubresnet_tpu.parallel.sharding import (  # noqa: F401
    make_param_shardings,
    plane_sharding,
    shard_state,
    shard_batch,
    spatial_sharding,
)
