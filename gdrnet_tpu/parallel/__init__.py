from gdrnet_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    param_partition_spec,
    constrain_params,
    local_dp_setup,
)

__all__ = ["make_mesh", "replicated_sharding", "batch_sharding",
           "shard_batch", "param_partition_spec", "constrain_params",
           "local_dp_setup"]
