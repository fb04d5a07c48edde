from recommend_tpu.parallel.mesh import make_mesh, multihost_init
from recommend_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    shard_batch,
    shard_params,
)
