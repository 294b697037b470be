from pcdms_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, zero1_shardings,
    shard_batch,
)
