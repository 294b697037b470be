from pcdms_tpu.parallel.mesh import (
    make_mesh, make_hybrid_mesh, batch_sharding, replicated_sharding,
    zero1_shardings, shard_batch,
)
