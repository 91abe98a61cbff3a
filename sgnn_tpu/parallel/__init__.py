from sgnn_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from sgnn_tpu.parallel.data_parallel import shard_batch, make_dp_train_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "make_dp_train_step",
]
