from windtpu.core.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from windtpu.parallel.distributed import initialize_distributed  # noqa: F401
from windtpu.parallel.shard_step import make_sharded_train_step  # noqa: F401
