from .sharding import (  # noqa: F401
    batch_sharded,
    distributed_init,
    host_local_batch,
    make_mesh,
    make_sharded_eval,
    make_sharded_selfplay,
    make_sharded_train_step,
    put_replicated,
    replicated,
)
