from .sharding import (  # noqa: F401
    LOGICAL_RULES,
    batch_sharding,
    param_shardings,
    shard_batch_tree,
)
