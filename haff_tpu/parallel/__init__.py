from .sharding import (  # noqa: F401
    LOGICAL_RULES,
    batch_sharding,
    param_shardings,
    shard_batch_tree,
)
from .ring_attention import (  # noqa: F401
    ring_attention,
    sequence_sharded_attention,
)
