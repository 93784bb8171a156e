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
from .pipeline import (  # noqa: F401
    pipeline_blocks,
    pipelined_lisa_forward,
    pipelined_llm_forward,
    stack_layer_params,
    unstack_layer_params,
)
