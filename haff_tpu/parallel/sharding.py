"""GSPMD sharding rules — the TPU-native replacement for DeepSpeed ZeRO-2
+ NCCL (reference: train_ds.py:344-393, SURVEY.md sections 2.6-2.7).

Parameters are annotated with logical axis names at module definition
(nn/llama.py); here those names map onto the physical mesh axes:

  * `tensor` — megatron-style TP: attention heads + MLP columns over ICI.
  * `fsdp`   — parameter/optimizer-state sharding (the ZeRO analog —
    GSPMD inserts the reduce-scatter/all-gather DeepSpeed hand-codes).
  * `data`   — pure data parallelism; batch shards over (data, fsdp).

XLA emits the collectives; nothing here speaks NCCL.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, EXPERT_AXIS, FSDP_AXIS, TENSOR_AXIS
from ..nn.llama import EMBED, HEADS, KV_HEADS, MLP, VOCAB

# logical name -> mesh axis (None = replicated)
LOGICAL_RULES = (
    ("batch", (DATA_AXIS, FSDP_AXIS)),
    (VOCAB, TENSOR_AXIS),
    (EMBED, FSDP_AXIS),
    (HEADS, TENSOR_AXIS),
    (KV_HEADS, TENSOR_AXIS),
    (MLP, TENSOR_AXIS),
    ("experts", EXPERT_AXIS),  # stacked MoE expert weights (nn/moe.py)
    ("head_dim", None),
)


def param_shardings(mesh: Mesh, abstract_params) -> Any:
    """PartitionSpec tree for a param tree that may contain
    nn.Partitioned metadata (from nn.with_logical_partitioning).
    Unannotated leaves are replicated."""
    specs = nn.get_partition_spec(abstract_params)

    def to_sharding(spec):
        if isinstance(spec, P):
            phys = nn.logical_to_mesh_axes(spec, rules=LOGICAL_RULES)
            return NamedSharding(mesh, phys)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(
        to_sharding, specs,
        is_leaf=lambda x: isinstance(x, P) or x is None)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(mesh: Mesh, batch) -> Any:
    """Shard every array in a batch pytree along its leading (batch)
    axis over (data, fsdp); arrays whose leading dim does not divide the
    batch shards (e.g. a unique-image table smaller than the
    conversation batch) are replicated.

    Replication is only a legitimate fallback for arrays SMALLER than
    the shard count (the unique-image table case). A leading dim >=
    n_shards that does not divide evenly means a mis-sized batch — a
    silent fully-replicated "sharded" run — so that is an error.
    """
    n_shards = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        ndim = getattr(x, "ndim", 0)
        if ndim >= 1 and x.shape[0] % n_shards == 0:
            return jax.device_put(x, bs)
        if ndim >= 1 and x.shape[0] >= n_shards:
            raise ValueError(
                f"batch leading dim {x.shape[0]} does not divide "
                f"{n_shards} batch shards (mesh data*fsdp); pad the "
                f"batch or adjust the mesh instead of silently "
                f"replicating")
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, batch)
