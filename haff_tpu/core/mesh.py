"""Device-mesh construction and sharding helpers.

The reference's distributed runtime is DeepSpeed ZeRO-2 over NCCL
(reference: 2Haff/train_ds.py:344-393). The TPU-native replacement is a
`jax.sharding.Mesh` with axes

    data   — batch / gradient sharding (ZeRO analog: optimizer state is
             sharded over this axis via NamedSharding rules)
    pipe   — pipeline parallelism over decoder layers (GPipe schedule,
             parallel/pipeline.py; stage hand-offs are point-to-point
             ppermutes, so this axis tolerates the slowest links and
             sits right after `data` in the device order)
    fsdp   — parameter sharding (fully-sharded data parallel)
    expert — MoE expert parallelism (nn/moe.py; dispatch/combine
             all-to-alls ride ICI between this axis and the batch axes)
    sp     — sequence parallelism (ring attention)
    tensor — tensor parallelism over attention heads / MLP columns (ICI)

GSPMD inserts the reduce-scatter/all-gather collectives that DeepSpeed
implements by hand.
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
FSDP_AXIS = "fsdp"
EXPERT_AXIS = "expert"
SP_AXIS = "sp"
TENSOR_AXIS = "tensor"
AXES = (DATA_AXIS, PIPE_AXIS, FSDP_AXIS, EXPERT_AXIS, SP_AXIS, TENSOR_AXIS)


def build_mesh(cfg: MeshConfig = MeshConfig(),
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 6-axis mesh, filling the `data` axis with leftover devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    pipe = max(1, getattr(cfg, "pp", 1))
    fsdp = max(1, cfg.fsdp)
    ep = max(1, getattr(cfg, "ep", 1))
    sp = max(1, getattr(cfg, "sp", 1))
    tensor = max(1, cfg.tensor)
    model = pipe * fsdp * ep * sp * tensor
    if cfg.data == -1:
        if n % model != 0:
            raise ValueError(
                f"{n} devices not divisible by pp*fsdp*ep*sp*tensor={model}")
        data = n // model
    else:
        data = cfg.data
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{pipe}x{fsdp}x{ep}x{sp}x{tensor} != {n} devices")
    arr = np.array(devices).reshape(data, pipe, fsdp, ep, sp, tensor)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1, 1, 1, 1), AXES)


_MESH_STACK: list[Mesh] = []


@contextmanager
def use_mesh(mesh: Mesh):
    _MESH_STACK.append(mesh)
    try:
        with mesh:
            yield mesh
    finally:
        _MESH_STACK.pop()


def current_mesh() -> Optional[Mesh]:
    return _MESH_STACK[-1] if _MESH_STACK else None


def ambient_mesh() -> Optional[Mesh]:
    """The mesh in effect at trace time: the use_mesh() stack first, then
    the `with mesh:` context (thread resources). Lets modules (e.g.
    sequence-parallel attention) discover the mesh without plumbing it
    through every call signature."""
    m = current_mesh()
    if m is not None:
        return m
    try:
        from jax._src.mesh import thread_resources

        pm = thread_resources.env.physical_mesh
        if pm is not None and not getattr(pm, "empty", True):
            return pm
    except Exception:
        return None
    return None


def shard(x, mesh: Mesh, spec: P):
    """Place an array on the mesh with the given PartitionSpec."""
    return jax.device_put(x, NamedSharding(mesh, spec))


def batch_spec() -> P:
    """Batch dims shard over (data, fsdp) jointly; model dims replicated."""
    return P((DATA_AXIS, FSDP_AXIS))


def replicated() -> P:
    return P()


def is_multihost() -> bool:
    return jax.process_count() > 1


def maybe_initialize_distributed() -> None:
    """Multi-host init (reference analog: the deepspeed/NCCL launcher,
    2Haff/temp_log.txt:3-22). On TPU pods jax.distributed picks up the
    coordinator from the environment; single-process runs are a no-op."""
    if jax.process_count() > 1:
        return
    # jax.distributed.initialize() is only needed under a multi-process
    # launcher; detect via env without importing anything heavy.
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
