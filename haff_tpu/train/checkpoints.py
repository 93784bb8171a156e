"""Orbax checkpointing with auto-resume.

Capability parity with reference train_ds.py:396-412 (auto-resume from
log_dir/ckpt_model, epoch recovered from the step counter) and
train_ds.py:470-486 (save-on-best-IoU, replacing the previous
checkpoint). Orbax writes sharded arrays natively — the multi-host
gather DeepSpeed needs is unnecessary."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 1) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    metrics: Optional[dict] = None,
                    max_to_keep: int = 1) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state),
             metrics=metrics or {})
    mgr.wait_until_finished()
    mgr.close()


class CheckpointWriter:
    """Async checkpoint writer for the training loop: `save` returns as
    soon as the on-device arrays are snapshotted to host, and orbax's
    background thread overlaps serialization/IO with the next epoch's
    training (the TPU never idles on checkpoint writes — the analog of
    DeepSpeed's non-blocking save the reference lacks). Call `finish`
    before exiting or before handing the directory to a synchronous
    writer (e.g. the preemption path)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True))

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> None:
        # orbax serializes concurrent saves internally (a new save waits
        # for the in-flight one before snapshotting).
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})

    def finish(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self) -> "CheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.finish()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_params(ckpt_dir: str, target_params: Any) -> Any:
    """Restore a bare params tree written by tools/convert_cli
    (StandardCheckpointer layout — a single checkpoint dir, no
    CheckpointManager step subdirectories)."""
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(ckpt_dir), target_params)
    finally:
        ckptr.close()


def restore_params_host(ckpt_dir: str, shapes: Any) -> Any:
    """Restore a bare-params checkpoint to HOST numpy arrays from an
    abstract (jax.eval_shape) tree — no device memory is touched.

    This is the flagship quantized-serving load path: restoring a 7B/13B
    float tree to the device first (restore_params) busts a 16 GB chip
    before quantize_dense_tree ever runs; host RAM holds the floats, the
    quantizer then places only int8/int4 kernels + small scales on
    device. Reference analog: bnb's device_map/4-bit load keeps master
    weights off-GPU (inference.py:133-156)."""
    from flax.core import meta as flax_meta

    shapes = flax_meta.unbox(shapes)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), shapes)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        return ckptr.restore(
            os.path.abspath(ckpt_dir),
            args=ocp.args.PyTreeRestore(item=shapes,
                                        restore_args=restore_args))
    finally:
        ckptr.close()


def restore_checkpoint(ckpt_dir: str, target: Any) -> Tuple[Any, Optional[int]]:
    """Auto-resume: restore the latest checkpoint into `target`'s
    structure; returns (state, step) or (target, None) if none exists.

    Accepts BOTH layouts: a CheckpointManager root (train-state
    checkpoints with step dirs) and a converted bare-params dir from
    tools/convert_cli — for the latter, `target` must be the model
    variables dict ({"params": ...}); the params subtree is grafted and
    step 0 is reported."""
    step = latest_step(ckpt_dir)
    if step is None:
        if (isinstance(target, dict) and set(target) == {"params"}
                and os.path.isdir(ckpt_dir)
                and os.path.exists(os.path.join(ckpt_dir,
                                                "_CHECKPOINT_METADATA"))):
            from flax.core import meta as flax_meta

            bare = flax_meta.unbox(target["params"])
            return {"params": restore_params(ckpt_dir, bare)}, 0
        return target, None
    mgr = _manager(ckpt_dir)
    state = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return state, step
