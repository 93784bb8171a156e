"""Merge LoRA adapters into base weights and export.

Capability parity with reference merge_lora_weights_and_save_hf_model.py:
fold q/v LoRA deltas into the base kernels (W += (alpha/r) * A @ B),
drop the adapter params and the (frozen, separately-loadable) vision
tower, and save a deployable checkpoint (orbax; plus an npz export for
interop).
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util


def merge_lora_params(params: Dict, alpha: float = 16.0) -> Dict:
    """Fold every {q,v}_proj/{lora_a,lora_b} pair into its sibling
    base/kernel; returns a tree with no lora params left."""
    flat = dict(traverse_util.flatten_dict(params))
    out = dict(flat)
    merged = 0
    for k in list(flat):
        if k[-1] != "lora_a":
            continue
        scope = k[:-1]
        a = np.asarray(flat[k])
        b = np.asarray(flat[scope + ("lora_b",)])
        base_key = scope + ("base", "kernel")
        rank = a.shape[1]
        out[base_key] = np.asarray(flat[base_key]) + (
            alpha / rank) * (a @ b)
        del out[scope + ("lora_a",)]
        del out[scope + ("lora_b",)]
        merged += 1
    print(f"merged {merged} LoRA adapter pairs")
    return traverse_util.unflatten_dict(out)


def strip_vision_tower(params: Dict) -> Dict:
    """Drop vision_tower.* like the reference export (the CLIP tower is
    re-loaded from its own pretrained checkpoint at serve time)."""
    return {k: v for k, v in params.items() if k != "vision_tower"}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax train-state checkpoint dir (holds the "
                        "TRAINABLE partition: LoRA adapters, heads, "
                        "mask decoders)")
    p.add_argument("--base_params", default=None,
                   help="full params dir from tools/convert_cli (the "
                        "frozen base the adapters trained against); "
                        "required for train-state checkpoints - the "
                        "trainable partition alone has no base kernels "
                        "to fold into")
    p.add_argument("--out", required=True)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--keep_vision_tower", action="store_true")
    p.add_argument("--npz", action="store_true",
                   help="also write a flat .npz export")
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(args.checkpoint)
    step = mgr.latest_step()
    if step is not None:
        state = mgr.restore(step)
        mgr.close()
    else:
        # a bare full-params dir (convert_cli layout) also works
        mgr.close()
        ckptr0 = ocp.StandardCheckpointer()
        state = ckptr0.restore(args.checkpoint)
        ckptr0.close()
    params = state["trainable"] if "trainable" in state else state
    if args.base_params:
        # Reference flow (merge_lora_weights_and_save_hf_model.py):
        # rebuild the FULL model then overlay the trained state. Here:
        # trainable tree overlaid onto the converted base params.
        ckptr0 = ocp.StandardCheckpointer()
        base = ckptr0.restore(args.base_params)
        ckptr0.close()
        flat = dict(traverse_util.flatten_dict(base))
        flat.update(traverse_util.flatten_dict(params))
        params = traverse_util.unflatten_dict(flat)
    else:
        flat = traverse_util.flatten_dict(params)
        has_base = any(k[-2:] == ("base", "kernel") for k in flat)
        has_lora = any(k[-1] == "lora_a" for k in flat)
        if has_lora and not has_base:
            raise SystemExit(
                "--checkpoint holds only the trainable partition "
                "(adapters without base kernels); pass --base_params "
                "with the converted full-model params")
    params = merge_lora_params(params, alpha=args.lora_alpha)
    if not args.keep_vision_tower:
        params = strip_vision_tower(params)

    import orbax.checkpoint as ocp2

    ckptr = ocp2.StandardCheckpointer()
    ckptr.save(args.out, params)
    ckptr.wait_until_finished()
    if args.npz:
        flat = {"/".join(k): np.asarray(v) for k, v in
                traverse_util.flatten_dict(params).items()}
        np.savez(args.out.rstrip("/") + ".npz", **flat)
    print(f"saved merged params to {args.out}")


if __name__ == "__main__":
    main()
