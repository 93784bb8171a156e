"""Mixture-of-Experts decoder MLP with expert parallelism.

Beyond-parity capability: the reference stack (2Haff/model/llava —
dense LLaMA/MPT decoders only) has no MoE, but a production TPU
framework needs one, and the driver's multi-chip contract asks for an
`ep` sharding demonstration alongside dp/fsdp/tp/sp/pp.

TPU-first design — the GShard/Switch static-shape formulation, which is
the canonical MoE on XLA (everything is one-hot einsums the MXU eats;
no dynamic shapes, no sorting):

  * router logits -> fp32 softmax -> iterative top-k (k is a static
    Python int, so the "loop" unrolls into k argmaxes);
  * fixed expert capacity C = ceil(k * tokens / E * capacity_factor);
    slot assignment is a k-major cumsum (all first choices beat all
    second choices), overflowed tokens fall through to the residual
    connection untouched;
  * dispatch/combine are (tokens, E, C) one-hot einsums; expert FFNs are
    E-stacked SwiGLU weights contracted in one batched einsum, so the
    per-expert matmuls tile onto the MXU as a single (E, C, d) x
    (E, d, f) contraction;
  * expert parallelism: the stacked expert weights carry the "experts"
    logical axis (-> the mesh's `expert` axis, parallel/sharding.py);
    activations are constrained expert-sharded between dispatch and
    combine, and GSPMD inserts the all-to-alls over ICI;
  * Switch load-balance aux loss (E * sum_e f_e * P_e) is sown into the
    "moe_aux" collection — a plain `apply` ignores it (sow is a no-op
    when the collection is immutable), the train step fetches it with
    `mutable=("moe_aux",)` (train/trainer.py).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig

# Logical axis carried by stacked expert weights; parallel/sharding.py
# maps it onto the physical `expert` mesh axis.
EXPERTS = "experts"


def _expert_constraint(x):
    """Hint GSPMD to keep the leading (expert) dim of an activation on
    the mesh's `expert` axis when one is ambient; no-op otherwise."""
    from ..core.mesh import EXPERT_AXIS, ambient_mesh

    mesh = ambient_mesh()
    if mesh is None or mesh.shape.get(EXPERT_AXIS, 1) <= 1:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(EXPERT_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


class MoEMLP(nn.Module):
    """Drop-in replacement for LlamaMLP (same (B, L, d) -> (B, L, d)
    contract) routing each token to top-k of E SwiGLU experts.

    `no_drop=True` sets capacity = n so no token ever overflows: used
    by the decode paths (nn/llama.py passes it when attending over a KV
    cache), where n is tiny (B or B*draft_len) and dropping would make
    a token's output depend on which OTHER tokens shared its forward —
    stepwise decode, speculative chunk verify, and the full forward
    must all route each token identically for exact-generation
    guarantees (tests/test_speculative.py)."""

    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    no_drop: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        E = cfg.moe_num_experts
        K = min(cfg.moe_top_k, E)
        b, l, d = x.shape
        n = b * l
        f = cfg.intermediate_size
        xt = x.reshape(n, d)

        from .layers import QDense

        # Router (no bias, like Switch); softmax in fp32 for stability.
        logits = QDense(E, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_axes=("embed", EXPERTS),
                        name="router")(xt)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        # Iterative top-k (K static -> unrolled): gates flow gradients
        # back into the router through the max.
        gates, onehots = [], []
        masked = probs
        for _ in range(K):
            g = jnp.max(masked, axis=-1)
            oh = jax.nn.one_hot(jnp.argmax(masked, axis=-1), E,
                                dtype=jnp.float32)
            gates.append(g)
            onehots.append(oh)
            masked = masked * (1.0 - oh)
        gates = jnp.stack(gates, axis=0)          # (K, n)
        onehot = jnp.stack(onehots, axis=0)       # (K, n, E)
        if K > 1:
            gates = gates / (jnp.sum(gates, axis=0, keepdims=True) + 1e-9)

        if self.no_drop:
            capacity = n
        else:
            capacity = max(1, math.ceil(K * n / E
                                        * cfg.moe_capacity_factor))

        # k-major slot assignment: flatten (K, n) so every first choice
        # outranks every second choice (GShard priority), then the
        # per-expert running count is the capacity slot.
        flat = onehot.reshape(K * n, E)
        pos = (jnp.cumsum(flat, axis=0) - flat).reshape(K, n, E)
        slot = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # (K, n)
        kept = jnp.sum((pos < capacity) * onehot, axis=-1)  # (K, n) 0/1
        slot_oh = jax.nn.one_hot(slot, capacity,
                                 dtype=jnp.float32) * kept[..., None]

        dispatch = jnp.einsum("kne,knc->nec", onehot, slot_oh)
        combine = jnp.einsum("kne,knc,kn->nec", onehot, slot_oh, gates)

        xin = jnp.einsum("nec,nd->ecd", dispatch.astype(x.dtype), xt)
        xin = _expert_constraint(xin)

        init = nn.initializers.lecun_normal(batch_axis=(0,))
        wg = self.param(
            "gate_proj",
            nn.with_logical_partitioning(init, (EXPERTS, "embed", "mlp")),
            (E, d, f), self.param_dtype)
        wu = self.param(
            "up_proj",
            nn.with_logical_partitioning(init, (EXPERTS, "embed", "mlp")),
            (E, d, f), self.param_dtype)
        wd = self.param(
            "down_proj",
            nn.with_logical_partitioning(init, (EXPERTS, "mlp", "embed")),
            (E, f, d), self.param_dtype)

        def cast(w):
            return w.astype(self.dtype)

        h = nn.silu(jnp.einsum("ecd,edf->ecf", xin, cast(wg))) \
            * jnp.einsum("ecd,edf->ecf", xin, cast(wu))
        ye = jnp.einsum("ecf,efd->ecd", h, cast(wd))
        ye = _expert_constraint(ye)

        y = jnp.einsum("nec,ecd->nd", combine.astype(x.dtype), ye)

        # Switch load-balance loss: E * sum_e f_e * P_e where f_e is the
        # top-1 assignment fraction and P_e the mean router prob; == 1.0
        # at perfect balance. Sown (no-op unless "moe_aux" is mutable).
        f_e = jnp.mean(onehot[0], axis=0)
        p_e = jnp.mean(probs, axis=0)
        self.sow("moe_aux", "load_balance",
                 E * jnp.sum(f_e * p_e))

        return y.reshape(b, l, d).astype(x.dtype)
