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


def _expert_constraint(x, axis: int = 0):
    """Hint GSPMD to keep dim `axis` (the expert dim) of an activation
    on the mesh's `expert` axis when one is ambient; no-op otherwise."""
    from ..core.mesh import EXPERT_AXIS, ambient_mesh

    mesh = ambient_mesh()
    if mesh is None or mesh.shape.get(EXPERT_AXIS, 1) <= 1:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    dims = [None] * x.ndim
    dims[axis] = EXPERT_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*dims)))


class MoEMLP(nn.Module):
    """Drop-in replacement for LlamaMLP (same (B, L, d) -> (B, L, d)
    contract) routing each token to top-k of E SwiGLU experts.

    Two routing modes:

      * training / plain forward (`no_drop=False`): GShard global
        routing — one capacity pool over all b*l tokens, k-major cumsum
        priority, overflowed tokens fall through to the residual.
        `token_mask` (b, l) excludes padding: masked tokens claim no
        capacity, produce zero output, and are excluded from the aux
        loss statistics.
      * decode / serving (`no_drop=True`, set by nn/llama.py whenever a
        KV cache is present): PER-ROW routing with capacity = l, which
        can never overflow (a token takes at most one slot per expert).
        A token's expert assignment then depends only on itself — not
        on co-batched requests or on how many draft tokens share the
        verify forward — which is required both for deterministic
        serving and for the speculative-decoding exactness contract
        (stepwise decode == chunked verify, tests/test_speculative.py).
    """

    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    no_drop: bool = False

    @nn.compact
    def __call__(self, x, token_mask=None):
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

        live = None
        if token_mask is not None:
            live = token_mask.reshape(n).astype(jnp.float32)
            onehot = onehot * live[None, :, None]  # padding takes no slot

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

        if self.no_drop:
            # Per-row routing: each row gets its own slot pool (cumsum
            # along its own tokens, k-major priority), so a token's
            # expert assignment never depends on co-batched rows.
            # Short forwards (decode steps / speculative verify chunks)
            # get capacity = l — a token takes at most one slot per
            # expert, so NOTHING drops and stepwise == chunked exactly.
            # Long rows (serving prefill) use the capacity factor
            # per-row: capacity=l there would inflate the expert einsum
            # E/K-fold on mostly-empty slots, and prefill drops are
            # deterministic per row AND shared by the greedy and
            # speculative paths, preserving their equivalence.
            if l <= 64:
                capacity = l
            else:
                capacity = max(1, min(l, math.ceil(
                    K * l / E * cfg.moe_capacity_factor)))
            oh_b = onehot.reshape(K, b, l, E).transpose(1, 0, 2, 3)
            flat = oh_b.reshape(b, K * l, E)
            pos = (jnp.cumsum(flat, axis=1) - flat).reshape(b, K, l, E)
            slot = jnp.sum(pos * oh_b, axis=-1).astype(jnp.int32)
            kept = jnp.sum((pos < capacity) * oh_b, axis=-1)
            slot_oh = (jax.nn.one_hot(slot, capacity, dtype=jnp.float32)
                       * kept[..., None])
            gates_b = gates.reshape(K, b, l).transpose(1, 0, 2)
            dispatch = jnp.einsum("bkle,bklc->blec", oh_b, slot_oh)
            combine = jnp.einsum("bkle,bklc,bkl->blec", oh_b, slot_oh,
                                 gates_b)
            xin = jnp.einsum("blec,bld->becd", dispatch.astype(x.dtype),
                             x)
            xin = _expert_constraint(xin, axis=1)
            h = nn.silu(jnp.einsum("becd,edf->becf", xin, cast(wg))) \
                * jnp.einsum("becd,edf->becf", xin, cast(wu))
            ye = jnp.einsum("becf,efd->becd", h, cast(wd))
            ye = _expert_constraint(ye, axis=1)
            y = jnp.einsum("blec,becd->bld", combine.astype(x.dtype), ye)
            y = y.reshape(n, d)
        else:
            capacity = max(1, math.ceil(K * n / E
                                        * cfg.moe_capacity_factor))

            # k-major slot assignment: flatten (K, n) so every first
            # choice outranks every second choice (GShard priority),
            # then the per-expert running count is the capacity slot.
            flat = onehot.reshape(K * n, E)
            pos = (jnp.cumsum(flat, axis=0) - flat).reshape(K, n, E)
            slot = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)
            kept = jnp.sum((pos < capacity) * onehot, axis=-1)  # (K, n)
            slot_oh = jax.nn.one_hot(slot, capacity,
                                     dtype=jnp.float32) * kept[..., None]

            dispatch = jnp.einsum("kne,knc->nec", onehot, slot_oh)
            combine = jnp.einsum("kne,knc,kn->nec", onehot, slot_oh,
                                 gates)

            xin = jnp.einsum("nec,nd->ecd", dispatch.astype(x.dtype), xt)
            xin = _expert_constraint(xin)
            h = nn.silu(jnp.einsum("ecd,edf->ecf", xin, cast(wg))) \
                * jnp.einsum("ecd,edf->ecf", xin, cast(wu))
            ye = jnp.einsum("ecf,efd->ecd", h, cast(wd))
            ye = _expert_constraint(ye)
            y = jnp.einsum("nec,ecd->nd", combine.astype(x.dtype), ye)

        # Switch load-balance loss: E * sum_e f_e * P_e where f_e is the
        # top-1 assignment fraction and P_e the mean router prob; == 1.0
        # at perfect balance. Padding tokens are excluded when a
        # token_mask is given. Sown (no-op unless "moe_aux" is mutable).
        if live is not None:
            denom = jnp.maximum(jnp.sum(live), 1.0)
            f_e = jnp.sum(onehot[0], axis=0) / denom
            p_e = jnp.sum(probs * live[:, None], axis=0) / denom
        else:
            f_e = jnp.mean(onehot[0], axis=0)
            p_e = jnp.mean(probs, axis=0)
        self.sow("moe_aux", "load_balance",
                 E * jnp.sum(f_e * p_e))

        return y.reshape(b, l, d).astype(x.dtype)
