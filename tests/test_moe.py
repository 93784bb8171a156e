"""MoE decoder MLP (nn/moe.py): routing math vs a per-token brute-force
oracle, dense equivalence at E=1, capacity semantics, the Switch aux
loss, expert-parallel sharding parity on the virtual mesh, remat + sow,
and the train-step integration."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.core.config import LlamaConfig
from haff_tpu.nn.moe import MoEMLP


def _cfg(**kw):
    base = dict(hidden_size=8, intermediate_size=16, num_layers=2,
                num_heads=2, num_kv_heads=2, head_dim=4, vocab_size=64,
                max_seq_len=32, moe_num_experts=4, moe_top_k=2,
                moe_capacity_factor=2.0)
    base.update(kw)
    return LlamaConfig(**base)


def _init(cfg, b=2, l=8, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (b, l, cfg.hidden_size), jnp.float32)
    moe = MoEMLP(cfg=cfg)
    params = nn.unbox(moe.init(jax.random.PRNGKey(seed), x)["params"])
    return moe, params, x


def _brute_force(cfg, params, x):
    """Per-token numpy oracle with k-major priority order."""
    d = cfg.hidden_size
    E, K = cfg.moe_num_experts, min(cfg.moe_top_k, cfg.moe_num_experts)
    xt = np.asarray(x, np.float64).reshape(-1, d)
    n = xt.shape[0]
    router = np.asarray(params["router"]["kernel"], np.float64)
    logits = xt @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)

    idx = np.argsort(-probs, axis=-1)[:, :K]              # (n, K)
    gates = np.take_along_axis(probs, idx, axis=-1)
    if K > 1:
        gates = gates / (gates.sum(-1, keepdims=True) + 1e-9)

    capacity = max(1, int(np.ceil(K * n / E * cfg.moe_capacity_factor)))
    counts = np.zeros(E, np.int64)
    y = np.zeros_like(xt)
    wg = np.asarray(params["gate_proj"], np.float64)
    wu = np.asarray(params["up_proj"], np.float64)
    wd = np.asarray(params["down_proj"], np.float64)

    def silu(v):
        return v / (1 + np.exp(-v))

    for k in range(K):          # all first choices beat all second ones
        for t in range(n):
            e = idx[t, k]
            if counts[e] < capacity:
                counts[e] += 1
                h = silu(xt[t] @ wg[e]) * (xt[t] @ wu[e])
                y[t] += gates[t, k] * (h @ wd[e])
    return y.reshape(x.shape)


def test_moe_matches_bruteforce_oracle():
    cfg = _cfg()
    moe, params, x = _init(cfg)
    got = np.asarray(moe.apply({"params": params}, x))
    want = _brute_force(cfg, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_top1_matches_bruteforce():
    cfg = _cfg(moe_top_k=1, moe_num_experts=3, moe_capacity_factor=1.5)
    moe, params, x = _init(cfg, b=1, l=12, seed=3)
    got = np.asarray(moe.apply({"params": params}, x))
    want = _brute_force(cfg, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_single_expert_equals_dense_mlp():
    from haff_tpu.nn.llama import LlamaMLP

    cfg = _cfg(moe_num_experts=1, moe_top_k=1, moe_capacity_factor=100.0)
    moe, params, x = _init(cfg)
    got = np.asarray(moe.apply({"params": params}, x))

    dense = LlamaMLP(cfg=cfg)
    dparams = {
        "gate_proj": {"kernel": params["gate_proj"][0]},
        "up_proj": {"kernel": params["up_proj"][0]},
        "down_proj": {"kernel": params["down_proj"][0]},
    }
    want = np.asarray(dense.apply({"params": dparams}, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_moe_capacity_overflow_drops_tokens():
    # capacity_factor makes C=1 slot/expert: with 16 tokens and 2
    # experts, at most 2 token-slots (top-1) receive expert output;
    # dropped tokens contribute exactly zero (residual passthrough).
    cfg = _cfg(moe_num_experts=2, moe_top_k=1,
               moe_capacity_factor=2 / 16)
    moe, params, x = _init(cfg)
    y = np.asarray(moe.apply({"params": params}, x)).reshape(-1, 8)
    nonzero_rows = int((np.abs(y).sum(-1) > 0).sum())
    assert nonzero_rows <= 2, nonzero_rows


def test_moe_aux_loss_sown_and_balanced_value():
    cfg = _cfg()
    moe, params, _ = _init(cfg)
    # zero input -> uniform router probs; aux = E * sum(f*p) where
    # p = 1/E uniformly and f sums to 1 -> exactly 1.0 at any tie-break.
    x0 = jnp.zeros((2, 8, cfg.hidden_size), jnp.float32)
    _, mut = moe.apply({"params": params}, x0, mutable=("moe_aux",))
    leaves = jax.tree_util.tree_leaves(mut["moe_aux"])
    assert leaves, "no aux loss sown"
    np.testing.assert_allclose(float(leaves[0]), 1.0, rtol=1e-5)


def test_moe_gradients_flow_to_router_and_experts():
    cfg = _cfg()
    moe, params, x = _init(cfg)

    def loss(p):
        return jnp.sum(moe.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(params)
    for key in ("router", "gate_proj", "up_proj", "down_proj"):
        g = grads[key]["kernel"] if key == "router" else grads[key]
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(jnp.asarray(g)).sum()) > 0, key


def test_moe_expert_parallel_matches_single_device():
    """(data=2, expert=2, tensor=2) mesh: sharded forward + grads match
    the unsharded result — the ep leg of the parallelism matrix."""
    from haff_tpu.core.config import MeshConfig
    from haff_tpu.core.mesh import build_mesh
    from haff_tpu.parallel.sharding import param_shardings, shard_batch_tree

    cfg = _cfg()
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, cfg.hidden_size),
                          jnp.float32)
    moe = MoEMLP(cfg=cfg)
    boxed = moe.init(jax.random.PRNGKey(0), x)["params"]
    params = nn.unbox(boxed)

    def loss(p, xx):
        return jnp.sum(moe.apply({"params": p}, xx) ** 2)

    ref_val, ref_grads = jax.value_and_grad(loss)(params, x)

    mesh = build_mesh(MeshConfig(data=2, ep=2, tensor=2))
    shardings = param_shardings(mesh, boxed)
    sp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    with mesh:
        sx = shard_batch_tree(mesh, x)
        val, grads = jax.jit(jax.value_and_grad(loss))(sp, sx)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        grads, ref_grads)


def test_moe_in_llama_with_remat_and_interleave():
    """moe_every=2 -> layer 1 is MoE, layer 0 dense; remat'd blocks must
    still sow the aux loss and produce finite grads."""
    from haff_tpu.nn.llama import LlamaForCausalLM

    cfg = _cfg(moe_every=2, num_layers=2)
    lm = LlamaForCausalLM(cfg=cfg, remat=True)
    ids = jnp.arange(8, dtype=jnp.int32)[None, :] + 2
    pos = jnp.arange(8, dtype=jnp.int32)[None, :]
    params = nn.unbox(lm.init(jax.random.PRNGKey(0), ids, pos,
                              method=lm.init_all)["params"])
    assert "moe" in params["model"]["layers_1"]
    assert "mlp" in params["model"]["layers_0"]

    def loss(p):
        emb = lm.apply({"params": p}, ids, method=lm.embed)
        logits, _, _ = lm.apply({"params": p}, emb, pos,
                                mutable=("moe_aux",))[0]
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(
        np.asarray(g["model"]["layers_1"]["moe"]["down_proj"])).all()


def test_moe_evaluate_decode_path():
    """Scan decode with an MoE decoder: every step routes a single
    token per row (n = B) through the experts; masks stay finite."""
    import __graft_entry__ as ge
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel

    base = ge._entry_cfg()
    cfg = dataclasses.replace(base, llama=dataclasses.replace(
        base.llama, moe_num_experts=2, moe_top_k=2))
    model = LisaModel(cfg=cfg)
    batch = ge._make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    ev = make_jitted_evaluate(model, max_new_tokens=4, eos_id=2)
    res = ev(variables, batch.images_sam, batch.images_clip,
             batch.input_ids, batch.attention_mask)
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()


def test_moe_train_step_includes_aux_loss():
    """Full LISA train step with an MoE decoder: runs, finite, and the
    aux term moves the loss when its weight changes."""
    from haff_tpu.core.config import ModelConfig, TrainConfig
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.train.trainer import (init_train_state, make_train_step,
                                        partition_params)
    import __graft_entry__ as ge

    base = ge._entry_cfg()
    losses = {}
    for w in (0.0, 0.5):
        cfg = dataclasses.replace(base, llama=dataclasses.replace(
            base.llama, moe_num_experts=2, moe_top_k=1, moe_every=1,
            moe_aux_weight=w))
        model = LisaModel(cfg=cfg)
        batch = ge._make_batch(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch)
        params = nn.unbox(variables["params"])
        trainable, frozen = partition_params(params, extra=("moe",))
        from flax import traverse_util
        assert any("moe" in k
                   for k in traverse_util.flatten_dict(trainable))
        tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=0,
                           total_steps=4, grad_accumulation_steps=1)
        state = init_train_state(tcfg, trainable)
        step = jax.jit(make_train_step(model, tcfg))
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
        losses[w] = float(metrics["loss"])
        assert np.isfinite(losses[w])
    assert losses[0.5] != pytest.approx(losses[0.0])


def test_moe_per_row_no_drop_co_batch_independent():
    """no_drop (serving) mode routes per row: a row's output must be
    identical whether it shares the forward with other rows or not, and
    for l <= 64 nothing ever drops — each token's output equals
    sum_k gate_k * expert_k(token) exactly."""
    cfg = _cfg()
    moe, params, x = _init(cfg, b=3, l=6)
    moe_nd = MoEMLP(cfg=cfg, no_drop=True)
    y_all = moe_nd.apply({"params": params}, x)
    for r in range(3):
        y_one = moe_nd.apply({"params": params}, x[r:r + 1])
        np.testing.assert_allclose(np.asarray(y_all[r]),
                                   np.asarray(y_one[0]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"row {r} depends on co-batch")

    # brute-force per-token (no capacity at all == no-drop)
    d = cfg.hidden_size
    E, K = cfg.moe_num_experts, cfg.moe_top_k
    xt = np.asarray(x, np.float64).reshape(-1, d)
    router = np.asarray(params["router"]["kernel"], np.float64)
    logits = xt @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    idx = np.argsort(-probs, axis=-1)[:, :K]
    gates = np.take_along_axis(probs, idx, axis=-1)
    gates = gates / (gates.sum(-1, keepdims=True) + 1e-9)
    wg = np.asarray(params["gate_proj"], np.float64)
    wu = np.asarray(params["up_proj"], np.float64)
    wd = np.asarray(params["down_proj"], np.float64)

    def silu(v):
        return v / (1 + np.exp(-v))

    y_ref = np.zeros_like(xt)
    for t in range(xt.shape[0]):
        for k in range(K):
            e = idx[t, k]
            h = silu(xt[t] @ wg[e]) * (xt[t] @ wu[e])
            y_ref[t] += gates[t, k] * (h @ wd[e])
    np.testing.assert_allclose(np.asarray(y_all).reshape(-1, d), y_ref,
                               rtol=1e-4, atol=1e-5)


def test_moe_token_mask_excludes_padding():
    """Masked (padding) tokens claim no capacity, produce zero MLP
    output, and are excluded from the aux-loss statistics; changing
    padding content never changes live-token outputs."""
    cfg = _cfg(moe_capacity_factor=0.6)  # tight: drops likely at n=16
    moe, params, x = _init(cfg, b=2, l=8)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0],
                        [1, 1, 1, 0, 0, 0, 0, 0]], jnp.int32)
    y1, mut1 = moe.apply({"params": params}, x, mask > 0,
                         mutable=("moe_aux",))
    # padding output must be exactly zero (residual passthrough)
    pad = np.asarray(~(np.asarray(mask) > 0))
    np.testing.assert_array_equal(
        np.asarray(y1)[pad], np.zeros_like(np.asarray(y1)[pad]))

    # perturb the padding tokens only -> live outputs unchanged
    noise = jax.random.normal(jax.random.PRNGKey(9), x.shape) * 10
    x2 = jnp.where((mask > 0)[..., None], x, x + noise)
    y2 = moe.apply({"params": params}, x2, mask > 0)
    live = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(y1)[live], np.asarray(y2)[live],
                               rtol=1e-5, atol=1e-6)

    # aux loss over live tokens only: all-live vs padded differ when
    # the padding would have skewed the stats
    _, mut_full = moe.apply({"params": params}, x,
                            jnp.ones_like(mask) > 0,
                            mutable=("moe_aux",))
    aux_masked = float(jax.tree_util.tree_leaves(mut1["moe_aux"])[0])
    assert np.isfinite(aux_masked) and aux_masked > 0


def test_moe_per_row_long_prefill_uses_capacity_factor():
    """l > 64 rows (serving prefill) route per-row with the capacity
    factor — still co-batch independent, possibly dropping within a
    row (deterministically)."""
    cfg = _cfg()
    moe, params, _ = _init(cfg, b=1, l=8)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 96, cfg.hidden_size))
    moe_nd = MoEMLP(cfg=cfg, no_drop=True)
    y_all = moe_nd.apply({"params": params}, x)
    y_one = moe_nd.apply({"params": params}, x[:1])
    np.testing.assert_allclose(np.asarray(y_all[0]), np.asarray(y_one[0]),
                               rtol=1e-5, atol=1e-6)
