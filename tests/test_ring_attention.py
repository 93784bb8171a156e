"""Ring (sequence-parallel) attention vs the single-device reference.

Runs on the 8-device virtual CPU mesh (conftest). Forward and backward
must match plain attention over the full, unsharded sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from haff_tpu.kernels.flash_attention import mha_reference
from haff_tpu.parallel.ring_attention import sequence_sharded_attention

B, L, H, D = 2, 128, 2, 32  # 8 devices -> 16-token chunks


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("sp",))


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


def _qkv(seed=0, lk=L):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (_rand(ks[0], (B, L, H, D)), _rand(ks[1], (B, lk, H, D)),
            _rand(ks[2], (B, lk, H, D)))


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_reference(causal):
    q, k, v = _qkv()
    ref = mha_reference(q, k, v, causal=causal)
    out = sequence_sharded_attention(_mesh(), "sp", q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_cross_attention_rectangular():
    q, k, v = _qkv(seed=1, lk=256)
    ref = mha_reference(q, k, v)
    out = sequence_sharded_attention(_mesh(), "sp", q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_reference(causal):
    q, k, v = _qkv(seed=2)
    g = _rand(jax.random.PRNGKey(9), (B, L, H, D))
    mesh = _mesh()

    def ring_loss(q, k, v):
        out = sequence_sharded_attention(mesh, "sp", q, k, v, causal=causal)
        return jnp.sum(out * g)

    def ref_loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) * g)

    grads = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(grads, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, err_msg=f"d{name}")


def test_padding_segment_ids():
    q, k, v = _qkv(seed=3)
    # per-row ragged valid lengths; padding spans whole tail chunks for
    # row 1 so some ring steps see zero valid keys for valid queries
    lens = np.array([100, 40])
    seg = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
    seg = jnp.asarray(seg)
    ref = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    out = sequence_sharded_attention(_mesh(), "sp", q, k, v,
                                     q_segment_ids=seg)
    valid = np.asarray(seg)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(out) * valid,
                               np.asarray(ref) * valid, atol=2e-5)


def test_packed_sequences_with_gradients():
    q, k, v = _qkv(seed=4)
    # two packed segments + tail padding, boundaries off chunk edges
    seg = np.zeros((B, L), np.int32)
    seg[:, :50] = 1
    seg[:, 50:110] = 2
    seg = jnp.asarray(seg)
    g = _rand(jax.random.PRNGKey(7), (B, L, H, D))
    mesh = _mesh()

    def ring_loss(q, k, v):
        out = sequence_sharded_attention(mesh, "sp", q, k, v,
                                         q_segment_ids=seg, causal=True)
        return jnp.sum(jnp.where(seg[:, :, None, None] != 0, out, 0.0) * g)

    def ref_loss(q, k, v):
        out = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=True)
        return jnp.sum(jnp.where(seg[:, :, None, None] != 0, out, 0.0) * g)

    out_ring = sequence_sharded_attention(mesh, "sp", q, k, v,
                                          q_segment_ids=seg, causal=True)
    out_ref = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=True)
    valid = np.asarray(seg)[:, :, None, None] != 0
    np.testing.assert_allclose(np.asarray(out_ring) * valid,
                               np.asarray(out_ref) * valid, atol=2e-5)

    grads = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(grads, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, err_msg=f"d{name}")


def test_llama_sequence_parallel_matches_single_device():
    """LlamaForCausalLM with cfg.sequence_parallel under a mesh with an
    sp axis must produce the same logits as the plain path — including
    an off-multiple sequence length (internal padding branch) and TP x
    SP head sharding on a (1,1,4,2) mesh."""
    import dataclasses

    from haff_tpu.core.config import LlamaConfig
    from haff_tpu.core.mesh import build_mesh
    from haff_tpu.core.config import MeshConfig
    from haff_tpu.nn.llama import LlamaForCausalLM

    base = LlamaConfig.preset("tiny")
    b, l = 2, 60  # 60 -> padded to 64 internally (sp*8 multiples)
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.randn(b, l, base.hidden_size)
                         .astype(np.float32) * 0.1)
    pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    seg = jnp.asarray((np.arange(l)[None] < np.array([[55], [40]]))
                      .astype(np.int32))

    plain = LlamaForCausalLM(cfg=base)
    params = plain.init(jax.random.PRNGKey(0), embeds, pos)
    ref_logits, _, _ = plain.apply(params, embeds, pos, seg)

    sp_model = LlamaForCausalLM(
        cfg=dataclasses.replace(base, sequence_parallel=True))
    for mesh_cfg in (MeshConfig(data=1, fsdp=1, sp=8, tensor=1),
                     MeshConfig(data=1, fsdp=1, sp=4, tensor=2)):
        mesh = build_mesh(mesh_cfg)
        with mesh:
            logits, _, _ = jax.jit(sp_model.apply)(params, embeds, pos, seg)
        valid = np.asarray(seg)[:, :, None] != 0
        np.testing.assert_allclose(
            np.asarray(logits) * valid, np.asarray(ref_logits) * valid,
            atol=2e-4,
            err_msg=f"sp={mesh_cfg.sp} tensor={mesh_cfg.tensor}")


def test_llama_sequence_parallel_prefill_with_cache():
    """Long-context prefill (kv caches being written) must also take the
    ring path and agree with the plain path — logits AND cache
    contents."""
    import dataclasses

    from haff_tpu.core.config import LlamaConfig, MeshConfig
    from haff_tpu.core.mesh import build_mesh
    from haff_tpu.nn.llama import LlamaForCausalLM

    base = LlamaConfig.preset("tiny")
    b, l, max_len = 2, 64, 80
    rng = np.random.RandomState(2)
    embeds = jnp.asarray(rng.randn(b, l, base.hidden_size)
                         .astype(np.float32) * 0.1)
    pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    seg = jnp.ones((b, l), jnp.int32)

    def prefill(model):
        caches = model.init_kv_caches(b, max_len, dtype=jnp.float32)
        return model.apply(params, embeds, pos, seg, kv_caches=caches,
                           cache_index=jnp.zeros((b,), jnp.int32))

    plain = LlamaForCausalLM(cfg=base)
    params = plain.init(jax.random.PRNGKey(0), embeds, pos)
    ref_logits, _, ref_caches = prefill(plain)

    sp_model = LlamaForCausalLM(
        cfg=dataclasses.replace(base, sequence_parallel=True))
    mesh = build_mesh(MeshConfig(data=1, fsdp=1, sp=8, tensor=1))
    with mesh:
        logits, _, caches = jax.jit(lambda: prefill(sp_model))()
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4)
    for got, want in zip(jax.tree_util.tree_leaves(caches),
                         jax.tree_util.tree_leaves(ref_caches)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_llama_sequence_parallel_gradients():
    """Backward through the full decoder with ring attention (custom
    vjp under remat + shard_map) stays finite and matches the plain
    path."""
    import dataclasses

    from haff_tpu.core.config import LlamaConfig, MeshConfig
    from haff_tpu.core.mesh import build_mesh
    from haff_tpu.nn.llama import LlamaForCausalLM

    base = LlamaConfig.preset("tiny")
    b, l = 2, 64
    rng = np.random.RandomState(1)
    embeds = jnp.asarray(rng.randn(b, l, base.hidden_size)
                         .astype(np.float32) * 0.1)
    pos = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
    seg = jnp.ones((b, l), jnp.int32)

    def loss_fn(model):
        def f(params):
            logits, _, _ = model.apply(params, embeds, pos, seg)
            return jnp.mean(logits ** 2)
        return f

    plain = LlamaForCausalLM(cfg=base)
    params = plain.init(jax.random.PRNGKey(0), embeds, pos)
    ref = jax.grad(loss_fn(plain))(params)

    sp_model = LlamaForCausalLM(
        cfg=dataclasses.replace(base, sequence_parallel=True))
    mesh = build_mesh(MeshConfig(data=2, fsdp=1, sp=4, tensor=1))
    with mesh:
        got = jax.jit(jax.grad(loss_fn(sp_model)))(params)
    flat_ref = jax.tree_util.tree_leaves(ref)
    flat_got = jax.tree_util.tree_leaves(got)
    for a, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a), atol=3e-5)


def test_jit_and_dp_sp_mesh():
    """Ring attention under jit on a 2x4 (data, sp) mesh — batch AND
    sequence sharded, the production layout."""
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "sp"))
    q, k, v = _qkv(seed=5)

    @jax.jit
    def run(q, k, v):
        return sequence_sharded_attention(mesh, "sp", q, k, v, causal=True,
                                          batch_axes="data")

    out = run(q, k, v)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
