"""Flash-attention kernel numerics vs the XLA reference (interpret mode on
CPU — the same kernel code compiles for TPU). This is the rebuild's
replacement for the reference's vendored Triton kernel race/numerics tests
(SURVEY.md section 5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.kernels.flash_attention import flash_attention, mha_reference


def make_qkv(b=2, lq=128, lk=128, h=2, d=32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, lq, h, d).astype(np.float32)) * 0.5
    k = jnp.asarray(rng.randn(b, lk, h, d).astype(np.float32)) * 0.5
    v = jnp.asarray(rng.randn(b, lk, h, d).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_reference(causal):
    q, k, v = make_qkv()
    out = flash_attention(q, k, v, causal=causal, block_q=32, block_k=32)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_forward_with_bias():
    q, k, v = make_qkv()
    rng = np.random.RandomState(1)
    bias = jnp.asarray(rng.randn(1, 2, 128, 128).astype(np.float32))
    out = flash_attention(q, k, v, bias=bias, block_q=32, block_k=32)
    ref = mha_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_forward_segment_ids_padding():
    """Padding (segment id 0) keys are invisible; padded q rows output 0."""
    q, k, v = make_qkv(b=1, lq=64, lk=64)
    seg = jnp.asarray(
        np.concatenate([np.ones(40), np.zeros(24)])[None].astype(np.int32))
    out = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          causal=True, block_q=32, block_k=32)
    ref = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                        causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out)[0, 40:], 0.0, atol=1e-6)


def test_forward_packed_sequences():
    """Two packed sequences must not attend across the boundary."""
    q, k, v = make_qkv(b=1, lq=64, lk=64)
    seg = jnp.asarray(
        np.concatenate([np.full(32, 1), np.full(32, 2)])[None].astype(np.int32))
    out = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          block_q=32, block_k=32)
    ref = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_reference(causal):
    q, k, v = make_qkv(b=1, lq=64, lk=64, h=2, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=causal, block_q=32,
                            block_k=32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_gradients_with_padding():
    q, k, v = make_qkv(b=1, lq=64, lk=64, h=2, d=16)
    seg = jnp.asarray(
        np.concatenate([np.ones(48), np.zeros(16)])[None].astype(np.int32))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=True, block_q=32, block_k=32)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          causal=True)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_cross_attention_rectangular():
    q, k, v = make_qkv(lq=32, lk=128)
    out = flash_attention(q, k, v, block_q=32, block_k=32)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_causal_decode_alignment():
    """Causal with Lq < Lk aligns the triangle to the END of K (KV-cache
    style): query i sees keys [0, lk-lq+i]."""
    q, k, v = make_qkv(lq=32, lk=64)
    out = flash_attention(q, k, v, causal=True, block_q=32, block_k=32)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
