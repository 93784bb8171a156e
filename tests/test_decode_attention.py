"""Flash-decode kernel: numerics vs the XLA reference path (fp + int8
cache, GQA, ragged masks), interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.kernels.decode_attention import (
    MIN_KERNEL_LEN,
    _xla_path,
    flash_decode_attention,
)
from haff_tpu.nn.quant import QuantArray, quantize_activation


def make_inputs(b=2, lmax=MIN_KERNEL_LEN, nh=8, nkv=4, hd=128, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, nh, hd).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, lmax, nkv, hd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, lmax, nkv, hd).astype(np.float32))
    # ragged live lengths per row
    lengths = [lmax // 2 + 3, lmax - 7]
    mask = np.zeros((b, lmax), np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
    return q, k, v, jnp.asarray(mask)


def test_kernel_matches_xla_fp():
    q, k, v, mask = make_inputs()
    ref = _xla_path(q, k, v, mask, q.shape[-1] ** -0.5)
    out = flash_decode_attention(q, k, v, mask, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_xla_quant():
    q, k, v, mask = make_inputs(seed=1)
    qk = quantize_activation(k)
    qv = quantize_activation(v)
    ref = _xla_path(q, qk, qv, mask, q.shape[-1] ** -0.5)
    out = flash_decode_attention(q, qk, qv, mask, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_kernel_mha_no_grouping():
    q, k, v, mask = make_inputs(nh=4, nkv=4, seed=2)
    ref = _xla_path(q, k, v, mask, q.shape[-1] ** -0.5)
    out = flash_decode_attention(q, k, v, mask, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quant_cache_close_to_full_precision():
    """int8 cache must track the full-precision attention closely."""
    q, k, v, mask = make_inputs(seed=3)
    ref = _xla_path(q, k, v, mask, q.shape[-1] ** -0.5)
    out = flash_decode_attention(q, quantize_activation(k),
                                 quantize_activation(v), mask,
                                 use_kernel=True, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() < 0.05, err.max()


def test_short_cache_falls_back_to_xla():
    q, k, v, _ = make_inputs(lmax=64)
    mask = jnp.ones((2, 64), jnp.int32)
    ref = _xla_path(q, k, v, mask, q.shape[-1] ** -0.5)
    out = flash_decode_attention(q, k, v, mask, use_kernel=True)  # small -> XLA inside
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_block_not_dividing_and_partial_blocks():
    """Lengths that leave whole k-blocks fully masked must still
    normalize correctly (the -inf guard)."""
    q, k, v, _ = make_inputs(lmax=2048)
    mask = np.zeros((2, 2048), np.int32)
    mask[0, :10] = 1        # only the first block has live slots
    mask[1, :1500] = 1
    mask = jnp.asarray(mask)
    ref = _xla_path(q, k, v, mask, q.shape[-1] ** -0.5)
    out = flash_decode_attention(q, k, v, mask, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
