"""Static-shape multimodal token splicing.

The reference splices 256 CLIP patch features into the token-embedding
sequence at the IMAGE_TOKEN_INDEX position with a per-sample Python loop
and dynamic right-padding (reference: llava/model/llava_arch.py:98-347).
That is retraced per shape on XLA; here the splice is one fixed-shape
gather/select: output length is always L_in + num_patches - 1, the image
position may vary per row, and everything vectorizes over the batch.

The reference further assumes a single leading image when gathering [SEG]
hidden states, hard-coding a 255-position shift (reference:
LISA.py:195-207). Here the shift falls out of the same position math with
no hack.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX


class SplicedBatch(NamedTuple):
    embeds: jnp.ndarray        # (B, L_out, E)
    labels: jnp.ndarray        # (B, L_out) int32 (IGNORE over image span)
    segment_ids: jnp.ndarray   # (B, L_out) int32, 0 = padding
    positions: jnp.ndarray     # (B, L_out) int32 RoPE positions
    seg_token_mask: jnp.ndarray  # (B, L_out) bool: next token is [SEG]


def find_image_position(input_ids: jnp.ndarray) -> jnp.ndarray:
    """Index of the (single) IMAGE_TOKEN_INDEX per row; rows without an
    image token get position L (splice becomes a no-op append region)."""
    is_img = input_ids == IMAGE_TOKEN_INDEX
    l = input_ids.shape[1]
    return jnp.where(is_img.any(-1), jnp.argmax(is_img, axis=-1), l)


def splice_image_embeddings(
    token_embeds: jnp.ndarray,      # (B, L, E)
    image_features: jnp.ndarray,    # (B, P, E)
    image_pos: jnp.ndarray,         # (B,)
    input_ids: jnp.ndarray,         # (B, L)
    labels: Optional[jnp.ndarray] = None,      # (B, L)
    attention_mask: Optional[jnp.ndarray] = None,  # (B, L) 1=real
    seg_token_idx: Optional[int] = None,
) -> SplicedBatch:
    b, l, e = token_embeds.shape
    p = image_features.shape[1]
    l_out = l + p - 1
    pos = image_pos[:, None]  # (B, 1)
    j = jnp.arange(l_out)[None, :]  # (B(l), L_out)

    # Region selectors for each output slot.
    before = j < pos
    in_image = (j >= pos) & (j < pos + p)
    # token index feeding slot j (for before/after regions)
    tok_idx = jnp.where(before, j, j - (p - 1))
    tok_idx = jnp.clip(tok_idx, 0, l - 1)

    # The differentiable splice is built from static pads + masks + one
    # per-row roll — NO gather/scatter/one-hot-matmul on the embedding:
    #   * slots before the image read tok[j]       -> end-pad to L_out
    #   * slots after the image read tok[j-(p-1)]  -> front-pad by p-1
    #   * the image block is placed by rolling a zero-padded canvas by
    #     image_pos along the SEQUENCE axis (unsharded on every LISA
    #     mesh), so both the roll and its backward (roll by -pos) stay
    #     local to each batch shard.
    # Earlier formulations — take_along_axis (scatter-add backward) and
    # one-hot einsums (bjl,ble->bje) — both made GSPMD fall back to
    # "involuntary full rematerialization" of the embedding (grad) on a
    # (data x tensor) mesh; this one compiles clean (MULTICHIP_r03).
    # Integer gathers (ids/labels/mask) keep take_along_axis — no
    # gradient flows there.
    dt = token_embeds.dtype
    after = ~before & ~in_image
    tok_end = jnp.pad(token_embeds, ((0, 0), (0, p - 1), (0, 0)))
    tok_front = jnp.pad(token_embeds, ((0, 0), (p - 1, 0), (0, 0)))
    img_canvas = jnp.pad(
        image_features.astype(dt), ((0, 0), (0, l_out - p), (0, 0)))
    img_rolled = jax.vmap(
        lambda x, s: jnp.roll(x, s, axis=0))(img_canvas, image_pos)
    embeds = (tok_end * before[..., None].astype(dt)
              + tok_front * after[..., None].astype(dt)
              + img_rolled * in_image[..., None].astype(dt))

    gathered_ids = jnp.take_along_axis(input_ids, tok_idx, axis=1)

    if labels is not None:
        out_labels = jnp.where(
            in_image, IGNORE_INDEX, jnp.take_along_axis(labels, tok_idx, 1))
    else:
        out_labels = jnp.full((b, l_out), IGNORE_INDEX, jnp.int32)

    if attention_mask is not None:
        seg = jnp.where(
            in_image, 1, jnp.take_along_axis(attention_mask, tok_idx, 1))
    else:
        seg = jnp.ones((b, l_out), jnp.int32)
    seg = seg.astype(jnp.int32)

    positions = jnp.cumsum(seg, axis=1) - 1
    positions = jnp.maximum(positions, 0)

    if seg_token_idx is not None:
        # True at slot i when the token at slot i+1 is [SEG] — the hidden
        # state that predicts/emits [SEG] (reference LISA.py:195-207
        # convention).
        is_seg = (gathered_ids == seg_token_idx) & ~in_image & (seg != 0)
        seg_mask = jnp.concatenate(
            [is_seg[:, 1:], jnp.zeros((b, 1), bool)], axis=1)
    else:
        seg_mask = jnp.zeros((b, l_out), bool)

    return SplicedBatch(embeds=embeds, labels=out_labels, segment_ids=seg,
                        positions=positions, seg_token_mask=seg_mask)


def gather_seg_embeddings(hidden: jnp.ndarray, seg_token_mask: jnp.ndarray,
                          max_segs: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather up to max_segs [SEG]-predicting hidden states per row.

    hidden: (B, L, D); returns (embeddings (B, max_segs, D),
    valid (B, max_segs) bool). Static shapes: rows with fewer [SEG]s are
    masked, extras beyond max_segs are dropped (the affordance task always
    has exactly one [SEG] per conversation)."""
    b, l, d = hidden.shape
    # rank of each position among seg positions in its row
    rank = jnp.cumsum(seg_token_mask.astype(jnp.int32), axis=1) - 1
    idx = jnp.full((b, max_segs), 0, jnp.int32)
    valid = jnp.zeros((b, max_segs), bool)
    for s in range(max_segs):
        hit = seg_token_mask & (rank == s)
        idx = idx.at[:, s].set(jnp.argmax(hit, axis=1))
        valid = valid.at[:, s].set(hit.any(axis=1))
    # One-hot contraction instead of take_along_axis: the gather's
    # backward is a scatter-add, which GSPMD can only shard by fully
    # rematerializing the operand (observed "Involuntary full
    # rematerialization" warnings in the multichip dryrun); the einsum's
    # backward is another einsum, and single-nonzero rows make it exact.
    one_hot = (jnp.arange(l)[None, None, :] == idx[..., None]  # (B,S,L)
               ).astype(hidden.dtype)
    emb = jnp.einsum("bsl,bld->bsd", one_hot, hidden)
    emb = emb * valid[..., None]
    return emb, valid
