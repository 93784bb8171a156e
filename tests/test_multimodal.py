"""Static-shape multimodal splice vs a straightforward Python splice."""

import jax.numpy as jnp
import numpy as np

from haff_tpu.core.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from haff_tpu.model.multimodal import (
    find_image_position,
    gather_seg_embeddings,
    splice_image_embeddings,
)


def naive_splice(tokens, feats, ids, labels, attn, pos):
    """Python reference mirroring llava_arch.py semantics."""
    e = []
    lab = []
    att = []
    for j in range(ids.shape[0]):
        if j == pos:
            for p in range(feats.shape[0]):
                e.append(feats[p])
                lab.append(IGNORE_INDEX)
                att.append(1)
        else:
            e.append(tokens[j])
            lab.append(labels[j])
            att.append(attn[j])
    return np.stack(e), np.array(lab), np.array(att)


def test_splice_matches_naive():
    rng = np.random.RandomState(0)
    B, Lin, P, E = 2, 10, 4, 8
    ids = rng.randint(5, 100, (B, Lin)).astype(np.int32)
    pos = [3, 0]
    for b in range(B):
        ids[b, pos[b]] = IMAGE_TOKEN_INDEX
    # row 0 has 2 trailing pads
    attn = np.ones((B, Lin), np.int32)
    attn[0, -2:] = 0
    labels = rng.randint(5, 100, (B, Lin)).astype(np.int32)
    tokens = rng.randn(B, Lin, E).astype(np.float32)
    feats = rng.randn(B, P, E).astype(np.float32)

    out = splice_image_embeddings(
        jnp.asarray(tokens), jnp.asarray(feats),
        find_image_position(jnp.asarray(ids)), jnp.asarray(ids),
        jnp.asarray(labels), jnp.asarray(attn))

    assert out.embeds.shape == (B, Lin + P - 1, E)
    for b in range(B):
        ne, nl, na = naive_splice(tokens[b], feats[b], ids[b], labels[b],
                                  attn[b], pos[b])
        np.testing.assert_allclose(np.asarray(out.embeds)[b], ne, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.labels)[b], nl)
        np.testing.assert_array_equal(np.asarray(out.segment_ids)[b], na)
    # positions are cumulative over real tokens
    np.testing.assert_array_equal(
        np.asarray(out.positions)[1], np.arange(Lin + P - 1))


def test_seg_token_mask_and_gather():
    B, Lin, P, E = 1, 8, 4, 6
    seg_id = 77
    ids = np.array([[1, IMAGE_TOKEN_INDEX, 5, 6, seg_id, 7, 2, 0]],
                   np.int32)
    attn = np.array([[1, 1, 1, 1, 1, 1, 1, 0]], np.int32)
    labels = np.full((B, Lin), 9, np.int32)
    tokens = np.random.RandomState(0).randn(B, Lin, E).astype(np.float32)
    feats = np.zeros((B, P, E), np.float32)

    out = splice_image_embeddings(
        jnp.asarray(tokens),
        jnp.asarray(feats), find_image_position(jnp.asarray(ids)),
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(attn),
        seg_token_idx=seg_id)

    mask = np.asarray(out.seg_token_mask)[0]
    # [SEG] original index 4 -> spliced index 4 + (P-1) = 7; the mask marks
    # the preceding slot (6): hidden state that predicts [SEG]
    # (reference LISA.py:195-207 convention).
    assert mask[6] and mask.sum() == 1

    hidden = jnp.asarray(
        np.arange(B * (Lin + P - 1) * 3).reshape(B, Lin + P - 1, 3)
        .astype(np.float32))
    emb, valid = gather_seg_embeddings(hidden, out.seg_token_mask, max_segs=2)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])
    np.testing.assert_allclose(np.asarray(emb)[0, 0], np.asarray(hidden)[0, 6])
    np.testing.assert_allclose(np.asarray(emb)[0, 1], 0.0)
