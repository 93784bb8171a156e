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


def test_splice_and_gather_gradients_match_gather_formulation():
    """The one-hot einsum splice/gather must be gradient-identical to the
    take_along_axis formulation it replaced (the einsum exists so GSPMD
    shards the backward without scatter-add rematerialization)."""
    import jax

    rng = np.random.RandomState(1)
    B, Lin, P, E = 2, 10, 4, 8
    ids = rng.randint(5, 100, (B, Lin)).astype(np.int32)
    ids[0, 3] = IMAGE_TOKEN_INDEX
    ids[1, 0] = IMAGE_TOKEN_INDEX
    attn = np.ones((B, Lin), np.int32)
    attn[0, -2:] = 0
    labels = rng.randint(5, 100, (B, Lin)).astype(np.int32)
    tokens = rng.randn(B, Lin, E).astype(np.float32)
    feats = rng.randn(B, P, E).astype(np.float32)
    w = rng.randn(B, Lin + P - 1, E).astype(np.float32)

    def loss_einsum(tok, ft):
        out = splice_image_embeddings(
            tok, ft, find_image_position(jnp.asarray(ids)),
            jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(attn))
        return jnp.sum(out.embeds * w)

    def loss_gather(tok, ft):
        # the pre-einsum formulation, inlined
        l, p = Lin, P
        pos = find_image_position(jnp.asarray(ids))[:, None]
        j = jnp.arange(l + p - 1)[None, :]
        in_image = (j >= pos) & (j < pos + p)
        tok_idx = jnp.where(j < pos, j, j - (p - 1))
        tok_idx = jnp.clip(tok_idx, 0, l - 1)
        img_idx = jnp.clip(j - pos, 0, p - 1)
        g_tok = jnp.take_along_axis(tok, tok_idx[..., None], axis=1)
        g_img = jnp.take_along_axis(ft, img_idx[..., None], axis=1)
        emb = jnp.where(in_image[..., None], g_img, g_tok)
        return jnp.sum(emb * w)

    ge = jax.grad(loss_einsum, argnums=(0, 1))(jnp.asarray(tokens),
                                               jnp.asarray(feats))
    gg = jax.grad(loss_gather, argnums=(0, 1))(jnp.asarray(tokens),
                                               jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(ge[0]), np.asarray(gg[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ge[1]), np.asarray(gg[1]),
                               rtol=1e-6, atol=1e-6)

    # gather_seg_embeddings: grad through the one-hot contraction equals
    # grad through take_along_axis
    seg_mask = jnp.zeros((B, Lin + P - 1), bool).at[:, 5].set(True)
    wh = rng.randn(B, 2, E).astype(np.float32)

    def g_einsum(hidden):
        emb, _ = gather_seg_embeddings(hidden, seg_mask, max_segs=2)
        return jnp.sum(emb * wh)

    def g_gather(hidden):
        idx = jnp.full((B, 2), 5).at[:, 1].set(0)
        valid = jnp.array([[True, False]] * B)
        emb = jnp.take_along_axis(hidden, idx[..., None], axis=1)
        return jnp.sum(emb * valid[..., None] * wh)

    h = jnp.asarray(rng.randn(B, Lin + P - 1, E).astype(np.float32))
    np.testing.assert_allclose(np.asarray(jax.grad(g_einsum)(h)),
                               np.asarray(jax.grad(g_gather)(h)),
                               rtol=1e-6, atol=1e-6)


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
