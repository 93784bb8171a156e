"""The evaluate() parity API: text+image -> (output tokens, left/right
affordance masks, taxonomy).

Capability parity with reference LISA.py:432-534 model.evaluate():
generate with hidden-state capture -> gather the [SEG] embedding ->
prompt-encode it as a text prompt -> dual SAM mask decode -> postprocess.

TPU-first: the whole thing is ONE jitted function (prefill + scan decode +
batched SAM encode + dual decode). Masks come back on the padded square
canvas; per-frame resize to the original resolution is host-side
(nn/sam.py resize_to_original), exactly mirroring the reference's
postprocess split.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..model.lisa import LisaModel
from ..model.multimodal import find_image_position, splice_image_embeddings
from ..nn.sam import postprocess_masks_padded
from .generate import (GenerateResult, greedy_generate,
                       speculative_generate)


class EvaluateResult(NamedTuple):
    output_ids: jnp.ndarray        # (B, T) generated tokens
    gen_lengths: jnp.ndarray       # (B,)
    pred_masks_left: jnp.ndarray   # (B, S, S) canvas logits
    pred_masks_right: jnp.ndarray  # (B, S, S)
    taxonomies: jnp.ndarray        # (B, 4) softmax probs
    seg_found: jnp.ndarray         # (B,) bool: a [SEG] was emitted
    # decode forwards taken (scalar; speculative path only, else None)
    decode_steps: jnp.ndarray = None


def evaluate_fn(model: LisaModel, params, images_sam, images_clip,
                input_ids, attention_mask, max_new_tokens: int,
                eos_id: int, kv_cache_8bit: bool = False,
                draft_corpus=None, corpus_lengths=None,
                draft_len: int = 8) -> EvaluateResult:
    """images_*: (B, ...) preprocessed; input_ids (B, L) with
    IMAGE_TOKEN_INDEX; attention_mask (B, L) 1 = real (right padding).

    With `draft_corpus` ((B, C) int32, e.g. the tokenized ANSWER_LIST
    templates via generate.make_lookup_corpus), decode runs
    prompt-lookup speculative decoding (generate.speculative_generate)
    instead of one forward per token — same greedy output, fewer
    decode steps. Llama decoder only."""
    cfg = model.cfg

    clip_emb = model.apply(params, images_clip, method="encode_clip")
    tok = model.apply(params, input_ids, method="embed_tokens")
    img_pos = find_image_position(input_ids)
    sp = splice_image_embeddings(
        tok, clip_emb, img_pos, input_ids, None, attention_mask,
        seg_token_idx=cfg.seg_token_idx)
    prompt_lengths = jnp.sum(sp.segment_ids, axis=1)

    def embed_fn(tokens):
        return model.apply(params, tokens, method="embed_tokens")

    def llm_fn(emb, pos, seg, caches, idx, kvseg):
        return model.apply(params, emb, pos, seg, caches, idx, kvseg,
                           method="llm_forward")

    if draft_corpus is not None:
        if cfg.decoder == "mpt":
            raise ValueError(
                "speculative decoding is wired for the llama decoder "
                "only (MPT attention has no chunked cache-verify mode)")
        b = input_ids.shape[0]
        draft_corpus = jnp.asarray(draft_corpus, jnp.int32)
        if draft_corpus.ndim == 1:
            draft_corpus = draft_corpus[None]
        if draft_corpus.shape[0] != b:  # shared (1, C) template corpus
            draft_corpus = jnp.broadcast_to(
                draft_corpus, (b, draft_corpus.shape[1]))
        if corpus_lengths is not None:
            corpus_lengths = jnp.asarray(corpus_lengths,
                                         jnp.int32).reshape(-1)
            if corpus_lengths.shape[0] == 1:
                corpus_lengths = jnp.broadcast_to(corpus_lengths, (b,))
            elif corpus_lengths.shape[0] != b:
                raise ValueError(
                    f"corpus_lengths batch {corpus_lengths.shape[0]} "
                    f"!= input batch {b} (pass 1 shared length or one "
                    "per row)")
        gen = speculative_generate(
            cfg.llama, embed_fn, llm_fn, sp.embeds, sp.positions,
            sp.segment_ids, prompt_lengths, max_new_tokens, eos_id,
            draft_corpus, corpus_lengths, draft_len,
            kv_cache_8bit=kv_cache_8bit)
    else:
        gen = greedy_generate(
            cfg.llama, embed_fn, llm_fn, sp.embeds, sp.positions,
            sp.segment_ids, prompt_lengths, max_new_tokens, eos_id,
            kv_cache_8bit=kv_cache_8bit)

    # [SEG] gather: first emitted [SEG] token's source hidden state.
    is_seg = (gen.tokens == cfg.seg_token_idx) & (
        jnp.arange(max_new_tokens)[None, :] < gen.lengths[:, None])
    seg_found = is_seg.any(axis=1)
    first = jnp.argmax(is_seg, axis=1)
    seg_hidden = jnp.take_along_axis(
        gen.hiddens, first[:, None, None], axis=1)           # (B, 1, E)
    seg_emb = model.apply(params, seg_hidden, method="project_seg")
    seg_emb = seg_emb * seg_found[:, None, None]

    sam_emb = model.apply(params, images_sam, method="encode_sam")
    masks_l, masks_r, iou_l, iou_r, taxonomy = model.apply(
        params, sam_emb, seg_emb, method="decode_masks")
    S = cfg.sam_encoder.image_size
    pred_l = postprocess_masks_padded(masks_l, S)[:, 0]
    pred_r = postprocess_masks_padded(masks_r, S)[:, 0]

    return EvaluateResult(
        output_ids=gen.tokens, gen_lengths=gen.lengths,
        pred_masks_left=pred_l, pred_masks_right=pred_r,
        taxonomies=taxonomy, seg_found=seg_found,
        decode_steps=gen.steps)


def make_jitted_evaluate(model: LisaModel, max_new_tokens: int,
                         eos_id: int, quant_scales=None,
                         quant_dtype=jnp.bfloat16,
                         kv_cache_8bit: bool = False,
                         draft_corpus=None, corpus_lengths=None,
                         draft_len: int = 8):
    """Returns evaluate(params, images_sam, images_clip, input_ids,
    attention_mask) jitted with static generation length.

    With `quant_scales` (from nn/quant.quantize_tree over the same
    param tree), `params` holds int8 kernels for the selected layers;
    they are dequantized to `quant_dtype` inside the jit, so the weights
    live int8 in HBM (the TPU analog of the reference's bitsandbytes
    serving path, inference.py:133-156)."""

    @jax.jit
    def _eval(params, images_sam, images_clip, input_ids, attention_mask):
        if quant_scales is not None:
            from ..nn.quant import dequantize_tree

            params = dequantize_tree(params, quant_scales, quant_dtype)
        return evaluate_fn(model, params, images_sam, images_clip,
                           input_ids, attention_mask, max_new_tokens,
                           eos_id, kv_cache_8bit=kv_cache_8bit,
                           draft_corpus=draft_corpus,
                           corpus_lengths=corpus_lengths,
                           draft_len=draft_len)

    return _eval


def _resize_nearest(mask, gh: int, gw: int):
    """Nearest-neighbour binary-mask resample to (gh, gw)."""
    import cv2
    import numpy as np

    return cv2.resize(np.asarray(mask, np.uint8), (gw, gh),
                      interpolation=cv2.INTER_NEAREST)


def validate_on_benchmark(model: LisaModel, variables, tok, val_ds, *,
                          val_batch_size: int = 1,
                          model_max_length: int = 575,
                          conv_type: str = "llava_v1",
                          use_mm_start_end: bool = True,
                          max_new_tokens: int = 32):
    """Reference validate() protocol (train_ds.py:625-758): batched
    jitted evaluate over a benchmark walker, taxonomy-argmax mask
    gating, binarize at 0, union IoU/IoCM per frame; predictions are
    resized RAW to the GT canvas when the benchmark keeps GT at the
    square frame resolution (calculate_iou.py:212-234 convention).

    Shared by the training CLI's per-epoch validation and the
    trained-checkpoint accuracy tests; `variables` is a full {"params":
    ...} dict — in-tree quantized kernels (QDense) serve as-is. Returns
    (mean IoU, mean IoCM, per-frame list)."""
    import numpy as np

    from ..data.collate import collate_affordance
    from ..eval.metrics import union_metrics
    from ..nn.sam import resize_to_original

    cfg = model.cfg
    ev = make_jitted_evaluate(model, max_new_tokens=max_new_tokens,
                              eos_id=tok.eos_token_id)
    ious, iocms, frames = [], [], []
    VB = max(1, val_batch_size)
    for start in range(0, len(val_ds), VB):
        samples = [val_ds[i][0] for i in
                   range(start, min(start + VB, len(val_ds)))]
        pad = VB - len(samples)
        vb = collate_affordance(
            samples + [samples[-1]] * pad, tok,
            sam_image_size=cfg.sam_encoder.image_size,
            clip_image_size=cfg.clip.image_size,
            max_text_len=model_max_length, conv_type=conv_type,
            use_mm_start_end=use_mm_start_end, for_training=False)
        res = ev(variables,
                 jnp.asarray(vb["images_sam"]),
                 jnp.asarray(vb["images_clip"]),
                 jnp.asarray(vb["input_ids"]),
                 jnp.asarray(vb["attention_mask"]))
        ml_all = np.asarray(res.pred_masks_left)
        mr_all = np.asarray(res.pred_masks_right)
        tax_all = np.asarray(res.taxonomies)
        for i, sample in enumerate(samples):
            rh, rw = vb["resizes"][i]
            orig = sample.image.shape[:2]
            ml = resize_to_original(ml_all[i:i + 1], (rh, rw), orig)[0]
            mr = resize_to_original(mr_all[i:i + 1], (rh, rw), orig)[0]
            gl, gr = sample.mask_left, sample.mask_right
            gh, gw = max(gl.shape, gr.shape, key=lambda s: s[0] * s[1])
            # A missing hand comes through as an all-zero mask whose
            # canvas may differ from the other hand's; a REAL mask at a
            # different resolution must be resampled, not discarded
            # (ADVICE r4 finding 2).
            if gl.shape != (gh, gw):
                gl = (np.zeros((gh, gw), np.uint8) if not gl.any() else
                      _resize_nearest(gl, gh, gw))
            if gr.shape != (gh, gw):
                gr = (np.zeros((gh, gw), np.uint8) if not gr.any() else
                      _resize_nearest(gr, gh, gw))
            if tuple(orig) != (gh, gw):
                import cv2

                ml = cv2.resize(np.asarray(ml, np.float32), (gw, gh))
                mr = cv2.resize(np.asarray(mr, np.float32), (gw, gh))
            tax = int(np.argmax(tax_all[i]))
            pl_ = (ml > 0).astype(np.uint8)
            pr_ = (mr > 0).astype(np.uint8)
            if tax == 0:
                pr_[:] = 0
            elif tax == 1:
                pl_[:] = 0
            m = union_metrics(pl_, pr_, gl, gr)
            ious.append(m["iou"])
            iocms.append(m["iocm"])
            frames.append(dict(iou=m["iou"], iocm=m["iocm"], tax=tax))
    return float(np.mean(ious)), float(np.mean(iocms)), frames
