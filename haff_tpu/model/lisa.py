"""The composite 2Haff model: CLIP ViT-L tower + LLaMA decoder emitting
[SEG] + SAM backbone with dual (left/right) prompted mask decoders and a
4-way taxonomy head.

Capability parity with reference 2Haff/model/LISA.py (LISAForCausalLM),
re-designed TPU-first:

  * train_forward is ONE jitted function: batched SAM encode (the
    reference loops images one-by-one under no_grad, LISA.py:157-168),
    static-shape multimodal splice (multimodal.py replaces
    llava_arch.py:98-347), vectorized [SEG] gather (replaces the
    offset-based Python loop LISA.py:258-278), batched dual mask decode,
    and the full gated loss stack.
  * unique images are encoded once and expanded to conversations via
    `image_index` gather (replaces the expand/cat loop LISA.py:234-245).
  * `sample_weight` rows handle padded batches (static batch shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..nn.clip_vit import ClipVisionTower
from ..nn.llama import LlamaForCausalLM
from ..nn.sam import Sam, postprocess_masks_padded
from . import losses as L
from .multimodal import (
    find_image_position,
    gather_seg_embeddings,
    splice_image_embeddings,
)


class TrainBatch(NamedTuple):
    """Static-shape training batch (produced by data/collate.py)."""

    images_sam: jnp.ndarray      # (B_img, S, S, 3) SAM-preprocessed
    images_clip: jnp.ndarray     # (B_img, 224, 224, 3) CLIP-preprocessed
    image_index: jnp.ndarray     # (B,) conversation -> image row
    input_ids: jnp.ndarray       # (B, L) with IMAGE_TOKEN_INDEX
    labels: jnp.ndarray          # (B, L) IGNORE_INDEX-masked targets
    attention_mask: jnp.ndarray  # (B, L) 1 = real token
    masks_left: jnp.ndarray      # (B, S, S) binary on SAM canvas
    masks_right: jnp.ndarray     # (B, S, S)
    taxonomies: jnp.ndarray      # (B, 4)
    valid_region: jnp.ndarray    # (B, S, S) 1 inside the resized frame
    sample_weight: jnp.ndarray   # (B,) 1 = real sample


class LisaOutputs(NamedTuple):
    loss: jnp.ndarray
    ce_loss: jnp.ndarray
    mask_bce_loss: jnp.ndarray
    mask_dice_loss: jnp.ndarray
    taxonomy_ce_loss: jnp.ndarray
    pred_masks_left: jnp.ndarray   # (B, S, S) logits on canvas
    pred_masks_right: jnp.ndarray
    pred_taxonomies: jnp.ndarray   # (B, 4)


class LisaModel(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        if cfg.decoder == "mpt":
            # Alternative MPT backend (reference llava_mpt.py): same
            # (logits, hidden, caches) interface; ALiBi ignores positions.
            from ..nn.mpt import MptConfig, MptForCausalLM

            mpt_cfg = MptConfig(
                vocab_size=cfg.llama.vocab_size,
                d_model=cfg.llama.hidden_size,
                n_heads=cfg.llama.num_heads,
                n_layers=cfg.llama.num_layers,
                max_seq_len=cfg.llama.max_seq_len)
            self.llm = MptForCausalLM(
                cfg=mpt_cfg, dtype=self.dtype,
                param_dtype=self.param_dtype, name="llm")
        else:
            self.llm = LlamaForCausalLM(
                cfg=cfg.llama, dtype=self.dtype,
                param_dtype=self.param_dtype, remat=self.remat,
                name="llm")
        self.vision_tower = ClipVisionTower(
            cfg=cfg.clip, dtype=self.dtype, param_dtype=self.param_dtype,
            name="vision_tower")
        self.mm_projector = nn.Dense(
            cfg.llama.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mm_projector")
        self.visual_model = Sam(
            encoder_cfg=cfg.sam_encoder, decoder_cfg=cfg.sam_decoder,
            dtype=self.dtype, param_dtype=self.param_dtype,
            remat=self.remat, name="visual_model")
        # [SEG] projection MLP (reference LISA.py:91-104: hidden -> hidden,
        # ReLU, hidden -> out_dim, Dropout(0.0)).
        self.text_fc1 = nn.Dense(cfg.llama.hidden_size, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="text_fc1")
        self.text_fc2 = nn.Dense(cfg.out_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="text_fc2")

    # ----- submodule drivers (exposed for inference/partial eval) -----

    def encode_clip(self, images_clip):
        feats = self.vision_tower(images_clip)
        return self.mm_projector(feats)  # (B, P, hidden)

    def encode_sam(self, images_sam):
        return self.visual_model.encode_image(images_sam)

    def project_seg(self, hidden):
        return self.text_fc2(nn.relu(self.text_fc1(hidden)))

    def decode_masks(self, sam_embeddings, seg_embeds):
        return self.visual_model.decode_masks(sam_embeddings, seg_embeds)

    def llm_forward(self, inputs_embeds, positions, segment_ids=None,
                    kv_caches=None, cache_index=None,
                    cache_kv_segment_ids=None, deterministic=True):
        return self.llm(inputs_embeds, positions, segment_ids, kv_caches,
                        cache_index, cache_kv_segment_ids, deterministic)

    def embed_tokens(self, input_ids):
        safe = jnp.maximum(input_ids, 0)  # IMAGE_TOKEN_INDEX -> slot 0
        return self.llm.embed(safe)

    # ----- the jitted training/validation forward -----
    #
    # __call__ is split into splice_inputs / finish_outputs around the
    # decoder so parallel/pipeline.py can run the SAME pre/post code
    # with the block stack pipelined over a `pipe` mesh axis.

    def splice_inputs(self, batch: TrainBatch):
        """Steps 1-2a: vision encoders + multimodal splice. Returns
        (sam_embeddings expanded to conversations, SpliceOutputs)."""
        cfg = self.cfg
        # 1. vision encoders over UNIQUE images, then expand.
        sam_emb = self.encode_sam(batch.images_sam)        # (B_img, g, g, 256)
        clip_emb = self.encode_clip(batch.images_clip)     # (B_img, P, hid)
        sam_emb = sam_emb[batch.image_index]
        clip_emb = clip_emb[batch.image_index]

        # 2. splice.
        tok = self.embed_tokens(batch.input_ids)
        img_pos = find_image_position(batch.input_ids)
        sp = splice_image_embeddings(
            tok, clip_emb, img_pos, batch.input_ids, batch.labels,
            batch.attention_mask, seg_token_idx=cfg.seg_token_idx)
        return sam_emb, sp

    def __call__(self, batch: TrainBatch,
                 deterministic: bool = True) -> LisaOutputs:
        sam_emb, sp = self.splice_inputs(batch)
        logits, hidden, _ = self.llm_forward(
            sp.embeds, sp.positions, sp.segment_ids,
            deterministic=deterministic)
        return self.finish_outputs(batch, sam_emb, sp, logits, hidden)

    def finish_outputs(self, batch: TrainBatch, sam_emb, sp, logits,
                       hidden) -> LisaOutputs:
        """Steps 3-5: [SEG] gather, dual mask decode, loss stack."""
        cfg = self.cfg
        # 3. [SEG] gather + projection.
        proj = self.project_seg(hidden)                    # (B, L, out_dim)
        seg_emb, seg_valid = gather_seg_embeddings(
            proj, sp.seg_token_mask,
            max_segs=cfg.max_seg_tokens)             # (B, max_segs, out_dim)

        # 4. dual mask decode + canvas upsample.
        masks_l, masks_r, iou_l, iou_r, taxonomy = self.decode_masks(
            sam_emb, seg_emb)
        S = cfg.sam_encoder.image_size
        pred_l = postprocess_masks_padded(masks_l, S)[:, 0]  # (B, S, S)
        pred_r = postprocess_masks_padded(masks_r, S)[:, 0]

        # 5. losses.
        weight = batch.sample_weight * seg_valid[:, 0].astype(jnp.float32)
        lm_labels = jnp.where(
            batch.sample_weight[:, None] > 0, sp.labels, -100)
        ce = L.language_model_loss(logits, lm_labels) * cfg.ce_loss_weight
        bce, dice = L.bimanual_mask_losses(
            pred_l, pred_r, batch.masks_left, batch.masks_right,
            batch.taxonomies, valid=batch.valid_region,
            sample_weight=weight, bce_weight=cfg.bce_loss_weight,
            dice_weight=cfg.dice_loss_weight)
        tax_ce = L.taxonomy_ce_loss(taxonomy, batch.taxonomies,
                                    sample_weight=weight,
                                    logit_ce=cfg.taxonomy_logit_ce)

        total = ce + bce + dice + tax_ce
        return LisaOutputs(
            loss=total, ce_loss=ce, mask_bce_loss=bce, mask_dice_loss=dice,
            taxonomy_ce_loss=tax_ce, pred_masks_left=pred_l,
            pred_masks_right=pred_r, pred_taxonomies=taxonomy)
