"""Single-frame predictor shared by chat / robot / app entry points.

Wraps model build + jitted evaluate into a call:
    predictor(image_rgb_uint8, text_prompt) ->
        (answer_text, mask_left_logits, mask_right_logits, taxonomy)
with masks at the frame's original resolution (reference: the common
core of chat.py:154-269, robot_demo.py:178-336, app.py:206-331).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class Predictor:
    def __init__(self, model_preset: str = "7b",
                 decoder: str = "llama",
                 checkpoint: Optional[str] = None,
                 tokenizer: Optional[str] = None, precision: str = "bf16",
                 max_new_tokens: int = 32, max_text_len: int = 320,
                 load_in_8bit: bool = False, load_in_4bit: bool = False,
                 kv_cache_8bit: bool = False,
                 conv_type: str = "llava_v1",
                 use_mm_start_end: bool = True,
                 use_template: bool = True,
                 speculative: bool = False,
                 draft_len: int = 8):
        import jax
        import jax.numpy as jnp

        from ..core.config import ModelConfig
        from ..data.collate import collate_affordance
        from ..data.tokenizer import load_tokenizer, seg_token_idx
        from ..model.lisa import LisaModel, TrainBatch
        from .evaluate import make_jitted_evaluate

        self._collate = collate_affordance
        self.tok = load_tokenizer(tokenizer, model_max_length=max_text_len)
        self.cfg = ModelConfig.preset(model_preset).replace(
            seg_token_idx=seg_token_idx(self.tok), decoder=decoder)
        self.max_text_len = max_text_len
        self.conv_type = conv_type
        self.use_mm_start_end = use_mm_start_end
        self.use_template = use_template
        dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        self.model = LisaModel(cfg=self.cfg, dtype=dtype)

        import jax.numpy as jnp  # noqa: F811

        dummy = np.zeros((32, 32, 3), np.uint8)
        from ..data.collate import Sample

        b0 = collate_affordance(
            [Sample(image=dummy, question="<image>\nx", answer=None)],
            self.tok, sam_image_size=self.cfg.sam_encoder.image_size,
            clip_image_size=self.cfg.clip.image_size,
            max_text_len=max_text_len, conv_type=conv_type,
            use_mm_start_end=use_mm_start_end,
            use_template=use_template, for_training=False)
        tb0 = TrainBatch(**{k: jnp.asarray(v) for k, v in b0.items()
                            if k != "resizes"})
        self.params = None
        if checkpoint and (load_in_8bit or load_in_4bit):
            # Flagship quantized serving: NEVER materialize the float
            # model on device (7B/13B bf16 busts a 16 GB chip before the
            # quantizer runs). Bare-params checkpoints (convert_cli /
            # merge_lora exports) restore to host numpy; only quantized
            # kernels + small scales reach the device.
            import os

            from ..train.checkpoints import latest_step, restore_params_host

            if (latest_step(checkpoint) is None and os.path.exists(
                    os.path.join(checkpoint, "_CHECKPOINT_METADATA"))):
                shapes = jax.eval_shape(
                    self.model.init, jax.random.PRNGKey(0), tb0)
                host = restore_params_host(checkpoint, shapes["params"])
                if dtype == jnp.bfloat16:
                    # big float leaves (SAM/CLIP towers, embeddings) go
                    # to the device in the compute dtype — the modules
                    # cast to bf16 at use anyway, so this is compute-
                    # identical at half the HBM (same rule as
                    # nn.quant.random_quantized_like big_bf16)
                    host = jax.tree_util.tree_map(
                        lambda a: (a.astype(jnp.bfloat16)
                                   if (hasattr(a, "dtype")
                                       and np.issubdtype(a.dtype,
                                                         np.floating)
                                       and a.size > 1_000_000) else a),
                        host)
                self.params = {"params": host}
        if self.params is None:
            self.params = jax.jit(self.model.init)(jax.random.PRNGKey(0), tb0)
            if checkpoint:
                from ..train.checkpoints import restore_checkpoint

                self.params, _ = restore_checkpoint(checkpoint, self.params)
        scales = None
        if load_in_4bit:
            # W4A16 in-tree packed nibbles: QDense dequantizes per layer
            # (transient bf16 one kernel at a time), unlike the old
            # quantize_tree path which dequantized the whole tree inside
            # every jit call.
            from ..nn.quant import default_llm_predicate, quantize_dense_tree

            self.params = quantize_dense_tree(
                self.params, default_llm_predicate, bits=4)
        elif load_in_8bit:
            # W8A8: int8 kernels + in-tree scales; QDense runs the
            # int8-MXU matmul directly — no per-step dequant (the old
            # quantize_tree path dequantized inside every jit call).
            from ..nn.quant import (lisa_serving_predicate,
                                    quantize_dense_tree)

            self.params = quantize_dense_tree(
                self.params, lisa_serving_predicate)
        # place the serving tree on device ONCE: host-restored numpy
        # leaves would otherwise re-upload host->device on EVERY
        # evaluate call (gigabytes per request at flagship scale)
        self.params = jax.device_put(self.params)
        corpus = lens = None
        if speculative:
            # Prompt-lookup speculative decoding drafted from the
            # ANSWER_LIST templates — exact greedy output, fewer decode
            # forwards (infer/generate.py speculative_generate).
            if decoder == "mpt":
                raise ValueError(
                    "speculative decoding requires the llama decoder "
                    "(the MPT attention has no chunked cache-verify "
                    "mode)")
            from .generate import answer_template_corpus

            corpus, lens = answer_template_corpus(self.tok)
        self._eval = make_jitted_evaluate(
            self.model, max_new_tokens=max_new_tokens,
            eos_id=self.tok.eos_token_id, quant_scales=scales,
            quant_dtype=dtype, kv_cache_8bit=kv_cache_8bit,
            draft_corpus=corpus, corpus_lengths=lens,
            draft_len=draft_len)

    def predict_batch(self, images, prompts):
        """Batched inference: lists of RGB uint8 frames + text prompts ->
        list of (answer, mask_left, mask_right, taxonomy) tuples, masks
        at each frame's original resolution. One jitted evaluate per
        call — the micro-batching entry used by infer.server (shapes are
        static per batch size, so a serving deployment compiles once per
        bucket)."""
        import jax.numpy as jnp

        from ..data.collate import Sample
        from ..nn.sam import resize_to_original

        samples = [
            Sample(image=img,
                   question=(p if "<image>" in p else ("<image>\n" + p)),
                   answer=None)
            for img, p in zip(images, prompts)]
        batch = self._collate(
            samples,
            self.tok, sam_image_size=self.cfg.sam_encoder.image_size,
            clip_image_size=self.cfg.clip.image_size,
            max_text_len=self.max_text_len, conv_type=self.conv_type,
            use_mm_start_end=self.use_mm_start_end,
            use_template=self.use_template, for_training=False)
        res = self._eval(self.params,
                         jnp.asarray(batch["images_sam"]),
                         jnp.asarray(batch["images_clip"]),
                         jnp.asarray(batch["input_ids"]),
                         jnp.asarray(batch["attention_mask"]))
        out_ids = np.asarray(res.output_ids)
        gen_lengths = np.asarray(res.gen_lengths)
        ml_all = np.asarray(res.pred_masks_left, np.float32)
        mr_all = np.asarray(res.pred_masks_right, np.float32)
        tax_all = np.asarray(res.taxonomies)
        results = []
        for i, img in enumerate(images):
            text = self.tok.decode(
                [t for t in out_ids[i][:int(gen_lengths[i])] if t >= 0])
            rh, rw = batch["resizes"][i]
            orig = img.shape[:2]
            ml = resize_to_original(ml_all[i:i + 1], (rh, rw), orig)[0]
            mr = resize_to_original(mr_all[i:i + 1], (rh, rw), orig)[0]
            results.append((text, ml, mr, tax_all[i]))
        return results

    def __call__(self, image: np.ndarray, prompt: str
                 ) -> Tuple[str, np.ndarray, np.ndarray, np.ndarray]:
        return self.predict_batch([image], [prompt])[0]
