"""Video-clip streaming inference (BASELINE config 3: 30-frame egocentric
clip -> per-frame bimanual masks).

Capability parity with the reference's frame-by-frame protocol
(ActAffordance/scripts/data_processing/preprocess_video.py explodes clips
into independent frames; inference.py walks them) — redesigned as a
streaming pipeline: raw frames ship to the device whole, resize/pad/
normalize run ON DEVICE inside the same jit as the model
(data/transforms.device_* — the BASELINE 'hot transforms'), a background
thread keeps the next chunk in flight (double-buffered prefetch), and the
prompt is tokenized once per clip (one narration -> identical prompt for
every frame).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np


class StreamingPipeline:
    def __init__(self, model, params, tokenizer, narration: str,
                 chunk: int = 8, max_new_tokens: int = 16,
                 max_text_len: int = 320):
        import jax
        import jax.numpy as jnp

        from ..core.config import IGNORE_INDEX
        from ..data.prompts import INFERENCE_QUESTION
        from ..data.collate import tokenize_conversation
        from ..data.transforms import (
            device_clip_preprocess,
            device_sam_preprocess,
            get_preprocess_shape,
        )
        from .evaluate import evaluate_fn

        self.chunk = chunk
        cfg = model.cfg
        # Same prompt convention as the batch CLI / reference
        # inference.py: bare tokenization, narration casing kept.
        q = INFERENCE_QUESTION.format(class_name=narration)
        ids, _ = tokenize_conversation(q, None, tokenizer,
                                       use_template=False)
        ids = ids[:max_text_len]
        input_ids = np.zeros((chunk, max_text_len), np.int32)
        attn = np.zeros((chunk, max_text_len), np.int32)
        input_ids[:, :len(ids)] = ids
        attn[:, :len(ids)] = 1
        self._ids = jnp.asarray(input_ids)
        self._attn = jnp.asarray(attn)
        S = cfg.sam_encoder.image_size

        def step(params, frames):  # frames (chunk, H, W, 3) uint8
            sam_in, resize_hw = device_sam_preprocess(frames, S)
            clip_in = device_clip_preprocess(frames, cfg.clip.image_size)
            res = evaluate_fn(model, params, sam_in, clip_in, self._ids,
                              self._attn, max_new_tokens,
                              tokenizer.eos_token_id)
            return (res.pred_masks_left, res.pred_masks_right,
                    res.taxonomies)

        self._step = jax.jit(step)
        self._params = params
        self._get_shape = get_preprocess_shape
        self._S = S

    def run(self, frames: np.ndarray) -> Iterator[dict]:
        """frames: (N, H, W, 3) uint8 RGB, constant H/W per clip. Yields
        per-chunk dicts with canvas-space mask logits + taxonomy; host
        thread keeps the next chunk staged while the device computes."""
        n = frames.shape[0]
        h, w = frames.shape[1:3]
        rh, rw = self._get_shape(h, w, self._S)

        q: queue.Queue = queue.Queue(maxsize=2)

        def feed():
            import jax.numpy as jnp

            for s in range(0, n, self.chunk):
                block = frames[s:s + self.chunk]
                pad = self.chunk - block.shape[0]
                if pad:
                    block = np.concatenate(
                        [block, np.repeat(block[-1:], pad, 0)])
                q.put((s, jnp.asarray(block), block.shape[0] - pad))
            q.put(None)

        threading.Thread(target=feed, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                return
            start, block, valid = item
            ml, mr, tax = self._step(self._params, block)
            yield dict(start=start,
                       masks_left=np.asarray(ml)[:valid],
                       masks_right=np.asarray(mr)[:valid],
                       taxonomies=np.asarray(tax)[:valid],
                       resize_hw=(rh, rw))
