"""Streaming clip inference: on-device preprocessing + chunked evaluate."""

import jax
import numpy as np

from haff_tpu.core.config import ModelConfig
from haff_tpu.data.tokenizer import ByteTokenizer, seg_token_idx
from haff_tpu.infer.streaming import StreamingPipeline
from haff_tpu.model.lisa import LisaModel


def test_streaming_clip():
    import sys
    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    tok = ByteTokenizer()
    cfg = ModelConfig.preset("tiny").replace(seg_token_idx=seg_token_idx(tok))
    model = LisaModel(cfg=cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 make_tiny_batch(cfg))

    pipe = StreamingPipeline(model, params, tok, "open drawer", chunk=3,
                             max_new_tokens=2, max_text_len=448)
    frames = (np.random.RandomState(0).rand(7, 60, 90, 3) * 255).astype(
        np.uint8)
    chunks = list(pipe.run(frames))
    assert [c["start"] for c in chunks] == [0, 3, 6]
    total = sum(c["masks_left"].shape[0] for c in chunks)
    assert total == 7
    S = cfg.sam_encoder.image_size
    assert chunks[0]["masks_left"].shape[1:] == (S, S)
    assert chunks[-1]["taxonomies"].shape == (1, 4)
    rh, rw = chunks[0]["resize_hw"]
    assert rw == S and rh < S  # landscape frame resized longest-side
