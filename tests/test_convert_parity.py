"""Numeric parity vs HF torch reference models (tiny random configs,
weights converted with tools/convert_weights.py). This is the strongest
correctness evidence available without network access: the same math must
come out of flax/XLA as out of torch."""

import numpy as np
import pytest
import torch

from haff_tpu.core.config import ClipVisionConfig, LlamaConfig
from haff_tpu.tools.convert_weights import (
    convert_clip,
    convert_llama,
    merge_into_init,
    t_convT,
)


def test_clip_tower_matches_hf():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64,
                   num_hidden_layers=3, num_attention_heads=2,
                   image_size=32, patch_size=16, hidden_act="quick_gelu")
    hf = CLIPVisionModel(hf_cfg).eval()

    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.clip_vit import ClipVisionTower

    cfg = ClipVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                           intermediate_size=64, num_layers=3, num_heads=2,
                           select_layer=-2)
    model = ClipVisionTower(cfg=cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    num_used = cfg.num_layers + cfg.select_layer + 1  # 2
    conv = convert_clip(sd, num_used)
    params = merge_into_init(init, conv)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(x).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    # reference feature_select: hidden_states[-2][:, 1:]
    theirs = out.hidden_states[-2][:, 1:].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_llama_matches_hf():
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM

    torch.manual_seed(1)
    hf_cfg = HFCfg(vocab_size=128, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=2,
                   num_key_value_heads=2, max_position_embeddings=64,
                   rms_norm_eps=1e-6, rope_theta=10000.0,
                   attention_bias=False, tie_word_embeddings=False)
    hf = LlamaForCausalLM(hf_cfg).eval()

    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.llama import LlamaForCausalLM as OurLlama

    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      head_dim=16, max_seq_len=64)
    model = OurLlama(cfg=cfg)
    ids = np.random.RandomState(2).randint(0, 128, (2, 16)).astype(np.int32)
    pos = jnp.broadcast_to(jnp.arange(16)[None], (2, 16))
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), pos,
                      method="init_all")["params"]

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    conv = convert_llama(sd, num_layers=2)
    params = merge_into_init(init, conv)

    emb = model.apply({"params": params}, jnp.asarray(ids), method="embed")
    logits, hidden, _ = model.apply({"params": params}, emb, pos,
                                    jnp.ones((2, 16), jnp.int32))

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                 output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(hidden),
                               out.hidden_states[-1].numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_conv_transpose_matches_torch():
    """flax ConvTranspose + t_convT must reproduce torch ConvTranspose2d
    (the SAM mask-decoder upscaler)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    torch.manual_seed(3)
    tconv = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = np.random.RandomState(4).randn(2, 6, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)

    m = nn.ConvTranspose(4, (2, 2), strides=(2, 2), transpose_kernel=True)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = {"kernel": jnp.asarray(t_convT(tconv.weight.detach().numpy())),
              "bias": jnp.asarray(tconv.bias.detach().numpy())}
    ours = np.asarray(m.apply({"params": params}, xj))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_parity_dry_run_7b_shipped_shapes():
    """Key-map/vocab drift gate at the SHIPPED sjauhri/2HAff shapes
    (VERDICT r5 item 8): every key of a shape-exact 7B-layout synthetic
    checkpoint (HF meta-init key names: LLaMA-7B vocab 32004 + ViT-H SAM
    with dual decoders + taxonomy head + projector/text_fcs) must be
    consumed by convert_2haff and land in the real 7B init tree
    (jax.eval_shape) with matching shapes; and every non-LoRA/non-CLIP
    init param must be covered. Subprocess: ~8 GB of lazily-zero pages
    and an independent jax platform."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "haff_tpu.tools.parity_check",
         "--dry_run_7b"],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS dry_run_7b" in proc.stdout
