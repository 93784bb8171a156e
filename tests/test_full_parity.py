"""Full-path mid-size parity vs a torch composite built from HF modules.

The strongest offline proxy for the reference's >=95% mask-IoU gate vs
the sjauhri/2HAff hub checkpoint (reference 2Haff/README.md:9, which is
unfetchable here): build a mid-size torch LISA from HF pieces (Llama +
CLIP vision + SamModel + projector/text-fc linears), convert every
weight with tools/convert_weights.py, then run BOTH sides' COMPLETE
evaluate path — embed -> CLIP splice -> greedy decode w/ hidden capture
-> [SEG] gather -> text_hidden_fcs -> prompt-encode -> dual SAM decode
-> taxonomy -> canvas upsample — and assert token-identical output ids
and tight fp32 mask agreement END TO END (not per-module).

The torch side is an independent harness written to the reference's
verified semantics (LISA.py:432-534 evaluate, :195-207 predecessor-
hidden [SEG] convention), NOT a vendored copy; HF modules supply the
heavy math.
"""

import numpy as np
import pytest
import torch

from haff_tpu.core.config import (
    ClipVisionConfig,
    IMAGE_TOKEN_INDEX,
    LlamaConfig,
    ModelConfig,
    SamDecoderConfig,
    SamEncoderConfig,
)
from haff_tpu.tools.convert_weights import (
    convert_clip,
    convert_llama,
    convert_sam,
    hf_sam_to_original,
    merge_into_init,
    t_linear,
    merge_into_init as _merge,
)

B = 2
PROMPT_LEN = 24
MAX_NEW = 6
EOS_ID = 2
IMG_POS = 2  # slot of IMAGE_TOKEN_INDEX in the prompt


def _mid_torch_models():
    from transformers import CLIPVisionConfig as HFClipCfg
    from transformers import CLIPVisionModel
    from transformers import LlamaConfig as HFLlamaCfg
    from transformers import LlamaForCausalLM
    from transformers import SamConfig, SamModel

    torch.manual_seed(0)
    hf_llama = LlamaForCausalLM(HFLlamaCfg(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)).eval()
    hf_clip = CLIPVisionModel(HFClipCfg(
        hidden_size=128, intermediate_size=256, num_hidden_layers=4,
        num_attention_heads=2, image_size=64, patch_size=16,
        hidden_act="quick_gelu")).eval()

    scfg = SamConfig()
    v = scfg.vision_config
    v.hidden_size = 128
    v.num_hidden_layers = 4
    v.num_attention_heads = 2
    v.mlp_dim = 256
    v.image_size = 128
    v.patch_size = 16
    v.window_size = 4
    v.global_attn_indexes = [3]
    v.output_channels = 128
    v.num_pos_feats = 64
    scfg.prompt_encoder_config.hidden_size = 128
    scfg.prompt_encoder_config.image_size = 128
    scfg.prompt_encoder_config.patch_size = 16
    scfg.prompt_encoder_config.image_embedding_size = 8
    scfg.mask_decoder_config.hidden_size = 128
    scfg.mask_decoder_config.mlp_dim = 256
    scfg.mask_decoder_config.iou_head_hidden_dim = 128
    hf_sam = SamModel(scfg).eval()

    mm = torch.nn.Linear(128, 256)
    fc1 = torch.nn.Linear(256, 256)
    fc2 = torch.nn.Linear(256, 128)
    return hf_llama, hf_clip, hf_sam, mm, fc1, fc2


def _our_cfg(seg_token_idx: int) -> ModelConfig:
    return ModelConfig(
        llama=LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=4, num_heads=4, num_kv_heads=4, head_dim=64,
            max_seq_len=64),
        clip=ClipVisionConfig(
            image_size=64, patch_size=16, hidden_size=128,
            intermediate_size=256, num_layers=4, num_heads=2,
            select_layer=-2),
        sam_encoder=SamEncoderConfig(
            image_size=128, patch_size=16, embed_dim=128, depth=4,
            num_heads=2, mlp_ratio=2.0, out_chans=128, window_size=4,
            global_attn_indexes=(3,)),
        sam_decoder=SamDecoderConfig(
            prompt_embed_dim=128, transformer_mlp_dim=256,
            iou_head_hidden_dim=128, mask_in_chans=16),
        out_dim=128, seg_token_idx=seg_token_idx, dtype="float32")


def _torch_greedy(hf_llama, spliced, max_new, eos_id):
    """Reference-semantics greedy loop (no KV cache; positions implicit):
    at each step the recorded hidden is the last-layer state at the last
    input position — the state that PRODUCED the emitted token (LISA.py
    predecessor-hidden convention). After a row emits EOS, its tokens are
    pinned to EOS (matching infer/generate.greedy_generate)."""
    done = torch.zeros(B, dtype=torch.bool)
    toks, hids, was_done = [], [], []
    cur = spliced
    for _ in range(max_new):
        out = hf_llama(inputs_embeds=cur, output_hidden_states=True)
        h_last = out.hidden_states[-1][:, -1]
        tok = out.logits[:, -1].argmax(-1)
        tok = torch.where(done, torch.full_like(tok, eos_id), tok)
        toks.append(tok)
        hids.append(h_last)
        was_done.append(done.clone())
        done = done | (tok == eos_id)
        nxt = hf_llama.model.embed_tokens(tok)[:, None]
        cur = torch.cat([cur, nxt], dim=1)
    tokens = torch.stack(toks, 1)              # (B, T)
    hiddens = torch.stack(hids, 1)             # (B, T, E)
    lengths = (~torch.stack(was_done, 1)).sum(1)
    return tokens, hiddens, lengths


@pytest.fixture(scope="module")
def full_pair():
    import jax
    import jax.numpy as jnp

    from haff_tpu.model.lisa import LisaModel, TrainBatch

    hf_llama, hf_clip, hf_sam, mm, fc1, fc2 = _mid_torch_models()

    rng = np.random.RandomState(0)
    ids = rng.randint(5, 500, (B, PROMPT_LEN)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, IMG_POS] = IMAGE_TOKEN_INDEX
    images_sam = (rng.randn(B, 128, 128, 3) * 0.5).astype(np.float32)
    images_clip = (rng.randn(B, 64, 64, 3) * 0.5).astype(np.float32)

    # --- torch side -------------------------------------------------
    with torch.no_grad():
        pix = torch.tensor(images_clip).permute(0, 3, 1, 2)
        feats = hf_clip(pixel_values=pix, output_hidden_states=True
                        ).hidden_states[-2][:, 1:]
        clip_emb = mm(feats)                                 # (B, 16, 256)
        emb = hf_llama.model.embed_tokens(
            torch.tensor(np.maximum(ids, 0).astype(np.int64)))
        spliced = torch.cat(
            [emb[:, :IMG_POS], clip_emb, emb[:, IMG_POS + 1:]], dim=1)
        t_tokens, t_hiddens, t_lengths = _torch_greedy(
            hf_llama, spliced, MAX_NEW, EOS_ID)

    # Pick the [SEG] id from what row 0 actually emitted so the gather
    # path is exercised (random weights won't emit a preordained id).
    seg_id = None
    for t in range(int(t_lengths[0])):
        cand = int(t_tokens[0, t])
        if cand != EOS_ID:
            seg_id = cand
            break
    if seg_id is None:  # all EOS — degenerate; still a valid parity run
        seg_id = 499

    with torch.no_grad():
        is_seg = (t_tokens == seg_id) & (
            torch.arange(MAX_NEW)[None] < t_lengths[:, None])
        seg_found = is_seg.any(1)
        first = is_seg.float().argmax(1)
        seg_hidden = t_hiddens[torch.arange(B), first]       # (B, 256)
        pred_emb = fc2(torch.relu(fc1(seg_hidden)))
        pred_emb = pred_emb * seg_found[:, None]             # (B, 128)

        sam_pix = torch.tensor(images_sam).permute(0, 3, 1, 2)
        sam_emb_t = hf_sam.vision_encoder(sam_pix).last_hidden_state
        image_pe = hf_sam.get_image_wide_positional_embeddings().expand(
            B, -1, -1, -1)
        dense = hf_sam.prompt_encoder.no_mask_embed.weight.reshape(
            1, -1, 1, 1).expand(B, 128, 8, 8)

        captured = {}

        def hook(mod, inputs, output):
            captured["tokens_out"] = output[0]

        h = hf_sam.mask_decoder.transformer.register_forward_hook(hook)
        low_res, iou = hf_sam.mask_decoder(
            image_embeddings=sam_emb_t,
            image_positional_embeddings=image_pe,
            sparse_prompt_embeddings=pred_emb[:, None, None, :],
            dense_prompt_embeddings=dense,
            multimask_output=False)
        h.remove()
        t_low = low_res[:, 0]                                # (B, 1, 32, 32)
        t_canvas = torch.nn.functional.interpolate(
            t_low, (128, 128), mode="bilinear", align_corners=False)
        # mask tokens for the taxonomy mirror: (B, pb, n_tok, d) or
        # (B*pb, n_tok, d) depending on transformers version.
        tko = captured["tokens_out"]
        tko = tko.reshape(B, -1, tko.shape[-1])[:, 1:5]      # (B, 4, 128)

    # --- our side ---------------------------------------------------
    jax.config.update("jax_platforms", "cpu")
    cfg = _our_cfg(seg_id)
    model = LisaModel(cfg=cfg, dtype=jnp.float32)

    S = 128
    batch0 = TrainBatch(
        images_sam=jnp.asarray(images_sam),
        images_clip=jnp.asarray(images_clip),
        image_index=jnp.arange(B, dtype=jnp.int32),
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attention_mask=jnp.ones((B, PROMPT_LEN), jnp.int32),
        masks_left=jnp.zeros((B, S, S)), masks_right=jnp.zeros((B, S, S)),
        taxonomies=jnp.zeros((B, 4)), valid_region=jnp.ones((B, S, S)),
        sample_weight=jnp.ones((B,)))
    init = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)["params"]

    conv = {
        "llm": convert_llama(
            {k: v.numpy() for k, v in hf_llama.state_dict().items()},
            num_layers=4),
        "vision_tower": convert_clip(
            {k: v.numpy() for k, v in hf_clip.state_dict().items()},
            num_layers_used=3),
        "visual_model": convert_sam(hf_sam_to_original(
            {k: v.numpy() for k, v in hf_sam.state_dict().items()}),
            depth=4),
        "mm_projector": {"kernel": t_linear(mm.weight.detach().numpy()),
                         "bias": mm.bias.detach().numpy()},
        "text_fc1": {"kernel": t_linear(fc1.weight.detach().numpy()),
                     "bias": fc1.bias.detach().numpy()},
        "text_fc2": {"kernel": t_linear(fc2.weight.detach().numpy()),
                     "bias": fc2.bias.detach().numpy()},
    }
    params = {"params": merge_into_init(init, conv)}

    torch_side = dict(
        tokens=t_tokens.numpy(), lengths=t_lengths.numpy(),
        seg_found=seg_found.numpy(), canvas=t_canvas.numpy(),
        low=t_low.numpy(), mask_tokens_out=tko.numpy(), seg_id=seg_id)
    inputs = dict(ids=ids, images_sam=images_sam, images_clip=images_clip)
    return model, params, torch_side, inputs, init


def test_full_evaluate_parity(full_pair):
    import jax
    import jax.numpy as jnp

    from haff_tpu.infer.evaluate import make_jitted_evaluate

    model, params, t, inputs, init = full_pair
    ev = make_jitted_evaluate(model, max_new_tokens=MAX_NEW, eos_id=EOS_ID)
    res = ev(params, jnp.asarray(inputs["images_sam"]),
             jnp.asarray(inputs["images_clip"]),
             jnp.asarray(inputs["ids"]),
             jnp.ones((B, PROMPT_LEN), jnp.int32))

    # 1. token-identical generation through the spliced prompt.
    np.testing.assert_array_equal(np.asarray(res.output_ids), t["tokens"])
    np.testing.assert_array_equal(np.asarray(res.gen_lengths), t["lengths"])
    np.testing.assert_array_equal(np.asarray(res.seg_found), t["seg_found"])

    # 2. full-path canvas masks, fp32: left AND right both match the
    # torch decode (converted checkpoints duplicate stock decoder
    # weights into both sides, build_sam.py:125-136).
    ours_l = np.asarray(res.pred_masks_left)[:, None]
    ours_r = np.asarray(res.pred_masks_right)[:, None]
    ref = t["canvas"]
    assert np.max(np.abs(ours_l - ref)) < 1e-4, np.max(np.abs(ours_l - ref))
    assert np.max(np.abs(ours_r - ref)) < 1e-4


def test_full_taxonomy_parity(full_pair):
    """Taxonomy head: torch mirror (3-layer ReLU MLP + softmax over the
    flattened mask tokens, reference mask_decoder.py:172-178) fed the
    HF decoder's mask_tokens_out, using OUR init weights (stock SAM
    checkpoints carry no taxonomy head; merge keeps init)."""
    import jax.numpy as jnp
    import jax

    from haff_tpu.infer.evaluate import make_jitted_evaluate

    model, params, t, inputs, init = full_pair
    tax_p = init["visual_model"]["mask_decoder_left"]["taxonomy_embed"]

    x = torch.tensor(t["mask_tokens_out"].reshape(B, -1))
    import flax.linen as fnn

    n_layers = len(tax_p)
    for j in range(n_layers):
        lp = tax_p[f"layers_{j}"]
        w = torch.tensor(np.asarray(jax.device_get(
            fnn.unbox(lp["kernel"]))))
        b = torch.tensor(np.asarray(jax.device_get(fnn.unbox(lp["bias"]))))
        x = x @ w + b
        if j < n_layers - 1:
            x = torch.relu(x)
    ref_tax = torch.softmax(x, dim=-1).numpy()

    ev = make_jitted_evaluate(model, max_new_tokens=MAX_NEW, eos_id=EOS_ID)
    res = ev(params, jnp.asarray(inputs["images_sam"]),
             jnp.asarray(inputs["images_clip"]),
             jnp.asarray(inputs["ids"]),
             jnp.ones((B, PROMPT_LEN), jnp.int32))
    np.testing.assert_allclose(np.asarray(res.taxonomies), ref_tax,
                               rtol=1e-4, atol=1e-5)
