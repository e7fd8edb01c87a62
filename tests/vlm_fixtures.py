"""Fabricated HF-layout VLM checkpoints (LLaVA-1.5/Next, Qwen2.5-VL) for
ingestion and data-generation tests: real HF key names + config.json so every
branch of SpecModel.from_pretrained and both vision converters execute.

Layouts mirror the reference load paths (spec_model_ours.py:109-177, vision
prefill :311-453) at toy sizes."""

import json
import os

import numpy as np
from safetensors.numpy import save_file

# text model dims (shared with tests/test_from_pretrained.py)
H, I, V, L = 48, 96, 160, 2
HEADS, KV = 4, 2
IMAGE_TOKEN = 150
VIDEO_TOKEN = 151
VISION_START = 152

# tiny CLIP tower: 28px images, 14px patches -> 2x2 grid, 4 patch tokens
VDIM, VMLP, VLAYERS, VHEADS = 32, 64, 2, 2
CLIP_IMAGE_SIZE, CLIP_PATCH = 28, 14

TEXT_CFG = {
    "vocab_size": V, "hidden_size": H, "intermediate_size": I,
    "num_hidden_layers": L, "num_attention_heads": HEADS,
    "num_key_value_heads": KV, "max_position_embeddings": 2048,
    "rms_norm_eps": 1e-6, "rope_theta": 10000.0, "model_type": "llama",
}


def _w(rng, *shape):
    return rng.normal(0, 0.05, shape).astype(np.float32)


def _llama_sd(rng, prefix, head_key):
    sd = {
        prefix + "embed_tokens.weight": _w(rng, V, H),
        prefix + "norm.weight": np.ones(H, np.float32),
        head_key: _w(rng, V, H),
    }
    for i in range(L):
        p = f"{prefix}layers.{i}."
        sd.update({
            p + "input_layernorm.weight": np.ones(H, np.float32),
            p + "post_attention_layernorm.weight": np.ones(H, np.float32),
            p + "self_attn.q_proj.weight": _w(rng, H, H),
            p + "self_attn.k_proj.weight": _w(rng, H // 2, H),
            p + "self_attn.v_proj.weight": _w(rng, H // 2, H),
            p + "self_attn.o_proj.weight": _w(rng, H, H),
            p + "mlp.gate_proj.weight": _w(rng, I, H),
            p + "mlp.up_proj.weight": _w(rng, I, H),
            p + "mlp.down_proj.weight": _w(rng, H, I),
        })
    return sd


def _qkv_bias_sd(rng, prefix):
    out = {}
    for i in range(L):
        p = f"{prefix}layers.{i}."
        out.update({
            p + "self_attn.q_proj.bias": _w(rng, H).reshape(H) * 0.1,
            p + "self_attn.k_proj.bias": _w(rng, H // 2) * 0.1,
            p + "self_attn.v_proj.bias": _w(rng, H // 2) * 0.1,
        })
    return out


def write_llava_ckpt(d: str, anyres: bool = True) -> None:
    """LLaVA-Next (anyres=True) / LLaVA-1.5 (anyres=False) layout:
    vision_tower.vision_model.* + multi_modal_projector.* + language_model.*."""
    rng = np.random.default_rng(10)
    sd = _llama_sd(rng, "language_model.model.",
                   "language_model.lm_head.weight")
    v = "vision_tower.vision_model."
    sd.update({
        v + "embeddings.patch_embedding.weight": _w(rng, VDIM, 3, CLIP_PATCH, CLIP_PATCH),
        v + "embeddings.class_embedding": _w(rng, VDIM),
        v + "embeddings.position_embedding.weight": _w(rng, 5, VDIM),
        v + "pre_layrnorm.weight": np.ones(VDIM, np.float32),
        v + "pre_layrnorm.bias": np.zeros(VDIM, np.float32),
    })
    for i in range(VLAYERS):
        p = v + f"encoder.layers.{i}."
        sd.update({
            p + "layer_norm1.weight": np.ones(VDIM, np.float32),
            p + "layer_norm1.bias": np.zeros(VDIM, np.float32),
            p + "layer_norm2.weight": np.ones(VDIM, np.float32),
            p + "layer_norm2.bias": np.zeros(VDIM, np.float32),
            p + "self_attn.q_proj.weight": _w(rng, VDIM, VDIM),
            p + "self_attn.q_proj.bias": np.zeros(VDIM, np.float32),
            p + "self_attn.k_proj.weight": _w(rng, VDIM, VDIM),
            p + "self_attn.k_proj.bias": np.zeros(VDIM, np.float32),
            p + "self_attn.v_proj.weight": _w(rng, VDIM, VDIM),
            p + "self_attn.v_proj.bias": np.zeros(VDIM, np.float32),
            p + "self_attn.out_proj.weight": _w(rng, VDIM, VDIM),
            p + "self_attn.out_proj.bias": np.zeros(VDIM, np.float32),
            p + "mlp.fc1.weight": _w(rng, VMLP, VDIM),
            p + "mlp.fc1.bias": np.zeros(VMLP, np.float32),
            p + "mlp.fc2.weight": _w(rng, VDIM, VMLP),
            p + "mlp.fc2.bias": np.zeros(VDIM, np.float32),
        })
    sd.update({
        "multi_modal_projector.linear_1.weight": _w(rng, H, VDIM),
        "multi_modal_projector.linear_1.bias": np.zeros(H, np.float32),
        "multi_modal_projector.linear_2.weight": _w(rng, H, H),
        "multi_modal_projector.linear_2.bias": np.zeros(H, np.float32),
    })
    if anyres:
        sd["image_newline"] = _w(rng, H)
    os.makedirs(d, exist_ok=True)
    save_file(sd, os.path.join(d, "model.safetensors"))
    cfg = {
        "architectures": ["LlavaNextForConditionalGeneration" if anyres
                          else "LlavaForConditionalGeneration"],
        "model_type": "llava_next" if anyres else "llava",
        "text_config": TEXT_CFG,
        "vision_config": {
            "hidden_size": VDIM, "intermediate_size": VMLP,
            "num_hidden_layers": VLAYERS, "num_attention_heads": VHEADS,
            "image_size": CLIP_IMAGE_SIZE, "patch_size": CLIP_PATCH,
        },
        "vision_feature_layer": -2,
        "image_token_index": IMAGE_TOKEN,
        "image_grid_pinpoints": [[28, 56], [56, 28], [56, 56]],
        "eos_token_id": 5,
        "vocab_size": V, "hidden_size": H,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


# tiny Qwen ViT: 14px patches, merge 2 -> 28px merged cells, window 28
QDIM, QMLP, QDEPTH, QHEADS = 32, 64, 2, 2


def write_qwen_vl_ckpt(d: str) -> None:
    """Qwen2.5-VL layout: model.* (qkv-bias text) + visual.* ViT + merger."""
    rng = np.random.default_rng(11)
    sd = _llama_sd(rng, "model.", "lm_head.weight")
    sd.update(_qkv_bias_sd(rng, "model."))
    v = "visual."
    sd[v + "patch_embed.proj.weight"] = _w(rng, QDIM, 3, 2, CLIP_PATCH, CLIP_PATCH)
    for i in range(QDEPTH):
        p = v + f"blocks.{i}."
        sd.update({
            p + "norm1.weight": np.ones(QDIM, np.float32),
            p + "norm2.weight": np.ones(QDIM, np.float32),
            p + "attn.qkv.weight": _w(rng, 3 * QDIM, QDIM),
            p + "attn.qkv.bias": np.zeros(3 * QDIM, np.float32),
            p + "attn.proj.weight": _w(rng, QDIM, QDIM),
            p + "attn.proj.bias": np.zeros(QDIM, np.float32),
            p + "mlp.gate_proj.weight": _w(rng, QMLP, QDIM),
            p + "mlp.gate_proj.bias": np.zeros(QMLP, np.float32),
            p + "mlp.up_proj.weight": _w(rng, QMLP, QDIM),
            p + "mlp.up_proj.bias": np.zeros(QMLP, np.float32),
            p + "mlp.down_proj.weight": _w(rng, QDIM, QMLP),
            p + "mlp.down_proj.bias": np.zeros(QDIM, np.float32),
        })
    merged = QDIM * 4  # hidden * merge_unit
    sd.update({
        v + "merger.ln_q.weight": np.ones(QDIM, np.float32),
        v + "merger.mlp.0.weight": _w(rng, merged, merged),
        v + "merger.mlp.0.bias": np.zeros(merged, np.float32),
        v + "merger.mlp.2.weight": _w(rng, H, merged),
        v + "merger.mlp.2.bias": np.zeros(H, np.float32),
    })
    os.makedirs(d, exist_ok=True)
    save_file(sd, os.path.join(d, "model.safetensors"))
    cfg = dict(TEXT_CFG)
    cfg.update({
        "architectures": ["Qwen2_5_VLForConditionalGeneration"],
        "model_type": "qwen2_5_vl",
        "vision_config": {
            "hidden_size": QDIM, "out_hidden_size": H,
            "intermediate_size": QMLP, "depth": QDEPTH, "num_heads": QHEADS,
            "patch_size": CLIP_PATCH, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "window_size": 28,
            "fullatt_block_indexes": [1], "tokens_per_second": 2,
        },
        "rope_scaling": {"type": "mrope", "mrope_section": [2, 2, 2]},
        "image_token_id": IMAGE_TOKEN,
        "video_token_id": VIDEO_TOKEN,
        "vision_start_token_id": VISION_START,
        "eos_token_id": 5,
    })
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


def write_vision_draft_ckpt(d: str, qkv_bias: bool = False,
                            num_q: int = 2) -> None:
    """ViSpec draft with the full vision module tree (cnets_ours.py:683-757):
    embed_tokens, layers.0.*, fc, img_fc, imadpt.{q,k_proj,v_proj,o_proj}."""
    rng = np.random.default_rng(12)
    sd = {
        "embed_tokens.weight": _w(rng, V, H),
        "fc.weight": _w(rng, H, 2 * H),
        "fc.bias": np.zeros(H, np.float32),
        "img_fc.weight": _w(rng, H, 2 * H),
        "img_fc.bias": np.zeros(H, np.float32),
        "imadpt.q": _w(rng, num_q, HEADS, H // HEADS),
        "imadpt.k_proj.weight": _w(rng, H, H),
        "imadpt.v_proj.weight": _w(rng, H, H),
        "imadpt.o_proj.weight": _w(rng, H, H),
        "layers.0.post_attention_layernorm.weight": np.ones(H, np.float32),
        "layers.0.self_attn.q_proj.weight": _w(rng, H, H),
        "layers.0.self_attn.k_proj.weight": _w(rng, H // 2, H),
        "layers.0.self_attn.v_proj.weight": _w(rng, H // 2, H),
        "layers.0.self_attn.o_proj.weight": _w(rng, H, H),
        "layers.0.mlp.gate_proj.weight": _w(rng, I, H),
        "layers.0.mlp.up_proj.weight": _w(rng, I, H),
        "layers.0.mlp.down_proj.weight": _w(rng, H, I),
    }
    if qkv_bias:
        sd.update({
            "layers.0.self_attn.q_proj.bias": np.zeros(H, np.float32),
            "layers.0.self_attn.k_proj.bias": np.zeros(H // 2, np.float32),
            "layers.0.self_attn.v_proj.bias": np.zeros(H // 2, np.float32),
            "imadpt.k_proj.bias": np.zeros(H, np.float32),
            "imadpt.v_proj.bias": np.zeros(H, np.float32),
        })
    os.makedirs(d, exist_ok=True)
    save_file(sd, os.path.join(d, "model.safetensors"))
    cfg = {
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": 1, "num_attention_heads": HEADS,
        "num_key_value_heads": KV, "max_position_embeddings": 2048,
        "rms_norm_eps": 1e-6, "bias": True, "qkv_bias": qkv_bias,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
