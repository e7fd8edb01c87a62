"""HF checkpoint ingestion: torch/safetensors state dicts -> vispec_tpu pytrees.

Losslessly loads the reference draft checkpoints (HF ``JLKang/ViSpec-*``; module
tree from cnets_ours.py:683-757) and LLaMA/Vicuna/Qwen2-family target weights
(modeling_llama_kv.py naming).  Torch ``nn.Linear`` stores [out, in]; our
matmuls are x @ W with W [in, out], so every weight transposes.

No torch dependency for safetensors (read via safetensors.numpy); ``.bin``
checkpoints go through torch.load on CPU when torch is present.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..configs import DraftConfig, LlamaConfig


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint directory or file into numpy arrays.

    Handles: model.safetensors(.index.json sharded), pytorch_model.bin
    (reference load order: spec_model_ours.py:152-166)."""
    if os.path.isdir(path):
        idx = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            out: Dict[str, np.ndarray] = {}
            for shard in sorted(set(weight_map.values())):
                out.update(_load_safetensors(os.path.join(path, shard)))
            return out
        st = os.path.join(path, "model.safetensors")
        if os.path.exists(st):
            return _load_safetensors(st)
        bin_idx = os.path.join(path, "pytorch_model.bin.index.json")
        if os.path.exists(bin_idx):
            with open(bin_idx) as f:
                weight_map = json.load(f)["weight_map"]
            out = {}
            for shard in sorted(set(weight_map.values())):
                out.update(_load_torch_bin(os.path.join(path, shard)))
            return out
        bin_path = os.path.join(path, "pytorch_model.bin")
        if os.path.exists(bin_path):
            return _load_torch_bin(bin_path)
        raise FileNotFoundError(f"no checkpoint found under {path}")
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    return _load_torch_bin(path)


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            try:
                out[k] = f.get_tensor(k)
            except Exception:
                # bf16 unsupported by numpy framework in some versions: go via torch
                import torch

                with safe_open(path, framework="pt", device="cpu") as ft:
                    t = ft.get_tensor(k)
                out[k] = t.float().numpy()
    return out


def _load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _t(sd: Dict[str, np.ndarray], key: str) -> np.ndarray:
    return np.ascontiguousarray(sd[key].T)


def convert_draft(
    sd: Dict[str, np.ndarray],
    cfg: DraftConfig,
    dtype=jnp.bfloat16,
    embed_fallback=None,
) -> dict:
    """ViSpec draft state dict -> models/draft.py pytree.

    Weight names follow cnets_ours.Model's module tree: embed_tokens, layers.0.*,
    fc, img_fc, imadpt.{q,k_proj,v_proj,o_proj}.

    ``embed_fallback``: the target model's embedding matrix, used when the
    draft checkpoint omits the frozen ``embed_tokens.weight`` — the reference
    loads draft state dicts with strict=False and copies embed_tokens from the
    base model (cnets_ours.py:683-730, spec_model_ours.py:60-63)."""
    p = "layers.0."
    layer = {
        "post_norm": jnp.asarray(sd[p + "post_attention_layernorm.weight"], jnp.float32),
        "wq": jnp.asarray(_t(sd, p + "self_attn.q_proj.weight"), dtype),
        "wk": jnp.asarray(_t(sd, p + "self_attn.k_proj.weight"), dtype),
        "wv": jnp.asarray(_t(sd, p + "self_attn.v_proj.weight"), dtype),
        "wo": jnp.asarray(_t(sd, p + "self_attn.o_proj.weight"), dtype),
        "w_gate": jnp.asarray(_t(sd, p + "mlp.gate_proj.weight"), dtype),
        "w_up": jnp.asarray(_t(sd, p + "mlp.up_proj.weight"), dtype),
        "w_down": jnp.asarray(_t(sd, p + "mlp.down_proj.weight"), dtype),
    }
    if cfg.qkv_bias:
        layer["bq"] = jnp.asarray(sd[p + "self_attn.q_proj.bias"], dtype)
        layer["bk"] = jnp.asarray(sd[p + "self_attn.k_proj.bias"], dtype)
        layer["bv"] = jnp.asarray(sd[p + "self_attn.v_proj.bias"], dtype)

    if "embed_tokens.weight" in sd:
        embed = jnp.asarray(sd["embed_tokens.weight"], dtype)
    elif embed_fallback is not None:
        embed = jnp.asarray(embed_fallback, dtype)
    else:
        raise KeyError(
            "draft checkpoint has no embed_tokens.weight and no embed_fallback "
            "was provided (the reference copies the frozen embedding from the "
            "base model, spec_model_ours.py:60-63)"
        )
    params = {
        "embed": embed,
        "layer": layer,
        "fc_w": jnp.asarray(_t(sd, "fc.weight"), dtype),
    }
    if "fc.bias" in sd:
        params["fc_b"] = jnp.asarray(sd["fc.bias"], dtype)

    # vision components are absent in EAGLE-2 draft checkpoints (cnets.py);
    # cfg.vision=False also force-drops them (method="eagle" on a ViSpec ckpt)
    if not cfg.vision:
        return params
    if "imadpt.q" in sd:
        adaptor = {
            "q": jnp.asarray(sd["imadpt.q"], dtype),
            "wk": jnp.asarray(_t(sd, "imadpt.k_proj.weight"), dtype),
            "wv": jnp.asarray(_t(sd, "imadpt.v_proj.weight"), dtype),
            "wo": jnp.asarray(_t(sd, "imadpt.o_proj.weight"), dtype),
        }
        if cfg.qkv_bias and "imadpt.k_proj.bias" in sd:
            adaptor["bk"] = jnp.asarray(sd["imadpt.k_proj.bias"], dtype)
            adaptor["bv"] = jnp.asarray(sd["imadpt.v_proj.bias"], dtype)
        params["adaptor"] = adaptor
    if "img_fc.weight" in sd:
        params["img_fc_w"] = jnp.asarray(_t(sd, "img_fc.weight"), dtype)
        if "img_fc.bias" in sd:
            params["img_fc_b"] = jnp.asarray(sd["img_fc.bias"], dtype)
    return params


def convert_llama(
    sd: Dict[str, np.ndarray],
    cfg: LlamaConfig,
    dtype=jnp.bfloat16,
    prefix: str = "model.",
    lm_head_key: str = "lm_head.weight",
) -> dict:
    """HF LLaMA/Qwen2 text-model state dict -> models/llama.py pytree.

    For VLM checkpoints pass prefix='language_model.model.' and
    lm_head_key='language_model.lm_head.weight' (HF LLaVA layout)."""
    l = cfg.num_hidden_layers

    def stack(fmt: str, transpose=True):
        mats = []
        for i in range(l):
            w = sd[prefix + fmt.format(i)]
            mats.append(np.ascontiguousarray(w.T) if transpose else w)
        return np.stack(mats)

    layers = {
        "input_norm": jnp.asarray(
            stack("layers.{}.input_layernorm.weight", transpose=False), jnp.float32
        ),
        "post_norm": jnp.asarray(
            stack("layers.{}.post_attention_layernorm.weight", transpose=False),
            jnp.float32,
        ),
        "wq": jnp.asarray(stack("layers.{}.self_attn.q_proj.weight"), dtype),
        "wk": jnp.asarray(stack("layers.{}.self_attn.k_proj.weight"), dtype),
        "wv": jnp.asarray(stack("layers.{}.self_attn.v_proj.weight"), dtype),
        "wo": jnp.asarray(stack("layers.{}.self_attn.o_proj.weight"), dtype),
        "w_gate": jnp.asarray(stack("layers.{}.mlp.gate_proj.weight"), dtype),
        "w_up": jnp.asarray(stack("layers.{}.mlp.up_proj.weight"), dtype),
        "w_down": jnp.asarray(stack("layers.{}.mlp.down_proj.weight"), dtype),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.asarray(
            stack("layers.{}.self_attn.q_proj.bias", transpose=False), dtype
        )
        layers["bk"] = jnp.asarray(
            stack("layers.{}.self_attn.k_proj.bias", transpose=False), dtype
        )
        layers["bv"] = jnp.asarray(
            stack("layers.{}.self_attn.v_proj.bias", transpose=False), dtype
        )

    embed = sd[prefix + "embed_tokens.weight"]
    if lm_head_key in sd:
        head = np.ascontiguousarray(sd[lm_head_key].T)
    else:  # tied embeddings
        head = np.ascontiguousarray(embed.T)
    return {
        "embed": jnp.asarray(embed, dtype),
        "layers": layers,
        "final_norm": jnp.asarray(sd[prefix + "norm.weight"], jnp.float32),
        "lm_head": jnp.asarray(head, dtype),
    }


def convert_clip_and_projector(sd: Dict[str, np.ndarray], vcfg, dtype=jnp.bfloat16) -> dict:
    """HF LLaVA checkpoint -> clip_vit + projector pytree (vparams).

    HF names: vision_tower.vision_model.* (CLIPVisionModel),
    multi_modal_projector.linear_{1,2}, image_newline (LLaVA-Next)."""
    v = "vision_tower.vision_model."
    l = vcfg.num_hidden_layers

    patch_w = sd[v + "embeddings.patch_embedding.weight"]  # [width, 3, p, p]
    patch_w = np.ascontiguousarray(patch_w.reshape(patch_w.shape[0], -1).T)

    def stack(fmt, transpose=True):
        mats = []
        for i in range(l):
            wi = sd[v + f"encoder.layers.{i}." + fmt]
            mats.append(np.ascontiguousarray(wi.T) if transpose else wi)
        return np.stack(mats)

    layers = {
        "ln1_w": jnp.asarray(stack("layer_norm1.weight", False), jnp.float32),
        "ln1_b": jnp.asarray(stack("layer_norm1.bias", False), jnp.float32),
        "ln2_w": jnp.asarray(stack("layer_norm2.weight", False), jnp.float32),
        "ln2_b": jnp.asarray(stack("layer_norm2.bias", False), jnp.float32),
        "wq": jnp.asarray(stack("self_attn.q_proj.weight"), dtype),
        "wk": jnp.asarray(stack("self_attn.k_proj.weight"), dtype),
        "wv": jnp.asarray(stack("self_attn.v_proj.weight"), dtype),
        "wo": jnp.asarray(stack("self_attn.out_proj.weight"), dtype),
        "bq": jnp.asarray(stack("self_attn.q_proj.bias", False), dtype),
        "bk": jnp.asarray(stack("self_attn.k_proj.bias", False), dtype),
        "bv": jnp.asarray(stack("self_attn.v_proj.bias", False), dtype),
        "bo": jnp.asarray(stack("self_attn.out_proj.bias", False), dtype),
        "w_fc1": jnp.asarray(stack("mlp.fc1.weight"), dtype),
        "b_fc1": jnp.asarray(stack("mlp.fc1.bias", False), dtype),
        "w_fc2": jnp.asarray(stack("mlp.fc2.weight"), dtype),
        "b_fc2": jnp.asarray(stack("mlp.fc2.bias", False), dtype),
    }
    out = {
        "vision": {
            "patch_w": jnp.asarray(patch_w, dtype),
            "class_embed": jnp.asarray(sd[v + "embeddings.class_embedding"].reshape(-1), dtype),
            "pos_embed": jnp.asarray(sd[v + "embeddings.position_embedding.weight"], dtype),
            "pre_norm_w": jnp.asarray(sd[v + "pre_layrnorm.weight"], jnp.float32),
            "pre_norm_b": jnp.asarray(sd[v + "pre_layrnorm.bias"], jnp.float32),
            "layers": layers,
        },
        "proj_w1": jnp.asarray(_t(sd, "multi_modal_projector.linear_1.weight"), dtype),
        "proj_b1": jnp.asarray(sd["multi_modal_projector.linear_1.bias"], dtype),
        "proj_w2": jnp.asarray(_t(sd, "multi_modal_projector.linear_2.weight"), dtype),
        "proj_b2": jnp.asarray(sd["multi_modal_projector.linear_2.bias"], dtype),
    }
    if "image_newline" in sd:
        out["image_newline"] = jnp.asarray(sd["image_newline"], dtype)
    return out


def convert_qwen_vision(sd: Dict[str, np.ndarray], vcfg, dtype=jnp.bfloat16) -> dict:
    """HF Qwen2.5-VL `visual.*` weights -> models/qwen2_5_vl.py pytree."""
    v = "visual."
    l = vcfg.depth

    patch_w = sd[v + "patch_embed.proj.weight"]  # [hidden, C, tp, p, p]
    patch_w = np.ascontiguousarray(patch_w.reshape(patch_w.shape[0], -1).T)

    def stack(fmt, transpose=True):
        mats = []
        for i in range(l):
            wi = sd[v + f"blocks.{i}." + fmt]
            mats.append(np.ascontiguousarray(wi.T) if transpose else wi)
        return np.stack(mats)

    blocks = {
        "norm1": jnp.asarray(stack("norm1.weight", False), jnp.float32),
        "norm2": jnp.asarray(stack("norm2.weight", False), jnp.float32),
        "wqkv": jnp.asarray(stack("attn.qkv.weight"), dtype),
        "bqkv": jnp.asarray(stack("attn.qkv.bias", False), dtype),
        "wo": jnp.asarray(stack("attn.proj.weight"), dtype),
        "bo": jnp.asarray(stack("attn.proj.bias", False), dtype),
        "w_gate": jnp.asarray(stack("mlp.gate_proj.weight"), dtype),
        "b_gate": jnp.asarray(stack("mlp.gate_proj.bias", False), dtype),
        "w_up": jnp.asarray(stack("mlp.up_proj.weight"), dtype),
        "b_up": jnp.asarray(stack("mlp.up_proj.bias", False), dtype),
        "w_down": jnp.asarray(stack("mlp.down_proj.weight"), dtype),
        "b_down": jnp.asarray(stack("mlp.down_proj.bias", False), dtype),
    }
    return {
        "patch_w": jnp.asarray(patch_w, dtype),
        "blocks": blocks,
        "merger": {
            "ln_q": jnp.asarray(sd[v + "merger.ln_q.weight"], jnp.float32),
            "w1": jnp.asarray(_t(sd, "visual.merger.mlp.0.weight"), dtype),
            "b1": jnp.asarray(sd[v + "merger.mlp.0.bias"], dtype),
            "w2": jnp.asarray(_t(sd, "visual.merger.mlp.2.weight"), dtype),
            "b2": jnp.asarray(sd[v + "merger.mlp.2.bias"], dtype),
        },
    }


def mixtral_config_from_hf(hf_cfg: dict):
    """Map an HF MixtralConfig dict to models/mixtral.MixtralConfig
    (reference target: modeling_mixtral_kv.py:1021)."""
    import dataclasses

    from ..models.mixtral import MixtralConfig

    base = llama_config_from_hf(hf_cfg)
    return MixtralConfig(
        **dataclasses.asdict(base),
        num_local_experts=hf_cfg.get("num_local_experts", 8),
        num_experts_per_tok=hf_cfg.get("num_experts_per_tok", 2),
    )


def llama_config_from_hf(hf_cfg: dict) -> LlamaConfig:
    """Map an HF config.json dict (LlamaConfig/Qwen2Config fields) to ours."""
    rope_scaling = hf_cfg.get("rope_scaling") or {}
    mrope = rope_scaling.get("mrope_section")
    return LlamaConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_hidden_layers=hf_cfg["num_hidden_layers"],
        num_attention_heads=hf_cfg["num_attention_heads"],
        num_key_value_heads=hf_cfg.get(
            "num_key_value_heads", hf_cfg["num_attention_heads"]
        ),
        max_position_embeddings=hf_cfg.get("max_position_embeddings", 2048),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        rope_scaling_type=rope_scaling.get("type")
        if rope_scaling.get("type") in ("linear", "dynamic")
        else None,
        rope_scaling_factor=float(rope_scaling.get("factor", 1.0)),
        qkv_bias=hf_cfg.get("model_type") == "qwen2"
        or hf_cfg.get("attention_bias", False),
        tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
        mrope_section=tuple(mrope) if mrope else None,
    )
