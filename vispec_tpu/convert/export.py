"""Export draft checkpoints back to the HF/PyTorch naming scheme.

Round-trip interop: a draft trained in this framework can be saved as
``model.safetensors`` with the reference's module names (cnets_ours.py:683-757)
so the PyTorch reference — or any other consumer of `JLKang/ViSpec-*`-style
checkpoints — loads it directly.  Inverse of convert/hf.py (transpose back to
torch's [out, in] Linear layout).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def draft_to_hf_state_dict(params: dict) -> Dict[str, np.ndarray]:
    def t(x):
        return np.ascontiguousarray(np.asarray(x, np.float32).T)

    def a(x):
        return np.ascontiguousarray(np.asarray(x, np.float32))

    layer = params["layer"]
    sd = {
        "embed_tokens.weight": a(params["embed"]),
        "layers.0.self_attn.q_proj.weight": t(layer["wq"]),
        "layers.0.self_attn.k_proj.weight": t(layer["wk"]),
        "layers.0.self_attn.v_proj.weight": t(layer["wv"]),
        "layers.0.self_attn.o_proj.weight": t(layer["wo"]),
        "layers.0.mlp.gate_proj.weight": t(layer["w_gate"]),
        "layers.0.mlp.up_proj.weight": t(layer["w_up"]),
        "layers.0.mlp.down_proj.weight": t(layer["w_down"]),
        "layers.0.post_attention_layernorm.weight": a(layer["post_norm"]),
        "fc.weight": t(params["fc_w"]),
    }
    for ours, theirs in (("bq", "q_proj"), ("bk", "k_proj"), ("bv", "v_proj")):
        if ours in layer:
            sd[f"layers.0.self_attn.{theirs}.bias"] = a(layer[ours])
    if "fc_b" in params:
        sd["fc.bias"] = a(params["fc_b"])
    if "img_fc_w" in params:
        sd["img_fc.weight"] = t(params["img_fc_w"])
        if "img_fc_b" in params:
            sd["img_fc.bias"] = a(params["img_fc_b"])
    if "adaptor" in params:
        ad = params["adaptor"]
        sd["imadpt.q"] = a(ad["q"])
        sd["imadpt.k_proj.weight"] = t(ad["wk"])
        sd["imadpt.v_proj.weight"] = t(ad["wv"])
        sd["imadpt.o_proj.weight"] = t(ad["wo"])
        if "bk" in ad:
            sd["imadpt.k_proj.bias"] = a(ad["bk"])
            sd["imadpt.v_proj.bias"] = a(ad["bv"])
    return sd


def save_draft(params: dict, outdir: str, draft_config: dict) -> str:
    """Write model.safetensors + config.json in the reference's layout."""
    os.makedirs(outdir, exist_ok=True)
    sd = draft_to_hf_state_dict(params)
    path = os.path.join(outdir, "model.safetensors")
    try:
        from safetensors.numpy import save_file

        save_file(sd, path)
    except ImportError:
        path = os.path.join(outdir, "model.npz")
        np.savez(path, **sd)
    with open(os.path.join(outdir, "config.json"), "w") as f:
        json.dump(draft_config, f, indent=2)
    return path
