"""Mixtral MoE target backbone (reference modeling_mixtral_kv.py).

The reference computes top-2 routing with a dense per-expert loop on one GPU
(MixtralSparseMoeBlock, :488-571 — no expert parallelism).  TPU-native at bs=1
speculative decoding the token count per forward is tiny (<= tree size), so we
evaluate every expert as one stacked einsum and weight by the router's top-2
softmax — MXU-friendly, no gathers of weight matrices.  At scale the expert
dimension shards over an 'ep'/'tp' mesh axis (parallel/sharding.py) and the
same einsum becomes an all-to-all-free sharded matmul.

Weights: like llama.py plus per-layer
  router: [L, hidden, num_experts]
  we_gate/we_up: [L, E, hidden, inter], we_down: [L, E, inter, hidden]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..configs import LlamaConfig
from ..ops import rope as rope_ops
from ..ops.kv_cache import KVCache
from .llama import rms_norm


@dataclass(frozen=True)
class MixtralConfig(LlamaConfig):
    num_local_experts: int = 8
    num_experts_per_tok: int = 2


def moe_block(x: jax.Array, lp: dict, cfg: MixtralConfig) -> jax.Array:
    """Top-k routed sparse MLP, computed densely over experts.

    Matches MixtralSparseMoeBlock semantics: softmax over router logits, top-k
    per token, renormalize the top-k weights (:123-160 of HF impl)."""
    router_logits = jnp.dot(
        x, lp["router"], preferred_element_type=jnp.float32
    )  # [S, E]
    probs = jax.nn.softmax(router_logits, axis=-1)
    top_w, top_i = lax.top_k(probs, cfg.num_experts_per_tok)  # [S, k]
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    # dense per-token expert weights [S, E]
    weights = jnp.zeros_like(probs).at[
        jnp.arange(x.shape[0])[:, None], top_i
    ].set(top_w)

    gate = jnp.einsum("sd,edi->sei", x, lp["we_gate"], preferred_element_type=jnp.float32)
    up = jnp.einsum("sd,edi->sei", x, lp["we_up"], preferred_element_type=jnp.float32)
    inter = (jax.nn.silu(gate) * up).astype(x.dtype)
    out = jnp.einsum("sei,eid->sed", inter, lp["we_down"], preferred_element_type=jnp.float32)
    return jnp.einsum("sed,se->sd", out, weights.astype(jnp.float32)).astype(x.dtype)


def forward_hidden(
    params: dict,
    cfg: MixtralConfig,
    inputs_embeds: jax.Array,
    position_ids: jax.Array,
    cache: KVCache,
    attn_mask: jax.Array,
    region=None,  # optional (start, mask[S, T_reg]) => Pallas decode kernel
    return_new_kv: bool = False,
    seq_len=None,  # real kv length (dynamic-NTK stretch; None => from positions)
) -> Tuple[jax.Array, KVCache]:
    """Same contract as llama.forward_hidden (region / return_new_kv included)
    so the verify pass can commit accepted rows via kv_cache.commit_from_blocks
    instead of re-gathering from the big cache (dense-path parity; the
    reference MoE target is modeling_mixtral_kv.py:488-571, 1021)."""
    cos, sin = rope_ops.cos_sin(
        position_ids, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling_factor if cfg.rope_scaling_type == "linear" else 1.0,
        dynamic_ntk=(
            (cfg.rope_scaling_factor, cfg.max_position_embeddings)
            if cfg.rope_scaling_type == "dynamic" else None
        ),
        seq_len=seq_len,
    )
    write_at = cache.length
    from ..ops.attention import kernel_eligible, use_pallas

    kernel_path = (region is not None and use_pallas()
                   and kernel_eligible(cfg.head_dim, cache.max_len))

    # caches in the scan carry => in-place updates (see llama.forward_hidden);
    # append/attend (incl. the int8-KV quantize-on-write path) shared with the
    # llama backbone
    from .llama import append_kv, cached_attend

    def layer_step(carry, lp):
        hidden, k_cache, v_cache, k_scale, v_scale, layer_idx = carry
        residual = hidden
        normed = rms_norm(hidden, lp["input_norm"], cfg.rms_norm_eps)

        s = normed.shape[0]
        h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        q = jnp.dot(normed, lp["wq"], preferred_element_type=jnp.float32).astype(normed.dtype)
        k = jnp.dot(normed, lp["wk"], preferred_element_type=jnp.float32).astype(normed.dtype)
        v = jnp.dot(normed, lp["wv"], preferred_element_type=jnp.float32).astype(normed.dtype)
        q = q.reshape(s, h, d).transpose(1, 0, 2)
        k_new = k.reshape(s, hkv, d).transpose(1, 0, 2)
        v_new = v.reshape(s, hkv, d).transpose(1, 0, 2)
        q, k_new = rope_ops.apply_rope(q, k_new, cos, sin)

        k_cache, v_cache, k_scale, v_scale = append_kv(
            k_cache, v_cache, k_scale, v_scale, k_new, v_new, layer_idx,
            write_at)
        out = cached_attend(q, k_cache, v_cache, k_scale, v_scale, layer_idx,
                            attn_mask, region, kernel_path)
        out = out.transpose(1, 0, 2).reshape(s, h * d)
        attn_out = jnp.dot(
            out, lp["wo"], preferred_element_type=jnp.float32
        ).astype(normed.dtype)

        hidden = residual + attn_out
        residual = hidden
        normed = rms_norm(hidden, lp["post_norm"], cfg.rms_norm_eps)
        hidden = residual + moe_block(normed, lp, cfg)
        ys = (k_new, v_new) if return_new_kv else None
        return (hidden, k_cache, v_cache, k_scale, v_scale, layer_idx + 1), ys

    init = (inputs_embeds, cache.k, cache.v, cache.k_scale, cache.v_scale,
            jnp.zeros((), jnp.int32))
    (hidden, new_k, new_v, new_ks, new_vs, _), ys = lax.scan(
        layer_step, init, params["layers"])
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    out_cache = cache._replace(k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs)
    if return_new_kv:
        return hidden, out_cache, ys
    return hidden, out_cache


def init_params(cfg: MixtralConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    ks = jax.random.split(key, 12)
    l, d, i, e = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size, cfg.num_local_experts
    hq = cfg.num_attention_heads * cfg.head_dim
    hkv = cfg.num_key_value_heads * cfg.head_dim

    def w(k, shape, scale=0.02):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

    layers = {
        "input_norm": jnp.ones((l, d), jnp.float32),
        "post_norm": jnp.ones((l, d), jnp.float32),
        "wq": w(ks[0], (l, d, hq)),
        "wk": w(ks[1], (l, d, hkv)),
        "wv": w(ks[2], (l, d, hkv)),
        "wo": w(ks[3], (l, hq, d)),
        "router": w(ks[4], (l, d, e)),
        "we_gate": w(ks[5], (l, e, d, i)),
        "we_up": w(ks[6], (l, e, d, i)),
        "we_down": w(ks[7], (l, e, i, d)),
    }
    return {
        "embed": w(ks[8], (cfg.vocab_size, d)),
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": w(ks[9], (d, cfg.vocab_size)),
    }


def convert_mixtral(sd, cfg: MixtralConfig, dtype=jnp.bfloat16, prefix="model.") -> dict:
    """HF Mixtral state dict -> pytree (block_sparse_moe.experts.{e}.w1/w3/w2)."""
    import numpy as np

    l, e = cfg.num_hidden_layers, cfg.num_local_experts

    def t(key):
        return np.ascontiguousarray(sd[key].T)

    def stack(fmt, transpose=True):
        return np.stack([
            t(prefix + fmt.format(i)) if transpose else sd[prefix + fmt.format(i)]
            for i in range(l)
        ])

    def stack_experts(fmt):
        return np.stack([
            np.stack([t(prefix + fmt.format(i, j)) for j in range(e)])
            for i in range(l)
        ])

    layers = {
        "input_norm": jnp.asarray(stack("layers.{}.input_layernorm.weight", False), jnp.float32),
        "post_norm": jnp.asarray(stack("layers.{}.post_attention_layernorm.weight", False), jnp.float32),
        "wq": jnp.asarray(stack("layers.{}.self_attn.q_proj.weight"), dtype),
        "wk": jnp.asarray(stack("layers.{}.self_attn.k_proj.weight"), dtype),
        "wv": jnp.asarray(stack("layers.{}.self_attn.v_proj.weight"), dtype),
        "wo": jnp.asarray(stack("layers.{}.self_attn.o_proj.weight"), dtype),
        "router": jnp.asarray(stack("layers.{}.block_sparse_moe.gate.weight"), dtype),
        # HF names: w1=gate, w3=up, w2=down
        "we_gate": jnp.asarray(stack_experts("layers.{}.block_sparse_moe.experts.{}.w1.weight"), dtype),
        "we_up": jnp.asarray(stack_experts("layers.{}.block_sparse_moe.experts.{}.w3.weight"), dtype),
        "we_down": jnp.asarray(stack_experts("layers.{}.block_sparse_moe.experts.{}.w2.weight"), dtype),
    }
    embed = sd[prefix + "embed_tokens.weight"]
    head = (np.ascontiguousarray(sd["lm_head.weight"].T)
            if "lm_head.weight" in sd else np.ascontiguousarray(embed.T))
    return {
        "embed": jnp.asarray(embed, dtype),
        "layers": layers,
        "final_norm": jnp.asarray(sd[prefix + "norm.weight"], jnp.float32),
        "lm_head": jnp.asarray(head, dtype),
    }
