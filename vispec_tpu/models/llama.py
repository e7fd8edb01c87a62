"""LLaMA-family target backbone (Vicuna / Qwen2 text models), TPU-native.

Functional re-design of the reference target forks
(vispec/model/modeling_llama_kv.py:446-1140, modeling_qwen2_kv.py — identical but
qkv_bias=True).  Differences from the reference, by construction:

- Parameters are a pytree with *stacked* per-layer arrays and the layer loop is a
  ``lax.scan`` — one compiled layer body regardless of depth, pjit-shardable.
- The KV cache is the functional preallocated cache in ops/kv_cache.py; attention
  always runs over the full static cache with a boolean mask argument (no
  ``model.tree_mask`` side channel — cf. modeling_llama_kv.py:916-922).
- Batch size 1 (the reference's standing restriction, utils.py:541); activations
  are [seq, hidden] and a future batched server vmaps this module.

Weight layout (bf16 unless noted):
  embed:      [vocab, hidden]
  layers:
    input_norm, post_norm: [L, hidden]  (float32)
    wq: [L, hidden, n_heads*head_dim]   wk/wv: [L, hidden, n_kv*head_dim]
    bq/bk/bv:  [L, ...] only if cfg.qkv_bias
    wo: [L, n_heads*head_dim, hidden]
    w_gate/w_up: [L, hidden, inter]     w_down: [L, inter, hidden]
  final_norm: [hidden] (float32)
  lm_head:    [hidden, vocab]
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..configs import LlamaConfig
from ..ops import kv_cache as kvc
from ..ops import rope as rope_ops
from ..ops.attention import attend, attend_region
from ..ops.kv_cache import KVCache
from ..ops.quant import qdot


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """float32 RMSNorm matching cnets_ours.py:513-527."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * normed).astype(x.dtype)


def swiglu_mlp(x: jax.Array, w_gate, w_up, w_down) -> jax.Array:
    # qdot == jnp.dot for plain arrays; weights may be int8 QTensors when the
    # draft (quantize_draft) or the target (quantize_target_inplace) runs
    # weight-only quantized (ops/quant.py)
    gate = qdot(x, w_gate, preferred_element_type=jnp.float32)
    up = qdot(x, w_up, preferred_element_type=jnp.float32)
    inter = (jax.nn.silu(gate) * up).astype(x.dtype)
    return qdot(inter, w_down, preferred_element_type=jnp.float32).astype(x.dtype)


def append_kv(k_cache, v_cache, k_scale, v_scale, k_new, v_new,
              layer_idx, write_at):
    """Write this layer's new K/V rows into the stacked cache buffers at
    ``write_at``; when the cache is int8 (k_scale is not None) the rows are
    per-row quantized on the way in (kv_cache.quantize_rows) and the scale
    tables updated alongside.  Shared by the llama and mixtral layer scans."""
    zero = jnp.zeros((), jnp.int32)
    if k_scale is not None:
        kq, ks = kvc.quantize_rows(k_new)
        vq, vs = kvc.quantize_rows(v_new)
        k_cache = lax.dynamic_update_slice(
            k_cache, kq[None], (layer_idx, zero, write_at, zero))
        v_cache = lax.dynamic_update_slice(
            v_cache, vq[None], (layer_idx, zero, write_at, zero))
        k_scale = lax.dynamic_update_slice(
            k_scale, ks[None], (layer_idx, zero, write_at))
        v_scale = lax.dynamic_update_slice(
            v_scale, vs[None], (layer_idx, zero, write_at))
    else:
        k_cache = lax.dynamic_update_slice(
            k_cache, k_new[None], (layer_idx, zero, write_at, zero))
        v_cache = lax.dynamic_update_slice(
            v_cache, v_new[None], (layer_idx, zero, write_at, zero))
    return k_cache, v_cache, k_scale, v_scale


def cached_attend(q, k_cache, v_cache, k_scale, v_scale, layer_idx,
                  attn_mask, region, kernel_path):
    """Attention over the stacked cache for one scanned layer: the Pallas
    length-aware kernel on TPU (reads int8 tiles directly when quantized —
    half the KV bytes), masked XLA `attend` elsewhere (dequantizing the
    layer's slice first when quantized)."""
    if kernel_path:
        from ..ops.attention import pick_block
        from ..ops.pallas_attention import verify_attention

        return verify_attention(
            q, k_cache, v_cache, region[0], region[1],
            block=pick_block(k_cache.shape[2]), layer_idx=layer_idx,
            k_scale=k_scale, v_scale=v_scale,
        )
    if k_scale is not None:
        k_l = kvc.dequantize_rows(k_cache[layer_idx], k_scale[layer_idx], q.dtype)
        v_l = kvc.dequantize_rows(v_cache[layer_idx], v_scale[layer_idx], q.dtype)
        return attend(q, k_l, v_l, attn_mask)
    return attend(q, k_cache[layer_idx], v_cache[layer_idx], attn_mask)


def attention_block(
    x: jax.Array,  # [S, hidden]
    lp: dict,  # this layer's params
    cfg: LlamaConfig,
    cos: jax.Array,
    sin: jax.Array,
    k_cache: jax.Array,  # [n_kv, max_len, head_dim]
    v_cache: jax.Array,
    write_at: jax.Array,  # scalar — row offset for the new block
    attn_mask: jax.Array,  # [S, max_len]
    region=None,  # optional (start, mask[S, T_reg]) => Pallas decode kernel
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (attn_out [S, hidden], k_new, v_new [n_kv, S, head_dim])."""
    s = x.shape[0]
    h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = qdot(x, lp["wq"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = qdot(x, lp["wk"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = qdot(x, lp["wv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if cfg.qkv_bias:
        q = q + lp["bq"].astype(x.dtype)
        k = k + lp["bk"].astype(x.dtype)
        v = v + lp["bv"].astype(x.dtype)

    q = q.reshape(s, h, d).transpose(1, 0, 2)  # [h, S, d]
    k = k.reshape(s, hkv, d).transpose(1, 0, 2)
    v = v.reshape(s, hkv, d).transpose(1, 0, 2)
    q, k = rope_ops.apply_rope(q, k, cos, sin)

    zero = jnp.zeros((), jnp.int32)
    k_full = lax.dynamic_update_slice(k_cache, k, (zero, write_at, zero))
    v_full = lax.dynamic_update_slice(v_cache, v, (zero, write_at, zero))

    out = attend_region(q, k_full, v_full, attn_mask, region)  # [h, S, d]
    out = out.transpose(1, 0, 2).reshape(s, h * d)
    out = qdot(out, lp["wo"], preferred_element_type=jnp.float32).astype(x.dtype)
    return out, k, v


def forward_hidden(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,  # [S, hidden]
    position_ids: jax.Array,  # [S] int32, or [3, S] for M-RoPE
    cache: KVCache,
    attn_mask: jax.Array,  # [S, max_len] bool
    region=None,  # optional (start, mask[S, T_reg]) => Pallas decode kernel
    return_new_kv: bool = False,
    seq_len=None,  # real kv length (dynamic-NTK stretch; None => from positions)
) -> Tuple[jax.Array, KVCache]:
    """Run the decoder stack; returns (last hidden [S, hidden], cache with the
    new block written at cache.length — call kv_cache.advance with the valid
    row count afterwards).  With ``return_new_kv`` also returns the appended
    [L, H_kv, S, D] K/V blocks (so callers can re-gather accepted rows without
    reading the big cache buffer back — see kv_cache.commit_from_blocks)."""
    if cfg.mrope_section is not None and position_ids.ndim == 2:
        cos, sin = rope_ops.mrope_cos_sin(
            position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta
        )
    else:
        cos, sin = rope_ops.cos_sin(
            position_ids,
            cfg.head_dim,
            cfg.rope_theta,
            cfg.rope_scaling_factor if cfg.rope_scaling_type == "linear" else 1.0,
            dynamic_ntk=(
                (cfg.rope_scaling_factor, cfg.max_position_embeddings)
                if cfg.rope_scaling_type == "dynamic" else None
            ),
            seq_len=seq_len,
        )

    write_at = cache.length

    # The caches ride the scan CARRY and are dynamic-update-sliced per layer:
    # while-loop carries alias operand/result buffers, so XLA keeps the
    # multi-hundred-MB cache updates in place.  (Emitting per-layer blocks as
    # scan outputs and writing them after the loop was measured to materialize
    # two full-cache copies per forward — ~1.6 ms/round at 7B.)
    from ..ops.attention import kernel_eligible, use_pallas

    kernel_path = (region is not None and use_pallas()
                   and kernel_eligible(cfg.head_dim, cache.max_len))

    quant_kv = cache.k.dtype == jnp.int8

    def layer_step(carry, xs):
        hidden, k_cache, v_cache, k_scale, v_scale, layer_idx = carry
        lp = xs
        residual = hidden
        normed = rms_norm(hidden, lp["input_norm"], cfg.rms_norm_eps)

        s = normed.shape[0]
        h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        q = qdot(normed, lp["wq"], preferred_element_type=jnp.float32).astype(normed.dtype)
        k = qdot(normed, lp["wk"], preferred_element_type=jnp.float32).astype(normed.dtype)
        v = qdot(normed, lp["wv"], preferred_element_type=jnp.float32).astype(normed.dtype)
        if cfg.qkv_bias:
            q = q + lp["bq"].astype(normed.dtype)
            k = k + lp["bk"].astype(normed.dtype)
            v = v + lp["bv"].astype(normed.dtype)
        q = q.reshape(s, h, d).transpose(1, 0, 2)
        k_new = k.reshape(s, hkv, d).transpose(1, 0, 2)
        v_new = v.reshape(s, hkv, d).transpose(1, 0, 2)
        q, k_new = rope_ops.apply_rope(q, k_new, cos, sin)

        k_cache, v_cache, k_scale, v_scale = append_kv(
            k_cache, v_cache, k_scale, v_scale, k_new, v_new, layer_idx,
            write_at)
        # kernel path reads the stacked cache directly — no per-layer slice
        # materialization (~8 MB x2 per layer per round at 7B)
        out = cached_attend(q, k_cache, v_cache, k_scale, v_scale, layer_idx,
                            attn_mask, region, kernel_path)
        out = out.transpose(1, 0, 2).reshape(s, h * d)
        attn_out = qdot(
            out, lp["wo"], preferred_element_type=jnp.float32
        ).astype(normed.dtype)

        hidden = residual + attn_out
        residual = hidden
        normed = rms_norm(hidden, lp["post_norm"], cfg.rms_norm_eps)
        hidden = residual + swiglu_mlp(normed, lp["w_gate"], lp["w_up"], lp["w_down"])
        ys = (k_new, v_new) if return_new_kv else None
        return (hidden, k_cache, v_cache, k_scale, v_scale, layer_idx + 1), ys

    init = (inputs_embeds, cache.k, cache.v,
            cache.k_scale if quant_kv else None,
            cache.v_scale if quant_kv else None, jnp.zeros((), jnp.int32))
    (hidden, new_k, new_v, new_ks, new_vs, _), ys = lax.scan(
        layer_step, init, params["layers"])
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    out_cache = cache._replace(k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs)
    if return_new_kv:
        return hidden, out_cache, ys
    return hidden, out_cache


def embed(params: dict, token_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], token_ids, axis=0)


def lm_head(params: dict, hidden: jax.Array) -> jax.Array:
    """[..., hidden] -> [..., vocab] float32 logits."""
    return qdot(hidden, params["lm_head"], preferred_element_type=jnp.float32)


def init_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random-initialized parameter pytree (tests / benches; real weights come
    from convert/hf.py)."""
    keys = jax.random.split(key, 10)
    l, d, i = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    hq, hkv, hd = cfg.num_attention_heads * cfg.head_dim, cfg.num_key_value_heads * cfg.head_dim, cfg.head_dim
    del hd

    def w(k, shape, scale=0.02):
        # generate directly in the target dtype: float32 intermediates for a 7B
        # model would transiently double HBM use
        return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

    layers = {
        "input_norm": jnp.ones((l, d), jnp.float32),
        "post_norm": jnp.ones((l, d), jnp.float32),
        "wq": w(keys[0], (l, d, hq)),
        "wk": w(keys[1], (l, d, hkv)),
        "wv": w(keys[2], (l, d, hkv)),
        "wo": w(keys[3], (l, hq, d)),
        "w_gate": w(keys[4], (l, d, i)),
        "w_up": w(keys[5], (l, d, i)),
        "w_down": w(keys[6], (l, i, d)),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((l, hq), dtype)
        layers["bk"] = jnp.zeros((l, hkv), dtype)
        layers["bv"] = jnp.zeros((l, hkv), dtype)
    return {
        "embed": w(keys[7], (cfg.vocab_size, d)),
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": w(keys[8], (d, cfg.vocab_size)),
    }
