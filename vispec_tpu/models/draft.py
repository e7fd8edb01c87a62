"""ViSpec draft model: 1-layer EAGLE-style drafter + vision adaptor, TPU-native.

Re-design of the reference draft (vispec/model/cnets_ours.py):

- ``ImgAdaptor`` (:603-661): ``num_q`` learned queries cross-attend over an image
  span's embeddings -> num_q compressed tokens.
- Prefill restructuring (:896-975): per image span, text tokens are fused with the
  previous span's last adapted vector via ``img_fc`` then with their token embeds
  via ``fc``; the image span is replaced by the first ``num_q - 1`` adapted tokens
  (keeping the span's last positions' position-ids); the final adapted token
  becomes the cached ``last_img_hidden`` broadcast into all later text.
- Decode steps (:976-988): every token takes ``fc([embed; img_fc([hidden;
  last_img_hidden])])``.
- ``topK_genrate`` (:1043-1238): depth-limited beam tree growth then global
  top-`total_tokens` re-ranking.

The TPU-native difference: the reference restructures the sequence with host
Python loops over dynamic spans.  Here a *host-side integer plan*
(:class:`PrefillPlan`, built once per prompt from the image mask — plain numpy,
no device sync) drives fully static gathers/scatters inside jit, and the beam
expansion is a static ``depth``-step loop producing the flat candidate pool that
``ops.tree.build_tree`` re-ranks on device.

Draft weights (names follow the HF ``JLKang/ViSpec-*`` checkpoints so the
converter is 1:1 — module tree at cnets_ours.py:683-757):
  embed:      [vocab, hidden]          (frozen copy of target's)
  layer:      dict like one llama.py layer, but NO input_norm (layer index 0
              skips input_layernorm — cnets_ours.py:537-539)
  fc_w:       [2*hidden, hidden], fc_b: [hidden]          (bias if cfg.fc_bias)
  img_fc_w:   [2*hidden, hidden], img_fc_b: [hidden]
  adaptor: q: [num_q, heads, head_dim], wk/wv: [hidden, heads*head_dim]
           (+ bk/bv if qkv_bias), wo: [heads*head_dim, hidden]
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..configs import DraftConfig, SpecConfig
from ..ops import rope as rope_ops
from ..ops.attention import attend, attend_region
from ..ops.kv_cache import KVCache, advance, init_cache
from ..ops.quant import Q4Tensor, QTensor, qdot, quantize_q4, quantize_q8
from ..ops.tree import Tree, build_tree
from ..ops.topk import top_k as fast_top_k
from .llama import rms_norm, swiglu_mlp


# ---------------------------------------------------------------------------
# Host-side prefill plan (per prompt, integers only)
# ---------------------------------------------------------------------------


class PrefillPlan(NamedTuple):
    """Restructure plan for the draft's compressed prefill — a *traced* pytree
    (arrays + int32 scalars) so changing prompts never recompiles; only the
    bucket sizes (pad_len, max_images, max_span — array shapes) key the jit.

    gather_src: [pad_len] int32 — source index into the original sequence for
        text slots (embeds/hiddens); arbitrary (0) for adapted slots.
    pos_ids:   [pad_len] int32 — position id of every compressed slot.
    is_adapted:[pad_len] bool  — slot holds an adapted image token.
    adapt_src: [pad_len] int32 — flat (image * (num_q-1) + q) index for adapted
        slots; 0 elsewhere.
    seg_id:    [pad_len] int32 — which last-img vector text slots fuse with
        (0 = zeros / before any image, s = image s-1's last adapted token).
    span_start:[max_images] int32, span_len: [max_images] int32 — image spans in
        the original sequence; zero-length spans are padding.
    num_images: [] int32 — actual image count (<= max_images).
    comp_len:  [] int32 — compressed length L_c.
    real_len:  [] int32 — logical sequence length L (position count).
    """

    gather_src: jax.Array
    pos_ids: jax.Array
    is_adapted: jax.Array
    adapt_src: jax.Array
    seg_id: jax.Array
    span_start: jax.Array
    span_len: jax.Array
    num_images: jax.Array
    comp_len: jax.Array
    real_len: jax.Array


def make_prefill_plan(
    image_mask: Optional[np.ndarray],  # [L] bool — SHIFTED mask (cnets_ours.py:880)
    seq_len: int,
    num_q: int,
    pad_len: int,
    max_images: int = 4,
    max_span: int = 1,
) -> Tuple[PrefillPlan, int]:
    """Build the compressed-sequence layout from consecutive-True image spans
    (host-side numpy, once per prompt — no device sync).

    Mirrors the span walk at cnets_ours.py:879-956: spans end where the mask
    drops (or at the final position if still True); each span contributes
    ``num_q - 1`` slots carrying the span's last ``num_q - 1`` position ids.

    ``max_span`` is the padded adaptor span bucket; callers should round the
    true max span length up to a bucket to limit recompiles.  Returns
    (plan, required_max_span) — re-call with a bigger bucket if needed.
    """
    gather = np.zeros(pad_len, np.int32)
    pos = np.zeros(pad_len, np.int32)
    is_ad = np.zeros(pad_len, bool)
    ad_src = np.zeros(pad_len, np.int32)
    seg = np.zeros(pad_len, np.int32)
    spans = []

    if image_mask is None:
        image_mask = np.zeros(seq_len, bool)
    else:
        image_mask = np.asarray(image_mask, bool).reshape(-1)
        # the mask may be one longer than the shifted token stream
        image_mask = image_mask[:seq_len]
        if image_mask.shape[0] < seq_len:
            image_mask = np.pad(image_mask, (0, seq_len - image_mask.shape[0]))

    out = 0
    cur_seg = 0
    i = 0
    while i < seq_len:
        if image_mask[i]:
            j = i
            while j + 1 < seq_len and image_mask[j + 1]:
                j += 1
            spans.append((i, j - i + 1))
            # the span's last num_q-1 positions label the kept adapted tokens
            for q in range(num_q - 1):
                if out >= pad_len:
                    raise ValueError(
                        f"pad_len {pad_len} too small for compressed sequence "
                        f"(seq_len={seq_len}, still at original index {i})"
                    )
                is_ad[out] = True
                ad_src[out] = (len(spans) - 1) * (num_q - 1) + q
                pos[out] = j - (num_q - 1) + 1 + q
                out += 1
            cur_seg = len(spans)
            i = j + 1
        else:
            if out >= pad_len:
                raise ValueError(
                    f"pad_len {pad_len} too small for compressed sequence "
                    f"(seq_len={seq_len}, still at original index {i})"
                )
            gather[out] = i
            pos[out] = i
            seg[out] = cur_seg
            out += 1
            i += 1

    comp_len = out
    if len(spans) > max_images:
        raise ValueError(f"too many image spans ({len(spans)}) for max_images={max_images}")

    span_start = np.zeros(max_images, np.int32)
    span_len = np.zeros(max_images, np.int32)
    for s, (st, ln) in enumerate(spans):
        span_start[s] = st
        span_len[s] = ln
    required_span = int(span_len.max()) if spans else 1
    max_span = max(max_span, required_span)

    plan = PrefillPlan(
        gather_src=jnp.asarray(gather),
        pos_ids=jnp.asarray(pos),
        is_adapted=jnp.asarray(is_ad),
        adapt_src=jnp.asarray(ad_src),
        seg_id=jnp.asarray(seg),
        span_start=jnp.asarray(span_start),
        span_len=jnp.asarray(span_len),
        num_images=jnp.asarray(len(spans), jnp.int32),
        comp_len=jnp.asarray(comp_len, jnp.int32),
        real_len=jnp.asarray(seq_len, jnp.int32),
    )
    return plan, max_span


# ---------------------------------------------------------------------------
# Draft modules
# ---------------------------------------------------------------------------


def img_adaptor(params: dict, cfg: DraftConfig, span_embeds: jax.Array, span_mask: jax.Array) -> jax.Array:
    """num_q learned queries cross-attend over one image span (cnets_ours.py:630-661).

    span_embeds: [max_span, hidden] (padded); span_mask: [max_span] bool.
    Returns [num_q, hidden].
    """
    h, d = cfg.num_attention_heads, cfg.head_dim
    a = params["adaptor"]
    k = jnp.dot(span_embeds, a["wk"], preferred_element_type=jnp.float32).astype(span_embeds.dtype)
    v = jnp.dot(span_embeds, a["wv"], preferred_element_type=jnp.float32).astype(span_embeds.dtype)
    if cfg.qkv_bias:
        k = k + a["bk"].astype(k.dtype)
        v = v + a["bv"].astype(v.dtype)
    k = k.reshape(-1, h, d).transpose(1, 0, 2)  # [h, S, d]
    v = v.reshape(-1, h, d).transpose(1, 0, 2)
    q = a["q"].astype(k.dtype).transpose(1, 0, 2)  # [h, num_q, d]
    mask = jnp.broadcast_to(span_mask[None, :], (cfg.num_q, span_mask.shape[0]))
    out = attend(q, k, v, mask)  # [h, num_q, d]
    out = out.transpose(1, 0, 2).reshape(cfg.num_q, h * d)
    return jnp.dot(out, a["wo"], preferred_element_type=jnp.float32).astype(span_embeds.dtype)


def fuse_weight_mats(params: dict, cfg: DraftConfig):
    """The two request-INDEPENDENT matrices of the decode-path fuse fold
    (see decode_fuse_weights): W_e = F1 and W_h = G1 @ F2 (or F2 for EAGLE).
    SpecModel precomputes these once into dparams["fuse_we"/"fuse_wh"] so
    batched/serving states don't carry B identical [D, D] copies."""
    d = cfg.hidden_size
    f1 = params["fc_w"][:d]
    f2 = params["fc_w"][d:]
    if "img_fc_w" in params:
        g1 = params["img_fc_w"][:d]
        w_h = jnp.dot(g1, f2, preferred_element_type=jnp.float32).astype(f1.dtype)
    else:  # EAGLE: no img_fc stage
        w_h = f2
    wq = params["layer"].get("wq")
    if isinstance(wq, Q4Tensor):
        # int4-draft mode: fold matrices match the layer's byte width
        return quantize_q4(f1), quantize_q4(w_h.astype(jnp.float32))
    if isinstance(wq, QTensor):
        # quantized-draft mode: match the int8 layer's bandwidth profile
        return quantize_q8(f1), quantize_q8(w_h.astype(jnp.float32))
    return f1, w_h


def ensure_fuse_mats(params: dict, cfg: DraftConfig):
    """Precomputed fuse matrices when present (SpecModel), derived otherwise
    (raw spec_loop callers / tests — pays a [D,D] matmul per call)."""
    if "fuse_we" in params and "fuse_wh" in params:
        return params["fuse_we"], params["fuse_wh"]
    return fuse_weight_mats(params, cfg)


def decode_fuse_bias(params: dict, cfg: DraftConfig, last_img: jax.Array) -> jax.Array:
    """The request-dependent constant of the fuse fold:
    b_eff = (L @ G2 + gb) @ F2 + fb (L = last_img, fixed per generation)."""
    d = cfg.hidden_size
    f2 = params["fc_w"][d:]
    b = params.get("fc_b", jnp.zeros((d,), f2.dtype)).astype(jnp.float32)
    if "img_fc_w" in params:
        g2 = params["img_fc_w"][d:]
        gb = params.get("img_fc_b", jnp.zeros((d,), f2.dtype)).astype(jnp.float32)
        bias = (jnp.dot(last_img.astype(jnp.float32), g2.astype(jnp.float32))
                + gb) @ f2.astype(jnp.float32) + b
    else:
        bias = b
    return bias.astype(jnp.float32)


def decode_fuse_weights(params: dict, cfg: DraftConfig, last_img: jax.Array):
    """Fold the decode-path fc(img_fc(.)) composition into two D x D matmuls.

    fc([e; img_fc([h; L])]) = e @ F1 + h @ (G1 @ F2) + (L @ G2 + gb) @ F2 + fb
    where fc_w = [F1; F2], img_fc_w = [G1; G2] and L (last_img) is constant for
    the whole generation (cnets_ours.py:976-988).  Halves the fuse-stage weight
    traffic per draft step and collapses 4 matmuls + 2 concats into 2 matmuls
    + adds.  Returns (W_e [D, D], W_h [D, D], b_eff [D]).
    """
    w_e, w_h = ensure_fuse_mats(params, cfg)
    return w_e, w_h, decode_fuse_bias(params, cfg, last_img)


def fused_input(w_e, w_h, b_eff, embeds: jax.Array, hidden: jax.Array) -> jax.Array:
    out = (qdot(embeds, w_e, preferred_element_type=jnp.float32)
           + qdot(hidden, w_h, preferred_element_type=jnp.float32) + b_eff)
    return out.astype(hidden.dtype)


def fuse(params: dict, embeds: jax.Array, hidden: jax.Array, last_img: jax.Array) -> jax.Array:
    """img_fc + fc input fusion for decode-path tokens (cnets_ours.py:976-988).

    embeds/hidden: [S, hidden]; last_img: [hidden] broadcast to every token.
    Without img_fc weights (EAGLE-2 drafts, cnets.py) the img_fc stage is
    skipped and fusion is fc([embed; hidden]) only.
    """
    if "img_fc_w" in params:
        img_in = jnp.concatenate(
            [hidden, jnp.broadcast_to(last_img[None], hidden.shape)], axis=-1
        )
        fused = jnp.dot(img_in, params["img_fc_w"], preferred_element_type=jnp.float32)
        if "img_fc_b" in params:
            fused = fused + params["img_fc_b"]
        fused = fused.astype(hidden.dtype)
    else:
        fused = hidden
    fc_in = jnp.concatenate([embeds, fused], axis=-1)
    out = jnp.dot(fc_in, params["fc_w"], preferred_element_type=jnp.float32)
    if "fc_b" in params:
        out = out + params["fc_b"]
    return out.astype(hidden.dtype)


def _fuse_img_only(params: dict, hidden: jax.Array, last_img_per_tok: jax.Array) -> jax.Array:
    if "img_fc_w" not in params:  # EAGLE-2 draft: no vision fusion
        return hidden
    img_in = jnp.concatenate([hidden, last_img_per_tok], axis=-1)
    fused = jnp.dot(img_in, params["img_fc_w"], preferred_element_type=jnp.float32)
    if "img_fc_b" in params:
        fused = fused + params["img_fc_b"]
    return fused.astype(hidden.dtype)


def _fc(params: dict, embeds: jax.Array, fused: jax.Array) -> jax.Array:
    fc_in = jnp.concatenate([embeds, fused], axis=-1)
    out = jnp.dot(fc_in, params["fc_w"], preferred_element_type=jnp.float32)
    if "fc_b" in params:
        out = out + params["fc_b"]
    return out.astype(fused.dtype)


def layer_forward(
    params: dict,
    cfg: DraftConfig,
    x: jax.Array,  # [S, hidden] — already fc-fused
    position_ids: jax.Array,  # [S]
    cache: KVCache,
    write_at: jax.Array,
    attn_mask: jax.Array,  # [S, max_len]
    region=None,  # optional (start, mask[S, T_reg]) => Pallas decode kernel
) -> Tuple[jax.Array, KVCache]:
    """One llama decoder layer with layer-0 semantics (no input layernorm,
    cnets_ours.py:537-539, 570-590).  Single-layer drafts only (all reference
    configs have num_hidden_layers=1)."""
    lp = params["layer"]
    cos, sin = rope_ops.cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
    s = x.shape[0]
    h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = qdot(x, lp["wq"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = qdot(x, lp["wk"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = qdot(x, lp["wv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if cfg.qkv_bias:
        q = q + lp["bq"].astype(x.dtype)
        k = k + lp["bk"].astype(x.dtype)
        v = v + lp["bv"].astype(x.dtype)
    q = q.reshape(s, h, d).transpose(1, 0, 2)
    k = k.reshape(s, hkv, d).transpose(1, 0, 2)
    v = v.reshape(s, hkv, d).transpose(1, 0, 2)
    q, k = rope_ops.apply_rope(q, k, cos, sin)

    zero = jnp.zeros((), jnp.int32)
    k_full = lax.dynamic_update_slice(cache.k[0], k, (zero, write_at, zero))
    v_full = lax.dynamic_update_slice(cache.v[0], v, (zero, write_at, zero))
    attn = attend_region(q, k_full, v_full, attn_mask, region)
    attn = attn.transpose(1, 0, 2).reshape(s, h * d)
    attn = qdot(attn, lp["wo"], preferred_element_type=jnp.float32).astype(x.dtype)

    hidden = x + attn
    residual = hidden
    normed = rms_norm(hidden, lp["post_norm"], cfg.rms_norm_eps)
    hidden = residual + swiglu_mlp(normed, lp["w_gate"], lp["w_up"], lp["w_down"])

    cache = cache._replace(k=k_full[None], v=v_full[None])
    return hidden, cache


def layer_forward_nocache(
    params: dict,
    cfg: DraftConfig,
    x: jax.Array,  # [S, hidden] — already fc-fused
    position_ids: jax.Array,  # [S]
    attn_mask: jax.Array,  # [S, S] bool
) -> jax.Array:
    """Cache-less decoder layer for training (full-sequence, differentiable)."""
    lp = params["layer"]
    cos, sin = rope_ops.cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
    s = x.shape[0]
    h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = jnp.dot(x, lp["wq"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(x, lp["wk"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(x, lp["wv"], preferred_element_type=jnp.float32).astype(x.dtype)
    if cfg.qkv_bias:
        q = q + lp["bq"].astype(x.dtype)
        k = k + lp["bk"].astype(x.dtype)
        v = v + lp["bv"].astype(x.dtype)
    q = q.reshape(s, h, d).transpose(1, 0, 2)
    k = k.reshape(s, hkv, d).transpose(1, 0, 2)
    v = v.reshape(s, hkv, d).transpose(1, 0, 2)
    q, k = rope_ops.apply_rope(q, k, cos, sin)
    attn = attend(q, k, v, attn_mask)
    attn = attn.transpose(1, 0, 2).reshape(s, h * d)
    attn = jnp.dot(attn, lp["wo"], preferred_element_type=jnp.float32).astype(x.dtype)

    hidden = x + attn
    residual = hidden
    normed = rms_norm(hidden, lp["post_norm"], cfg.rms_norm_eps)
    return residual + swiglu_mlp(normed, lp["w_gate"], lp["w_up"], lp["w_down"])


def compress_inputs(
    params: dict,
    cfg: DraftConfig,
    target_hidden: jax.Array,  # [pad_len, hidden]
    embeds: jax.Array,  # [pad_len, hidden] (vision-merged, shifted)
    plan: PrefillPlan,
    max_span: int,
) -> Tuple[jax.Array, jax.Array]:
    """Shared compressed-sequence assembly for prefill and training
    (cnets_ours.py:896-975): adaptor over image spans, img_fc/fc text fusion,
    adapted-slot substitution.  Returns (x [pad_len, hidden],
    last_img_table [max_images+1, hidden])."""
    pad_len = plan.gather_src.shape[0]
    max_images = plan.span_start.shape[0]
    embeds = embeds.astype(target_hidden.dtype)

    span_cols = jnp.arange(max_span, dtype=jnp.int32)

    def run_span(st, ln):
        idx = jnp.clip(st + span_cols, 0, pad_len - 1)
        return img_adaptor(
            params, cfg, jnp.take(embeds, idx, axis=0), span_cols < ln
        )

    if "adaptor" in params:  # EAGLE-2 drafts have no ImgAdaptor (cnets.py)
        adapted = jax.vmap(run_span)(plan.span_start, plan.span_len)  # [M, nq, D]
    else:
        adapted = jnp.zeros(
            (max_images, cfg.num_q, cfg.hidden_size), target_hidden.dtype
        )

    # last-img lookup: slot 0 = zeros, slot s = image s-1's final adapted token
    last_img_table = jnp.concatenate(
        [jnp.zeros((1, cfg.hidden_size), target_hidden.dtype), adapted[:, -1, :]],
        axis=0,
    )

    txt_hidden = jnp.take(target_hidden, plan.gather_src, axis=0)
    txt_embeds = jnp.take(embeds, plan.gather_src, axis=0)
    txt_img = jnp.take(last_img_table, jnp.clip(plan.seg_id, 0, max_images), axis=0)
    text_out = _fc(params, txt_embeds, _fuse_img_only(params, txt_hidden, txt_img))

    # adapted slots carry each span's first num_q-1 adapted tokens
    if cfg.num_q > 1:
        adapted_flat = adapted[:, : cfg.num_q - 1, :].reshape(-1, cfg.hidden_size)
    else:  # num_q == 1 -> no kept adapted tokens; dummy row keeps shapes static
        adapted_flat = jnp.zeros((1, cfg.hidden_size), target_hidden.dtype)
    ad_src = jnp.clip(plan.adapt_src, 0, adapted_flat.shape[0] - 1)
    x = jnp.where(
        plan.is_adapted[:, None], jnp.take(adapted_flat, ad_src, axis=0), text_out
    )
    return x, last_img_table



def forward_train(
    params: dict,
    cfg: DraftConfig,
    target_hidden: jax.Array,  # [pad_len, hidden] — (possibly noised) target hiddens
    embeds: jax.Array,  # [pad_len, hidden] — input embeds (vision-merged)
    plan: PrefillPlan,
    max_span: int = 1,
) -> jax.Array:
    """Training-time full-sequence forward with compression + re-scatter.

    Reference: cnets_ours.Model.forward's use_cache=False path with the
    ``trans_mat`` einsum re-scatter (cnets_ours.py:1020-1030).  The scatter is
    position-indexed: compressed slot s writes to original position
    ``plan.pos_ids[s]`` (trans_mat columns are exactly those positions); dropped
    image positions stay zero.  Returns [pad_len, hidden].
    """
    pad_len = plan.gather_src.shape[0]
    x, _ = compress_inputs(params, cfg, target_hidden, embeds, plan, max_span)

    rows = jnp.arange(pad_len, dtype=jnp.int32)
    valid = rows < plan.comp_len
    attn_mask = (rows[None, :] <= rows[:, None]) & valid[None, :]
    hidden = layer_forward_nocache(params, cfg, x, plan.pos_ids, attn_mask)

    # trans_mat re-scatter: slot s -> original position pos_ids[s]
    out = jnp.zeros_like(hidden)
    scatter_pos = jnp.where(valid, plan.pos_ids, pad_len - 1)
    out = out.at[scatter_pos].add(jnp.where(valid[:, None], hidden, 0.0))
    return out


# ---------------------------------------------------------------------------
# Prefill (compressed) and decode-append forwards
# ---------------------------------------------------------------------------


def prefill(
    params: dict,
    cfg: DraftConfig,
    target_hidden: jax.Array,  # [pad_len, hidden] (padded original sequence)
    embeds: jax.Array,  # [pad_len, hidden] — SHIFTED input embeds (the target's
    # merged vision embeds shifted by one with the sampled token's embedding
    # appended — cnets_ours.py:1066-1082 — so the adaptor sees vision features)
    plan: PrefillPlan,
    cache: KVCache,
    max_span: int = 1,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Compressed draft prefill.  Returns (last_hidden [hidden],
    last_img [hidden], cache advanced to comp_len/real_len).

    Reference: the stable_kv-less branch of Model.forward
    (cnets_ours.py:896-975) followed by the KV save at :1108.
    ``max_span`` is the static adaptor span bucket from make_prefill_plan.
    """
    pad_len = plan.gather_src.shape[0]
    max_images = plan.span_start.shape[0]
    x, last_img_table = compress_inputs(
        params, cfg, target_hidden, embeds, plan, max_span
    )

    # --- run the decoder layer over the compressed sequence ---
    rows = jnp.arange(pad_len, dtype=jnp.int32)
    # plain causal over compressed slots (cnets_ours.py:971-975)
    attn_mask = jnp.zeros((pad_len, cache.max_len), bool)
    attn_mask = attn_mask.at[:, :pad_len].set(rows[None, :] <= rows[:, None])

    write_at = jnp.zeros((), jnp.int32)
    hidden, cache = layer_forward(params, cfg, x, plan.pos_ids, cache, write_at, attn_mask)
    cache = advance(cache, plan.comp_len, plan.real_len)

    last_hidden = jnp.take(hidden, plan.comp_len - 1, axis=0)
    last_img = jnp.take(last_img_table, jnp.clip(plan.num_images, 0, max_images), axis=0)
    return last_hidden, last_img, cache


def append_accepted(
    params: dict,
    cfg: DraftConfig,
    accept_hidden: jax.Array,  # [max_path+1, hidden] — padded accepted hiddens
    accept_tokens: jax.Array,  # [max_path+1] int32 — paired (shifted) tokens
    num_valid: jax.Array,  # scalar — acc+1 real rows
    last_img: jax.Array,
    cache: KVCache,
    fuse_w=None,  # optional (w_e, w_h, b_eff) from decode_fuse_weights
) -> Tuple[jax.Array, KVCache]:
    """Decode-path draft forward over newly accepted tokens, appending to the
    stable KV (reference: topK_genrate's stable_kv branch, cnets_ours.py:1090-1097,
    via the fuse path :976-988).  Returns (seed_hidden [hidden], cache)."""
    s = accept_tokens.shape[0]
    embeds = jnp.take(params["embed"], accept_tokens, axis=0).astype(accept_hidden.dtype)
    if fuse_w is not None:
        x = fused_input(fuse_w[0], fuse_w[1], fuse_w[2], embeds, accept_hidden)
    else:
        x = fuse(params, embeds, accept_hidden, last_img)

    pos_ids = cache.real_length + jnp.arange(s, dtype=jnp.int32)
    cols = jnp.arange(cache.max_len, dtype=jnp.int32)
    rows = jnp.arange(s, dtype=jnp.int32)
    committed = cols[None, :] < cache.length
    in_block = (cols[None, :] >= cache.length) & (
        cols[None, :] <= cache.length + rows[:, None]
    )
    attn_mask = committed | in_block

    tri = jnp.tril(jnp.ones((s, s), bool))
    hidden, cache = layer_forward(
        params, cfg, x, pos_ids, cache, cache.length, attn_mask,
        region=(cache.length, tri),
    )
    cache = advance(cache, num_valid, num_valid)
    seed = hidden[jnp.clip(num_valid - 1, 0, s - 1)]
    return seed, cache


# ---------------------------------------------------------------------------
# Beam tree expansion (topK_genrate core)
# ---------------------------------------------------------------------------


def expand_tree(
    params: dict,
    cfg: DraftConfig,
    spec: SpecConfig,
    seed_hidden: jax.Array,  # [hidden] — draft output at the frontier token
    sample_token: jax.Array,  # [] int32 — committed root token
    last_img: jax.Array,  # [hidden]
    head_w: jax.Array,  # [hidden, vocab] target lm_head (draft-device clone)
    cache: KVCache,
    fuse_w=None,  # optional (w_e, w_h, b_eff) from decode_fuse_weights
) -> Tuple[Tree, KVCache]:
    """Depth-limited beam growth + global re-rank (cnets_ours.py:1109-1191).

    The draft KV scratch region [cache.length, cache.length + depth*top_k) holds
    the tree tokens; it is NOT committed (lengths unchanged), so the next round's
    append simply overwrites it — the functional analogue of the reference
    saving ``stable_kv`` before expansion (cnets_ours.py:1108).
    """
    k_beam = spec.top_k
    depth = spec.depth
    num_cand = spec.num_candidates
    vdtype = seed_hidden.dtype

    logits0 = qdot(seed_hidden, head_w, preferred_element_type=jnp.float32)
    logp0 = jax.nn.log_softmax(logits0)
    top_p0, top_i0 = fast_top_k(logp0, k_beam)

    tokens_flat = jnp.zeros((num_cand,), jnp.int32).at[:k_beam].set(top_i0)
    scores_flat = jnp.full((num_cand,), -jnp.inf, jnp.float32).at[:k_beam].set(top_p0)
    parent1_flat = jnp.zeros((num_cand,), jnp.int32)  # root children: parent 0

    stable_len = cache.length
    real_len = cache.real_length
    scratch_cols = depth * k_beam

    beam_scores = top_p0  # [K]
    beam_tokens = top_i0
    beam_hidden = jnp.broadcast_to(seed_hidden[None], (k_beam, cfg.hidden_size)).astype(vdtype)
    beam_src = jnp.arange(k_beam, dtype=jnp.int32)  # global flat idx of each beam
    # beam ancestry over scratch columns [K, depth*K]
    beam_mask = jnp.zeros((k_beam, scratch_cols), bool)

    cols_all = jnp.arange(cache.max_len, dtype=jnp.int32)

    def depth_step(i, carry):
        (beam_scores, beam_tokens, beam_hidden, beam_src, beam_mask,
         tokens_flat, scores_flat, parent1_flat, cache_k, cache_v) = carry

        # fuse + layer forward for the K beam tokens at position real_len + i
        embeds = jnp.take(params["embed"], beam_tokens, axis=0).astype(vdtype)
        if fuse_w is not None:
            x = fused_input(fuse_w[0], fuse_w[1], fuse_w[2], embeds, beam_hidden)
        else:
            x = fuse(params, embeds, beam_hidden, last_img)
        pos_ids = jnp.full((k_beam,), real_len + i, jnp.int32)

        write_at = stable_len + i * k_beam
        # mask: committed stable rows + scratch ancestry + self (eye)
        committed = cols_all[None, :] < stable_len
        rel = jnp.clip(cols_all[None, :] - stable_len, 0, scratch_cols - 1)
        in_scratch = (cols_all[None, :] >= stable_len) & (
            cols_all[None, :] < stable_len + i * k_beam
        )
        anc = jnp.take_along_axis(
            beam_mask, jnp.broadcast_to(rel, (k_beam, cache.max_len)), axis=1
        )
        self_block = (cols_all[None, :] >= write_at) & (
            cols_all[None, :] < write_at + k_beam
        )
        eye_rel = (cols_all[None, :] - write_at) == jnp.arange(k_beam)[:, None]
        attn_mask = committed | (in_scratch & anc) | (self_block & eye_rel)

        # region-relative visibility over the scratch window for the kernel path
        sc = jnp.arange(scratch_cols)
        reg_prior = (sc[None, :] < i * k_beam) & beam_mask
        reg_self = (sc[None, :] - i * k_beam) == jnp.arange(k_beam)[:, None]
        reg_mask = reg_prior | reg_self  # [K, scratch_cols]

        tmp_cache = KVCache(cache_k, cache_v, stable_len, real_len)
        hidden, tmp_cache = layer_forward(
            params, cfg, x, pos_ids, tmp_cache, write_at, attn_mask,
            region=(stable_len, reg_mask),
        )

        logits = qdot(hidden, head_w, preferred_element_type=jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)  # [K, V]
        top_p, top_i = fast_top_k(logp, k_beam)  # [K, K]
        cu = top_p + beam_scores[:, None]  # [K, K]

        # record this depth's K*K candidates in reference flat order
        block = k_beam + i * k_beam * k_beam
        flat_tokens = top_i.reshape(-1).astype(jnp.int32)
        flat_scores = cu.reshape(-1)
        # parent of candidate (b, r) = 1 + global flat index of beam b
        flat_parent = jnp.repeat(beam_src + 1, k_beam)
        tokens_flat = lax.dynamic_update_slice(tokens_flat, flat_tokens, (block,))
        scores_flat = lax.dynamic_update_slice(scores_flat, flat_scores, (block,))
        parent1_flat = lax.dynamic_update_slice(parent1_flat, flat_parent, (block,))

        # select next K beams from the K*K pool
        new_scores, cs_idx = lax.top_k(cu.reshape(-1), k_beam)
        out_ids = (cs_idx // k_beam).astype(jnp.int32)
        new_tokens = flat_tokens[cs_idx]
        new_hidden = hidden[out_ids]
        new_src = block + cs_idx.astype(jnp.int32)

        # ancestry: inherit selected parents' mask, mark own column
        inherited = beam_mask[out_ids]
        own_col = i * k_beam + out_ids  # parent row position in scratch == its slot
        # each new beam descends from parent beam out_ids[b] whose scratch slot is
        # (i*K + out_ids[b]); mark it
        inherited = inherited | (
            jnp.arange(scratch_cols)[None, :] == own_col[:, None]
        )

        return (new_scores, new_tokens, new_hidden, new_src, inherited,
                tokens_flat, scores_flat, parent1_flat, tmp_cache.k, tmp_cache.v)

    carry = (beam_scores, beam_tokens, beam_hidden, beam_src, beam_mask,
             tokens_flat, scores_flat, parent1_flat, cache.k, cache.v)
    # fori_loop (not unrolled): the loop carries the multi-MB cache arrays and
    # XLA keeps the carried dynamic_update_slice in place; unrolling was
    # measured ~1.4ms/round SLOWER at 7B (buffer copies between steps).
    carry = lax.fori_loop(0, depth, depth_step, carry, unroll=False)
    (beam_scores, beam_tokens, beam_hidden, beam_src, beam_mask,
     tokens_flat, scores_flat, parent1_flat, cache_k, cache_v) = carry

    cache = cache._replace(k=cache_k, v=cache_v)  # lengths untouched => scratch
    tree = build_tree(
        sample_token,
        tokens_flat,
        scores_flat,
        parent1_flat,
        spec.total_tokens,
        max_depth=depth + 1,
    )
    return tree, cache


def init_params(cfg: DraftConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(key, 12)
    d, i = cfg.hidden_size, cfg.intermediate_size
    hq = cfg.num_attention_heads * cfg.head_dim
    hkv = cfg.num_key_value_heads * cfg.head_dim

    def w(k, shape, scale=0.02):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

    layer = {
        "post_norm": jnp.ones((d,), jnp.float32),
        "wq": w(keys[0], (d, hq)),
        "wk": w(keys[1], (d, hkv)),
        "wv": w(keys[2], (d, hkv)),
        "wo": w(keys[3], (hq, d)),
        "w_gate": w(keys[4], (d, i)),
        "w_up": w(keys[5], (d, i)),
        "w_down": w(keys[6], (i, d)),
    }
    if cfg.qkv_bias:
        layer["bq"] = jnp.zeros((hq,), dtype)
        layer["bk"] = jnp.zeros((hkv,), dtype)
        layer["bv"] = jnp.zeros((hkv,), dtype)

    params = {
        "embed": w(keys[11], (cfg.vocab_size, d)),
        "layer": layer,
        "fc_w": w(keys[0], (2 * d, d)),
    }
    if cfg.fc_bias:
        params["fc_b"] = jnp.zeros((d,), dtype)

    if cfg.vision:
        adaptor = {
            "q": (jax.random.normal(keys[7], (cfg.num_q, cfg.num_attention_heads, cfg.head_dim), jnp.float32) * cfg.head_dim**-0.5).astype(dtype),
            "wk": w(keys[8], (d, hq)),
            "wv": w(keys[9], (d, hq)),
            "wo": w(keys[10], (hq, d)),
        }
        if cfg.qkv_bias:
            adaptor["bk"] = jnp.zeros((hq,), dtype)
            adaptor["bv"] = jnp.zeros((hq,), dtype)
        params["adaptor"] = adaptor
        # img_fc initialized identity-on-hidden / zero-on-image (cnets_ours.py:752-757)
        params["img_fc_w"] = jnp.concatenate(
            [jnp.eye(d, dtype=jnp.float32), jnp.zeros((d, d), jnp.float32)], axis=0
        ).astype(dtype)
        if cfg.fc_bias:
            params["img_fc_b"] = jnp.zeros((d,), dtype)
    return params


def init_draft_cache(cfg: DraftConfig, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    return init_cache(1, cfg.num_key_value_heads, max_len, cfg.head_dim, dtype)
