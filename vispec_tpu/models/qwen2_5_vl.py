"""Qwen2.5-VL vision transformer + M-RoPE planning, TPU-native.

Reference: vispec/model/modeling_qwen2_5_vl_kv.py —
Qwen2_5_VisionTransformerPretrainedModel (:457-640: patchify, 2-D vision RoPE,
windowed attention with `fullatt_block_indexes`, 2x2 patch merger) and
`get_rope_index` (:1789-2008: 3-D M-RoPE position ids + rope_deltas).

TPU-native design decisions:
- The reference's flash-attn varlen over `cu_seqlens` becomes dense attention
  with a *segment-id* mask (tokens attend within their window / image); the
  window shuffle order, segment ids, and the merger's inverse permutation are
  host-side integer planning from `grid_thw` (`plan_vision`), bucketed to a
  static padded length.
- The Conv3d patch embed is a single matmul over pre-extracted patch vectors.
- The text backbone is models/llama.py with qkv_bias + mrope_section; the 3-D
  position ids come from `get_rope_index_host` (pure numpy, once per prompt).

Weights (HF `visual.*`):
  patch_w: [in_ch*t_patch*p*p, hidden]
  blocks: norm1/norm2: [L, hidden] (f32 RMSNorm), wqkv: [L, hidden, 3*hidden],
          bqkv: [L, 3*hidden], wo: [L, hidden, hidden], bo: [L, hidden],
          w_gate/w_up: [L, hidden, inter], b_gate/b_up: [L, inter],
          w_down: [L, inter, hidden], b_down: [L, hidden]
  merger: ln_q: [hidden] (f32), w1: [4*hidden, 4*hidden], b1, w2: [4*hidden, out], b2
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .llama import rms_norm

QWEN_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
QWEN_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class QwenVisionConfig:
    hidden_size: int = 1280
    out_hidden_size: int = 3584  # text hidden
    intermediate_size: int = 3420
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    in_channels: int = 3
    tokens_per_second: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2


class VisionPlan(NamedTuple):
    """Host plan for one ViT pass over (possibly several) images.

    All index arrays are in *window-shuffled* order of length pad_len (padded
    with pad_len-1 self-loops / segment -1):

    perm:       [pad_len] — window-shuffled source index into the natural-order
                patch sequence (including the merge-unit interleave).
    inv_perm:   [n_merged] — maps merger outputs back to natural order
                (reference reverse_indices, :634).
    win_seg:    [pad_len] — window id per token (mask for windowed layers).
    img_seg:    [pad_len] — image id per token (mask for full-attention layers).
    pos_hw:     [pad_len, 2] — (h, w) rotary position per token (shuffled order).
    n_tokens:   true patch count (pre-merge);  n_merged = n_tokens // merge_unit.
    """

    perm: np.ndarray
    inv_perm: np.ndarray
    win_seg: np.ndarray
    img_seg: np.ndarray
    pos_hw: np.ndarray
    n_tokens: int
    n_merged: int


def plan_vision(grid_thw: Sequence[Tuple[int, int, int]], cfg: QwenVisionConfig,
                pad_len: int) -> VisionPlan:
    """Window shuffle + segment ids + 2-D positions (reference get_window_index
    :521-566 and rot_pos_emb :492-519), all in numpy."""
    sms = cfg.spatial_merge_size
    unit = cfg.merge_unit
    vit_ws = cfg.window_size // sms // cfg.patch_size  # merger-grid window size

    perm_units: List[np.ndarray] = []  # merged-unit indices in window order
    win_seg_units: List[np.ndarray] = []
    img_seg_units: List[np.ndarray] = []
    pos_list: List[np.ndarray] = []  # natural patch order (h, w)
    unit_base = 0
    win_id = 0
    for img_i, (t, h, w) in enumerate(grid_thw):
        gh, gw = h // sms, w // sms
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h = (-gh) % vit_ws
        pad_w = (-gw) % vit_ws
        padded = np.full((t, gh + pad_h, gw + pad_w), -100, np.int64)
        padded[:, :gh, :gw] = idx
        nwh, nww = (gh + pad_h) // vit_ws, (gw + pad_w) // vit_ws
        padded = padded.reshape(t, nwh, vit_ws, nww, vit_ws)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(t, nwh * nww, vit_ws, vit_ws)
        for ti in range(t):
            for wi in range(nwh * nww):
                vals = padded[ti, wi].reshape(-1)
                vals = vals[vals != -100]
                if vals.size == 0:
                    continue
                perm_units.append(vals + unit_base)
                win_seg_units.append(np.full(vals.size, win_id))
                img_seg_units.append(np.full(vals.size, img_i))
                win_id += 1
        unit_base += t * gh * gw

        # natural-order (h, w) positions with the merge-unit interleave
        hpos = np.arange(h)[:, None].repeat(w, 1)
        hpos = hpos.reshape(gh, sms, gw, sms).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, 0)
        wpos = wpos.reshape(gh, sms, gw, sms).transpose(0, 2, 1, 3).reshape(-1)
        hw = np.stack([hpos, wpos], -1)  # [h*w, 2]
        pos_list.append(np.tile(hw, (t, 1)))

    perm_u = np.concatenate(perm_units)  # [n_merged] window-order unit ids
    n_merged = perm_u.shape[0]
    n_tokens = n_merged * unit
    if n_tokens > pad_len:
        raise ValueError(f"pad_len {pad_len} < {n_tokens} vision tokens")

    # token-level permutation: unit u -> tokens [u*unit, (u+1)*unit)
    perm = (perm_u[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    win_seg = np.repeat(np.concatenate(win_seg_units), unit)
    img_seg = np.repeat(np.concatenate(img_seg_units), unit)
    pos_nat = np.concatenate(pos_list, 0)  # natural order
    pos_hw = pos_nat[perm]

    inv_perm = np.argsort(perm_u)

    pad = pad_len - n_tokens
    return VisionPlan(
        perm=np.concatenate([perm, np.full(pad, 0)]).astype(np.int32),
        inv_perm=inv_perm.astype(np.int32),
        win_seg=np.concatenate([win_seg, np.full(pad, -1)]).astype(np.int32),
        img_seg=np.concatenate([img_seg, np.full(pad, -1)]).astype(np.int32),
        pos_hw=np.concatenate([pos_hw, np.zeros((pad, 2))]).astype(np.int32),
        n_tokens=n_tokens,
        n_merged=n_merged,
    )


def vision_rope(pos_hw: jax.Array, head_dim: int, theta: float = 10000.0):
    """2-D rotary: half the (half-)freqs from h, half from w (rot_pos_emb)."""
    quarter = head_dim // 4
    inv = 1.0 / (theta ** (np.arange(quarter, dtype=np.float32) * 2 / (head_dim // 2)))
    inv = jnp.asarray(inv)
    freqs = pos_hw.astype(jnp.float32)[:, :, None] * inv[None, None, :]  # [S,2,q]
    half = freqs.reshape(pos_hw.shape[0], -1)  # [S, head_dim//2] (h-freqs then w)
    emb = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def forward(params: dict, cfg: QwenVisionConfig, patches: jax.Array,
            plan: VisionPlan) -> jax.Array:
    """patches: [pad_len, in_ch*t_patch*p*p] natural order, padded.
    Returns merged features [pad_len//merge_unit, out_hidden] in natural order
    (rows beyond plan.n_merged are garbage)."""
    x = jnp.dot(patches.astype(params["patch_w"].dtype), params["patch_w"],
                preferred_element_type=jnp.float32).astype(params["patch_w"].dtype)
    perm = jnp.asarray(plan.perm)
    x = jnp.take(x, perm, axis=0)  # window-shuffled

    cos, sin = vision_rope(jnp.asarray(plan.pos_hw), cfg.head_dim)

    win_seg = jnp.asarray(plan.win_seg)
    img_seg = jnp.asarray(plan.img_seg)
    win_mask = (win_seg[:, None] == win_seg[None, :]) & (win_seg[:, None] >= 0)
    img_mask = (img_seg[:, None] == img_seg[None, :]) & (img_seg[:, None] >= 0)

    s = x.shape[0]
    h, d = cfg.num_heads, cfg.head_dim
    fullatt = jnp.zeros((cfg.depth,), bool)
    for i in cfg.fullatt_block_indexes:
        fullatt = fullatt.at[i].set(True)

    def rotate_half(t):
        half = t.shape[-1] // 2
        return jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)

    def block(hidden, xs):
        lp, is_full = xs
        mask = jnp.where(is_full, img_mask, win_mask)
        residual = hidden
        normed = rms_norm(hidden, lp["norm1"], 1e-6)
        qkv = jnp.dot(normed, lp["wqkv"], preferred_element_type=jnp.float32)
        qkv = (qkv + lp["bqkv"]).astype(hidden.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(s, h, d).transpose(1, 0, 2)
        k = k.reshape(s, h, d).transpose(1, 0, 2)
        v = v.reshape(s, h, d).transpose(1, 0, 2)
        q = (q * cos[None] + rotate_half(q) * sin[None]).astype(hidden.dtype)
        k = (k * cos[None] + rotate_half(k) * sin[None]).astype(hidden.dtype)
        scores = jnp.einsum("hqd,hkd->hqk", q, k,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        scores = jnp.where(mask[None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("hqk,hkd->hqd", probs, v)
        attn = attn.transpose(1, 0, 2).reshape(s, h * d)
        attn = (jnp.dot(attn, lp["wo"]) + lp["bo"]).astype(hidden.dtype)
        hidden = residual + attn

        residual = hidden
        normed = rms_norm(hidden, lp["norm2"], 1e-6)
        gate = jnp.dot(normed, lp["w_gate"]) + lp["b_gate"]
        up = jnp.dot(normed, lp["w_up"]) + lp["b_up"]
        inter = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(hidden.dtype)
        down = (jnp.dot(inter, lp["w_down"]) + lp["b_down"]).astype(hidden.dtype)
        return residual + down, None

    hidden, _ = lax.scan(block, x, (params["blocks"], fullatt))

    # patch merger: RMSNorm then groups of merge_unit -> MLP (silu? no: GELU)
    m = params["merger"]
    normed = rms_norm(hidden, m["ln_q"], 1e-6)
    grouped = normed.reshape(s // cfg.merge_unit, cfg.merge_unit * cfg.hidden_size)
    z = jnp.dot(grouped, m["w1"], preferred_element_type=jnp.float32) + m["b1"]
    z = jax.nn.gelu(z, approximate=False)
    z = z.astype(hidden.dtype)
    out = (jnp.dot(z, m["w2"], preferred_element_type=jnp.float32) + m["b2"]).astype(hidden.dtype)

    # back to natural order
    inv = jnp.asarray(
        np.concatenate([
            plan.inv_perm,
            np.arange(plan.inv_perm.shape[0], out.shape[0]),
        ]).astype(np.int32)
    )
    return jnp.take(out, inv, axis=0)


# ---------------------------------------------------------------------------
# Host-side preprocessing + M-RoPE index computation
# ---------------------------------------------------------------------------


def smart_resize(h: int, w: int, factor: int = 28, min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """HF Qwen2VLImageProcessor.smart_resize."""
    import math

    if max(h, w) / min(h, w) > 200:
        raise ValueError("aspect ratio too extreme")
    h_bar = max(factor, round(h / factor) * factor)
    w_bar = max(factor, round(w / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        h_bar = math.floor(h / beta / factor) * factor
        w_bar = math.floor(w / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        h_bar = math.ceil(h * beta / factor) * factor
        w_bar = math.ceil(w * beta / factor) * factor
    return h_bar, w_bar


def patchify_image(pixels01: jax.Array, cfg: QwenVisionConfig) -> jax.Array:
    """[H, W, 3] in [0,1] (H, W multiples of 2*patch) -> [n_patches, C*tp*p*p]
    in the HF processor's patch layout (temporal repeat of a still image)."""
    p, sms = cfg.patch_size, cfg.spatial_merge_size
    x = (pixels01 - QWEN_IMAGE_MEAN) / QWEN_IMAGE_STD
    h, w = x.shape[0] // p, x.shape[1] // p
    # token order (gh/sms, gw/sms, sms_h, sms_w); feature order (C, tp, ph, pw)
    # matching Qwen2VLImageProcessor's transpose(0,3,6,4,7,2,1,5,8)
    x = x.reshape(h // sms, sms, p, w // sms, sms, p, 3)
    x = x.transpose(0, 3, 1, 4, 6, 2, 5)  # [gh, gw, sms, sms, C, ph, pw]
    x = x.reshape(h * w, 3, p * p)
    # temporal patch: the still frame repeats temporal_patch_size times, placed
    # INSIDE each channel block (C outermost, then tp)
    x = jnp.repeat(x[:, :, None, :], cfg.temporal_patch_size, axis=2)
    return x.reshape(h * w, 3 * cfg.temporal_patch_size * p * p)


def patchify_video(frames01: jax.Array, cfg: QwenVisionConfig) -> jax.Array:
    """[T, H, W, 3] in [0,1] (T even, H/W multiples of 2*patch) ->
    [T//tp * H/p * W/p, C*tp*p*p] — temporal pairs of frames per patch
    (Qwen2VLImageProcessor video path; reference spec_model_ours.py:422-453)."""
    p, sms, tp = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
    t, hh, ww, _ = frames01.shape
    if t % tp:
        # repeat the last frame to an even temporal count (HF pads likewise)
        frames01 = jnp.concatenate([frames01, frames01[-1:]], axis=0)
        t += 1
    x = (frames01 - QWEN_IMAGE_MEAN) / QWEN_IMAGE_STD
    h, w = hh // p, ww // p
    x = x.reshape(t // tp, tp, h // sms, sms, p, w // sms, sms, p, 3)
    # token order (t, gh, gw, sms_h, sms_w); feature (C, tp, ph, pw)
    x = x.transpose(0, 2, 5, 3, 6, 8, 1, 4, 7)
    return x.reshape((t // tp) * h * w, 3 * tp * p * p)


def get_rope_index_host(
    input_ids: np.ndarray,  # [S]
    image_grid_thw: Sequence[Tuple[int, int, int]],
    cfg: QwenVisionConfig,
    image_token_id: int,
    video_token_id: int,
    vision_start_token_id: int,
    second_per_grid_ts: Sequence[float] = (),
) -> Tuple[np.ndarray, int]:
    """3-D M-RoPE position ids (reference get_rope_index, :1789-2008).

    Returns (position_ids [3, S], rope_delta)."""
    sms = cfg.spatial_merge_size
    s = input_ids.shape[0]
    pos = np.zeros((3, s), np.int64)
    grids = list(image_grid_thw)
    gi = 0
    st = 0
    st_idx = 0
    out = []
    ids = input_ids.tolist()
    while st < s:
        # find next vision span
        nxt = None
        for j in range(st, s):
            if ids[j] == image_token_id or ids[j] == video_token_id:
                nxt = j
                break
        if nxt is None:
            text_len = s - st
            out.append(np.tile(np.arange(text_len) + st_idx, (3, 1)))
            st_idx += text_len
            st = s
            break
        text_len = nxt - st
        if text_len:
            out.append(np.tile(np.arange(text_len) + st_idx, (3, 1)))
            st_idx += text_len
        t, h, w = grids[gi]
        spg = second_per_grid_ts[gi] if gi < len(second_per_grid_ts) else 1.0
        gi += 1
        gt, gh, gw = t, h // sms, w // sms
        t_idx = (np.arange(gt)[:, None].repeat(gh * gw, 1)
                 * spg * cfg.tokens_per_second).astype(np.int64).reshape(-1)
        h_idx = np.arange(gh)[None, :, None].repeat(gt, 0).repeat(gw, 2).reshape(-1)
        w_idx = np.arange(gw)[None, None, :].repeat(gt, 0).repeat(gh, 1).reshape(-1)
        out.append(np.stack([t_idx, h_idx, w_idx]) + st_idx)
        st_idx = int(out[-1].max()) + 1
        st = nxt + gt * gh * gw
    llm_pos = np.concatenate(out, axis=1)
    assert llm_pos.shape[1] == s, (llm_pos.shape, s)
    pos[:, :] = llm_pos
    rope_delta = int(llm_pos.max()) + 1 - s
    return pos, rope_delta
