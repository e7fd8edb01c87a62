"""LLaVA-1.5 / LLaVA-Next (1.6) multimodal glue: vision tower -> projector ->
anyres packing -> merged text embeddings.

Reference path: spec_model_ours.py:311-378 (get_image_features +
pack_image_features(spatial_unpad) + masked_scatter) on top of HF
`LlavaNextForConditionalGeneration`; the KV-fork wrappers are
modeling_llava_kv.py / modeling_llava_next_kv.py (they only swap the language
model and force max_position_embeddings=8192).

TPU-native design: the *pixel* work (resize, normalize, tower, projector, tile
packing) is all jitted XLA; the anyres layout decisions (best resolution, tile
grid, unpad crop, newline slots) are host-side integer planning per image shape
(`plan_anyres`), producing a gather map so packing is a single `take`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import LlamaConfig
from . import clip_vit

# OpenAI CLIP normalization (HF CLIPImageProcessor defaults)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# llava-v1.6 grid pinpoints (HF config.json image_grid_pinpoints)
DEFAULT_PINPOINTS = ((336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008))


@dataclass(frozen=True)
class LlavaConfig:
    text: LlamaConfig
    vision: clip_vit.ClipVisionConfig
    image_token_index: int = 32000
    projector_hidden: int = 4096
    anyres: bool = True  # False => LLaVA-1.5 single-tile path
    image_grid_pinpoints: Tuple[Tuple[int, int], ...] = DEFAULT_PINPOINTS

    @property
    def patches_per_side(self) -> int:
        return self.vision.image_size // self.vision.patch_size


class AnyresPlan(NamedTuple):
    """Host-side integer plan for one image (static shapes per (grid, crop)).

    grid_h/grid_w: tile grid of the high-res pass (base tile excluded).
    gather_idx: [n_tokens] int32 into the packed source array
        [base (576) ; tile grid flattened (grid_h*24*grid_w*24) ; newline (1)].
    n_tokens: total image tokens this image expands to.
    target_h/target_w: canvas resolution for the high-res resize+pad.
    """

    grid_h: int
    grid_w: int
    gather_idx: np.ndarray
    n_tokens: int
    target_h: int
    target_w: int


def select_best_resolution(
    orig_h: int, orig_w: int, pinpoints: Sequence[Tuple[int, int]]
) -> Tuple[int, int]:
    """HF select_best_resolution: maximize effective resolution, then minimize
    wasted area."""
    best, best_key = None, None
    for th, tw in pinpoints:
        scale = min(tw / orig_w, th / orig_h)
        dw, dh = int(orig_w * scale), int(orig_h * scale)
        effective = min(dw * dh, orig_w * orig_h)
        wasted = tw * th - effective
        key = (effective, -wasted)
        if best_key is None or key > best_key:
            best, best_key = (th, tw), key
    return best


def plan_anyres(
    orig_h: int,
    orig_w: int,
    cfg: LlavaConfig,
) -> AnyresPlan:
    """Anyres layout plan (HF pack_image_features spatial_unpad semantics):
    tiles reshaped to a [grid_h*24, grid_w*24] feature map, unpadded to the
    original aspect ratio, one image_newline appended per row, flattened, and
    prefixed by the base tile's 576 features."""
    pside = cfg.patches_per_side
    th, tw = select_best_resolution(orig_h, orig_w, cfg.image_grid_pinpoints)
    grid_h, grid_w = th // cfg.vision.image_size, tw // cfg.vision.image_size
    cur_h, cur_w = grid_h * pside, grid_w * pside

    # unpad (HF unpad_image): the feature map holds the image scaled to fit the
    # canvas with symmetric padding; crop back to the content region.
    orig_ratio = orig_w / orig_h
    cur_ratio = cur_w / cur_h
    if orig_ratio > cur_ratio:
        scale = cur_w / orig_w
        new_h = int(round(orig_h * scale, 7))
        pad = (cur_h - new_h) // 2
        y0, y1, x0, x1 = pad, cur_h - pad, 0, cur_w
    else:
        scale = cur_h / orig_h
        new_w = int(round(orig_w * scale, 7))
        pad = (cur_w - new_w) // 2
        y0, y1, x0, x1 = 0, cur_h, pad, cur_w - pad
    crop_h, crop_w = y1 - y0, x1 - x0

    n_base = pside * pside
    newline_idx = n_base + cur_h * cur_w
    rows = []
    for y in range(y0, y1):
        row = n_base + y * cur_w + np.arange(x0, x1)
        rows.append(np.concatenate([row, [newline_idx]]))
    tile_part = np.concatenate(rows) if rows else np.zeros((0,), np.int64)
    gather = np.concatenate([np.arange(n_base), tile_part]).astype(np.int32)
    return AnyresPlan(
        grid_h=grid_h,
        grid_w=grid_w,
        gather_idx=gather,
        n_tokens=int(gather.shape[0]),
        target_h=th,
        target_w=tw,
    )


# ---------------------------------------------------------------------------
# Device-side preprocessing + encoding
# ---------------------------------------------------------------------------


def normalize(pixels01: jax.Array) -> jax.Array:
    """[H, W, 3] floats in [0,1] -> CLIP-normalized."""
    return (pixels01 - CLIP_MEAN) / CLIP_STD


def resize_image(pixels01: jax.Array, h: int, w: int) -> jax.Array:
    return jax.image.resize(pixels01, (h, w, 3), method="bicubic")


def preprocess_anyres(
    pixels01: jax.Array,  # [H, W, 3] in [0,1] (static shape per image bucket)
    plan: AnyresPlan,
    cfg: LlavaConfig,
) -> jax.Array:
    """Base tile + anyres tiles: [1 + grid_h*grid_w, 336, 336, 3] normalized.

    Device-side equivalent of LlavaNextImageProcessor: base = square resize to
    336; tiles = aspect-preserving resize onto the (target_h, target_w) canvas
    with symmetric zero padding, then a grid split."""
    size = cfg.vision.image_size
    base = normalize(resize_image(pixels01, size, size))

    oh, ow = pixels01.shape[0], pixels01.shape[1]
    scale = min(plan.target_w / ow, plan.target_h / oh)
    nh, nw = int(oh * scale), int(ow * scale)
    resized = resize_image(pixels01, nh, nw)
    pad_t = (plan.target_h - nh) // 2
    pad_l = (plan.target_w - nw) // 2
    canvas = jnp.zeros((plan.target_h, plan.target_w, 3), pixels01.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (pad_t, pad_l, 0))
    canvas = normalize(canvas)
    tiles = canvas.reshape(plan.grid_h, size, plan.grid_w, size, 3)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(-1, size, size, 3)
    return jnp.concatenate([base[None], tiles], axis=0)


def projector(params: dict, feats: jax.Array) -> jax.Array:
    """multi_modal_projector: linear -> gelu -> linear."""
    x = jnp.dot(feats, params["proj_w1"]) + params["proj_b1"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(feats.dtype)
    return jnp.dot(x, params["proj_w2"]) + params["proj_b2"]


def encode_image(
    params: dict,
    cfg: LlavaConfig,
    tiles: jax.Array,  # [n_tiles, 336, 336, 3] normalized (base first)
    plan: Optional[AnyresPlan],
) -> jax.Array:
    """Tiles -> packed image features [n_tokens, text_hidden].

    plan=None => LLaVA-1.5: single tile, no packing (576 tokens, CLS dropped).
    """
    feats = jax.vmap(lambda t: clip_vit.forward(params["vision"], cfg.vision, t))(
        tiles
    )  # [n, 577, vdim]
    feats = feats[:, 1:]  # vision_feature_select_strategy="default": drop CLS
    feats = projector(params, feats)  # [n, 576, text_hidden]
    if plan is None:
        return feats.reshape(-1, feats.shape[-1])

    pside = cfg.patches_per_side
    d = feats.shape[-1]
    base = feats[0]
    tile_feats = feats[1:].reshape(plan.grid_h, plan.grid_w, pside, pside, d)
    tile_feats = tile_feats.transpose(0, 2, 1, 3, 4).reshape(-1, d)
    src = jnp.concatenate([base, tile_feats, params["image_newline"][None]], axis=0)
    return jnp.take(src, jnp.asarray(plan.gather_idx), axis=0)


def merge_image_embeds(
    text_embeds: jax.Array,  # [S, D] token embeddings
    image_feats: jax.Array,  # [n_img_tokens, D]
    image_positions: jax.Array,  # [n_img_tokens] int32 positions of <image> ids
) -> jax.Array:
    """masked_scatter equivalent (spec_model_ours.py:374-376)."""
    return text_embeds.at[image_positions].set(
        image_feats.astype(text_embeds.dtype)
    )


def init_projector_params(
    key: jax.Array, vdim: int, tdim: int, dtype=jnp.bfloat16
) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)

    def w(k, shape):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(0.02, dtype)

    return {
        "proj_w1": w(k1, (vdim, tdim)),
        "proj_b1": jnp.zeros((tdim,), dtype),
        "proj_w2": w(k2, (tdim, tdim)),
        "proj_b2": jnp.zeros((tdim,), dtype),
        "image_newline": w(k3, (tdim,)),
    }
