"""CLIP ViT vision tower (LLaVA-1.5/1.6's `vision_tower`), TPU-native.

The reference consumes HF `CLIPVisionModel` indirectly through
`LlavaForConditionalGeneration.get_image_features` (spec_model_ours.py:341-355).
Functional reimplementation tuned for the MXU:

- patch "conv" as reshape + one matmul (14x14x3 -> hidden), not a convolution;
- all 24 layers as one lax.scan with stacked weights;
- pre-norm transformer with biased QKV/MLP and quick-GELU (OpenAI CLIP);
- returns the hidden states of a chosen feature layer (LLaVA uses -2) with the
  CLS token kept — the caller applies vision_feature_select_strategy.

Weight layout (bf16; biases included):
  patch_w: [patch*patch*3, width]        class_embed: [width]
  pos_embed: [num_pos, width]            pre_norm_{w,b}: [width] (float32)
  layers: ln1_{w,b}, ln2_{w,b}: [L, width] (float32)
          wq/wk/wv/wo: [L, width, width], bq/bk/bv/bo: [L, width]
          w_fc1: [L, width, mlp], b_fc1: [L, mlp]
          w_fc2: [L, mlp, width], b_fc2: [L, width]
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    feature_layer: int = -2  # LLaVA vision_feature_layer

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) * lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """[H, W, 3] -> [num_patches, patch*patch*3] in conv-weight order (C, ph, pw).

    Equivalent to Conv2d(stride=patch) followed by flatten: HF's patch embedding
    weight is [width, 3, patch, patch], so the flattened patch vector must be
    channel-major to match the converted matmul weight."""
    h, w, _ = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(gh, patch, gw, patch, 3)
    x = x.transpose(0, 2, 4, 1, 3)  # [gh, gw, C, ph, pw]
    return x.reshape(gh * gw, 3 * patch * patch)


def forward(params: dict, cfg: ClipVisionConfig, pixels: jax.Array) -> jax.Array:
    """pixels: [H, W, 3] normalized; returns [1 + num_patches, width] hidden
    states of cfg.feature_layer (CLS token first)."""
    patches = patchify(pixels, cfg.patch_size).astype(params["patch_w"].dtype)
    embeds = jnp.dot(patches, params["patch_w"], preferred_element_type=jnp.float32)
    embeds = embeds.astype(params["patch_w"].dtype)
    x = jnp.concatenate([params["class_embed"][None], embeds], axis=0)
    x = x + params["pos_embed"].astype(x.dtype)
    x = layer_norm(x, params["pre_norm_w"], params["pre_norm_b"], cfg.layer_norm_eps)

    h, d = cfg.num_attention_heads, cfg.head_dim
    s = x.shape[0]
    take_from_end = cfg.num_hidden_layers + cfg.feature_layer  # e.g. 24-2=22

    def layer_step(carry, lp):
        hidden, idx, feature = carry
        residual = hidden
        normed = layer_norm(hidden, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = jnp.dot(normed, lp["wq"]) + lp["bq"]
        k = jnp.dot(normed, lp["wk"]) + lp["bk"]
        v = jnp.dot(normed, lp["wv"]) + lp["bv"]
        q = q.reshape(s, h, d).transpose(1, 0, 2) * (d**-0.5)
        k = k.reshape(s, h, d).transpose(1, 0, 2)
        v = v.reshape(s, h, d).transpose(1, 0, 2)
        scores = jnp.einsum("hqd,hkd->hqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("hqk,hkd->hqd", probs, v)
        attn = attn.transpose(1, 0, 2).reshape(s, h * d)
        hidden = residual + (jnp.dot(attn, lp["wo"]) + lp["bo"]).astype(hidden.dtype)

        residual = hidden
        normed = layer_norm(hidden, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        mlp = quick_gelu(jnp.dot(normed, lp["w_fc1"]) + lp["b_fc1"])
        hidden = residual + (jnp.dot(mlp, lp["w_fc2"]) + lp["b_fc2"]).astype(hidden.dtype)

        feature = jnp.where(idx == take_from_end, hidden, feature)
        return (hidden, idx + 1, feature), None

    # HF hidden_states[i] is the input of layer i, so hidden_states[-2] (LLaVA's
    # feature layer) is the output of layer L-2; we capture the running hidden
    # right after layer index L + feature_layer executes.
    (hidden, _, feature), _ = lax.scan(
        layer_step, (x, jnp.zeros((), jnp.int32), x), params["layers"]
    )
    return feature


def init_params(cfg: ClipVisionConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    ks = jax.random.split(key, 12)
    w_, l = cfg.hidden_size, cfg.num_hidden_layers
    m = cfg.intermediate_size
    pp = cfg.patch_size * cfg.patch_size * 3

    def w(k, shape, scale=0.02):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

    return {
        "patch_w": w(ks[0], (pp, w_)),
        "class_embed": w(ks[1], (w_,)),
        "pos_embed": w(ks[2], (1 + cfg.num_patches, w_)),
        "pre_norm_w": jnp.ones((w_,), jnp.float32),
        "pre_norm_b": jnp.zeros((w_,), jnp.float32),
        "layers": {
            "ln1_w": jnp.ones((l, w_), jnp.float32),
            "ln1_b": jnp.zeros((l, w_), jnp.float32),
            "ln2_w": jnp.ones((l, w_), jnp.float32),
            "ln2_b": jnp.zeros((l, w_), jnp.float32),
            "wq": w(ks[3], (l, w_, w_)),
            "wk": w(ks[4], (l, w_, w_)),
            "wv": w(ks[5], (l, w_, w_)),
            "wo": w(ks[6], (l, w_, w_)),
            "bq": jnp.zeros((l, w_), dtype),
            "bk": jnp.zeros((l, w_), dtype),
            "bv": jnp.zeros((l, w_), dtype),
            "bo": jnp.zeros((l, w_), dtype),
            "w_fc1": w(ks[7], (l, w_, m)),
            "b_fc1": jnp.zeros((l, m), dtype),
            "w_fc2": w(ks[8], (l, m, w_)),
            "b_fc2": jnp.zeros((l, w_), dtype),
        },
    }
