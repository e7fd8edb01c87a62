"""Vision tower tests: CLIP/LLaVA anyres packing and Qwen2.5-VL ViT plumbing
with random weights (shape/plan correctness + known invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispec_tpu.models import clip_vit, llava, qwen2_5_vl as qvl
from vispec_tpu.configs import LlamaConfig

VCFG = clip_vit.ClipVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=3,
    num_attention_heads=4, image_size=56, patch_size=14, feature_layer=-2,
)
TEXT = LlamaConfig(vocab_size=64, hidden_size=48, intermediate_size=96,
                   num_hidden_layers=1, num_attention_heads=4,
                   num_key_value_heads=4)
LCFG = llava.LlavaConfig(
    text=TEXT, vision=VCFG, image_token_index=32,
    image_grid_pinpoints=((56, 112), (112, 56), (112, 112)),
)


def test_anyres_plan_token_count():
    # HF formula: base patches + unpadded rows x (cols + 1 newline)
    plan = llava.plan_anyres(100, 200, LCFG)
    pside = LCFG.patches_per_side  # 4
    assert plan.target_h, plan.target_w
    assert plan.n_tokens == plan.gather_idx.shape[0]
    assert plan.n_tokens >= pside * pside
    # wide image on a (56,112) canvas: no width crop, height cropped
    assert plan.grid_h * plan.grid_w == (plan.target_h // 56) * (plan.target_w // 56)


def test_llava_encode_image_shapes():
    params = {
        "vision": clip_vit.init_params(VCFG, jax.random.PRNGKey(0), jnp.float32),
        **llava.init_projector_params(jax.random.PRNGKey(1), VCFG.hidden_size,
                                      TEXT.hidden_size, jnp.float32),
    }
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (100, 200, 3)),
                      jnp.float32)
    plan = llava.plan_anyres(100, 200, LCFG)
    tiles = llava.preprocess_anyres(img, plan, LCFG)
    assert tiles.shape == (1 + plan.grid_h * plan.grid_w, 56, 56, 3)
    feats = llava.encode_image(params, LCFG, tiles, plan)
    assert feats.shape == (plan.n_tokens, TEXT.hidden_size)
    assert bool(jnp.all(jnp.isfinite(feats)))
    # newline rows: every (crop_w+1)-th packed feature after the base block
    # equals the image_newline projection — check one
    base = LCFG.patches_per_side**2
    newline_positions = np.nonzero(
        plan.gather_idx == plan.gather_idx.max())[0]
    got = feats[newline_positions[0]]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(params["image_newline"]), rtol=1e-5
    )


def test_llava15_single_tile():
    params = {
        "vision": clip_vit.init_params(VCFG, jax.random.PRNGKey(0), jnp.float32),
        **llava.init_projector_params(jax.random.PRNGKey(1), VCFG.hidden_size,
                                      TEXT.hidden_size, jnp.float32),
    }
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (80, 90, 3)), jnp.float32)
    tiles = llava.normalize(llava.resize_image(img, 56, 56))[None]
    feats = llava.encode_image(params, LCFG, tiles, None)
    assert feats.shape == (VCFG.num_patches, TEXT.hidden_size)


QCFG = qvl.QwenVisionConfig(
    hidden_size=32, out_hidden_size=48, intermediate_size=64, depth=3,
    num_heads=4, patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    window_size=56, fullatt_block_indexes=(1,),
)


def qwen_params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    h, m, l = QCFG.hidden_size, QCFG.intermediate_size, QCFG.depth
    pin = 3 * QCFG.temporal_patch_size * QCFG.patch_size**2

    def w(k, shape):
        return jax.random.normal(k, shape, dtype) * 0.05

    return {
        "patch_w": w(ks[0], (pin, h)),
        "blocks": {
            "norm1": jnp.ones((l, h), jnp.float32),
            "norm2": jnp.ones((l, h), jnp.float32),
            "wqkv": w(ks[1], (l, h, 3 * h)),
            "bqkv": jnp.zeros((l, 3 * h), dtype),
            "wo": w(ks[2], (l, h, h)),
            "bo": jnp.zeros((l, h), dtype),
            "w_gate": w(ks[3], (l, h, m)),
            "b_gate": jnp.zeros((l, m), dtype),
            "w_up": w(ks[4], (l, h, m)),
            "b_up": jnp.zeros((l, m), dtype),
            "w_down": w(ks[5], (l, m, h)),
            "b_down": jnp.zeros((l, h), dtype),
        },
        "merger": {
            "ln_q": jnp.ones((h,), jnp.float32),
            "w1": w(ks[6], (4 * h, 4 * h)),
            "b1": jnp.zeros((4 * h,), dtype),
            "w2": w(ks[7], (4 * h, QCFG.out_hidden_size)),
            "b2": jnp.zeros((QCFG.out_hidden_size,), dtype),
        },
    }


def test_qwen_vision_plan_and_forward():
    # 8x12 patch grid (112 x 168 pixels), one image
    grid = [(1, 8, 12)]
    n_pat = 8 * 12
    plan = qvl.plan_vision(grid, QCFG, pad_len=128)
    assert plan.n_tokens == n_pat
    assert plan.n_merged == n_pat // 4
    # perm is a permutation of the real tokens
    assert sorted(plan.perm[:n_pat].tolist()) == list(range(n_pat))
    # window segments: padded slots get -1
    assert (plan.win_seg[n_pat:] == -1).all()

    img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (112, 168, 3)),
                      jnp.float32)
    patches = qvl.patchify_image(img, QCFG)
    assert patches.shape == (n_pat, 3 * 2 * 14 * 14)
    patches = jnp.pad(patches, ((0, 128 - n_pat), (0, 0)))
    params = qwen_params(jax.random.PRNGKey(0))
    feats = qvl.forward(params, QCFG, patches, plan)
    assert feats.shape[1] == QCFG.out_hidden_size
    assert bool(jnp.all(jnp.isfinite(feats[: plan.n_merged])))


def test_qwen_rope_index_host():
    # prompt: 3 text, vision_start, 6 image tokens (grid 1x4x6 -> 24/4=6), 4 text
    img_tok, vstart = 9, 8
    ids = np.asarray([1, 2, 3, vstart] + [img_tok] * 6 + [4, 5, 6, 7])
    pos, delta = qvl.get_rope_index_host(
        ids, [(1, 4, 6)], QCFG, img_tok, -2, vstart
    )
    assert pos.shape == (3, len(ids))
    # text prefix: all three streams equal 0..3
    assert (pos[:, :4] == np.arange(4)).all()
    # image block starts at 4: t constant, h in {0,1}, w in {0,1,2}
    assert (pos[0, 4:10] == 4).all()
    assert pos[1, 4:10].tolist() == [4, 4, 4, 5, 5, 5]
    assert pos[2, 4:10].tolist() == [4, 5, 6, 4, 5, 6]
    # trailing text continues after max+1 = 7
    assert pos[0, 10:].tolist() == [7, 8, 9, 10]
    assert delta == 11 - len(ids)


def test_smart_resize_multiples():
    h, w = qvl.smart_resize(1023, 767)
    assert h % 28 == 0 and w % 28 == 0


def test_qwen_video_patchify_and_plan():
    # 6 frames of 56x84 -> temporal pairs: grid (3, 4, 6)
    frames = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (6, 56, 84, 3)), jnp.float32
    )
    patches = qvl.patchify_video(frames, QCFG)
    t, gh, gw = 3, 4, 6
    assert patches.shape == (t * gh * gw, 3 * 2 * 14 * 14)
    plan = qvl.plan_vision([(t, gh, gw)], QCFG, pad_len=128)
    assert plan.n_tokens == t * gh * gw
    assert plan.n_merged == t * gh * gw // 4
    params = qwen_params(jax.random.PRNGKey(2))
    feats = qvl.forward(params, QCFG, jnp.pad(patches, ((0, 128 - t * gh * gw), (0, 0))), plan)
    assert bool(jnp.all(jnp.isfinite(feats[: plan.n_merged])))


def test_qwen_video_rope_index():
    img_tok, vid_tok, vstart = 9, 10, 8
    ids = np.asarray([1, 2, vstart] + [vid_tok] * 18 + [4, 5])
    pos, delta = qvl.get_rope_index_host(
        ids, [(3, 4, 6)], QCFG, img_tok, vid_tok, vstart,
        second_per_grid_ts=[1.0],
    )
    # temporal stream advances by tokens_per_second per grid step within video
    block = pos[0, 3:21]
    assert block.min() == 3
    assert (np.unique(block) == np.asarray([3, 5, 7])).all()  # 3 + 2*t
    assert pos[0, 21] == int(pos.max() - 2 + 1) or pos[0, 21] > block.max()
