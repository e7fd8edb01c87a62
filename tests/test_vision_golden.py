"""Golden-value vision parity vs the HF implementations (VERDICT item 7).

Round-1 vision tests were shape/invariant only; these pin VALUES against the
HF processors/models instantiated offline at toy sizes:

- anyres packing order vs LlavaNextForConditionalGeneration.pack_image_features
  (reference consumes it via spec_model_ours.py:341-376),
- smart_resize vs the HF function,
- Qwen patchify vs Qwen2VLImageProcessor (exact, resize disabled),
- Qwen window shuffle vs Qwen2_5_VisionTransformerPretrainedModel.get_window_index
  (reference fork modeling_qwen2_5_vl_kv.py:521-566),
- get_rope_index vs Qwen2_5_VLModel.get_rope_index (reference :1789-2008).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from vispec_tpu.models import llava, qwen2_5_vl
from vispec_tpu.models.clip_vit import ClipVisionConfig

PINPOINTS = ((28, 56), (56, 28), (56, 56))
LCFG = llava.LlavaConfig(
    text=None,
    vision=ClipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=28, patch_size=14),
    image_grid_pinpoints=PINPOINTS,
)
QCFG = qwen2_5_vl.QwenVisionConfig(
    hidden_size=32, out_hidden_size=48, intermediate_size=64, depth=2,
    num_heads=2, patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    window_size=56, fullatt_block_indexes=(1,),
)


def test_smart_resize_matches_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize)

    for (h, w) in [(40, 40), (333, 211), (28, 28), (17, 900), (1080, 1920),
                   (56, 1456), (99, 101)]:
        for budgets in [(56 * 56, 14 * 14 * 4 * 1280),
                        (256 * 28 * 28, 1280 * 28 * 28)]:
            ours = qwen2_5_vl.smart_resize(h, w, 28, *budgets)
            theirs = hf_smart_resize(h, w, 28, *budgets)
            assert ours == tuple(theirs), (h, w, budgets, ours, theirs)


def test_anyres_grid_matches_hf():
    from transformers.models.llava_next.modeling_llava_next import (
        get_anyres_image_grid_shape, image_size_to_num_patches)

    pin = [list(p) for p in PINPOINTS]
    for (h, w) in [(40, 40), (30, 55), (56, 28), (100, 33), (28, 90)]:
        plan = llava.plan_anyres(h, w, LCFG)
        gh, gw = get_anyres_image_grid_shape((h, w), pin, 28)
        assert (plan.grid_h, plan.grid_w) == (gh, gw), (h, w)
        n_tiles = image_size_to_num_patches((h, w), pin, 28)
        assert n_tiles == plan.grid_h * plan.grid_w + 1


def test_anyres_pack_order_matches_hf():
    """Distinct per-patch values through HF pack_image_features vs our gather
    plan — catches transpose/unpad/newline-position bugs exactly."""
    from transformers import CLIPVisionConfig, LlavaNextConfig
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers.models.llava_next.modeling_llava_next import (
        LlavaNextForConditionalGeneration)

    vcfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=28, patch_size=14)
    tcfg = HFLlamaConfig(vocab_size=160, hidden_size=48, intermediate_size=96,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2)
    cfg = LlavaNextConfig(vision_config=vcfg.to_dict(),
                          text_config=tcfg.to_dict(),
                          image_grid_pinpoints=[list(p) for p in PINPOINTS],
                          image_token_index=150)
    hf = LlavaNextForConditionalGeneration(cfg)

    for (h, w) in [(40, 40), (30, 55), (100, 33)]:
        plan = llava.plan_anyres(h, w, LCFG)
        n_tiles = plan.grid_h * plan.grid_w + 1
        # feature value = global patch index; newline = -1
        feats = torch.arange(n_tiles * 4, dtype=torch.float32)
        feats = feats.reshape(n_tiles, 4, 1).repeat(1, 1, 48)
        packed, lens = hf.pack_image_features(
            [feats], image_sizes=torch.tensor([[h, w]]),
            vision_feature_select_strategy="default",
            image_newline=torch.full((48,), -1.0),
        )
        packed = packed[0] if isinstance(packed, list) else packed
        golden = packed[:, 0].numpy()

        assert plan.n_tokens == int(lens[0]), (h, w)
        # ours: apply the same synthetic features through the gather plan
        src = np.concatenate([
            np.arange(4, dtype=np.float32),  # base tile
            # tile features in our packed order: [gh, gw, pside, pside] ->
            # feature-map rows (encode_image's transpose)
            (np.arange(4, (plan.grid_h * plan.grid_w + 1) * 4, dtype=np.float32)
             .reshape(plan.grid_h, plan.grid_w, 2, 2)
             .transpose(0, 2, 1, 3).reshape(-1)),
            [-1.0],  # image_newline slot
        ])
        ours = src[plan.gather_idx]
        np.testing.assert_array_equal(ours, golden, err_msg=f"size {(h, w)}")


def test_qwen_patchify_matches_hf_exact():
    """Patch extraction + normalization (no resize) must match the HF
    processor bit-for-bit up to float tolerance."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)

    proc = Qwen2VLImageProcessor(do_resize=False, patch_size=14, merge_size=2,
                                 temporal_patch_size=2)
    rng = np.random.default_rng(0)
    img_u8 = (rng.uniform(0, 1, (56, 84, 3)) * 255).astype(np.uint8)
    enc = proc(images=[img_u8], return_tensors="np")
    golden = enc["pixel_values"]  # [n_patches, C*tp*p*p]
    assert tuple(enc["image_grid_thw"][0]) == (1, 4, 6)

    ours = qwen2_5_vl.patchify_image(
        jnp.asarray(img_u8.astype(np.float32) / 255.0), QCFG)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-3)


def test_qwen_window_index_matches_hf():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel)

    vcfg = Qwen2_5_VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        window_size=56, fullatt_block_indexes=[1], out_hidden_size=48)
    vit = Qwen2_5_VisionTransformerPretrainedModel(vcfg)

    for grid in [(1, 8, 8), (1, 6, 10), (2, 4, 8)]:
        wi, cu = vit.get_window_index(torch.tensor([list(grid)]))
        golden_perm_u = wi.numpy()
        cu = np.asarray(cu if isinstance(cu, list) else cu.tolist())

        t, h, w = grid
        n_tok = t * h * w
        plan = qwen2_5_vl.plan_vision([grid], QCFG, n_tok)
        unit = QCFG.merge_unit
        ours_perm_u = plan.perm[: plan.n_merged * unit : unit] // unit
        np.testing.assert_array_equal(ours_perm_u, golden_perm_u,
                                      err_msg=f"grid {grid}")
        # window boundaries: our win_seg changes exactly at HF cu_window_seqlens
        bounds = np.unique(cu)
        seg = plan.win_seg[: plan.n_tokens]
        change_pts = np.nonzero(np.diff(seg))[0] + 1
        np.testing.assert_array_equal(
            change_pts, bounds[(bounds > 0) & (bounds < plan.n_tokens)],
            err_msg=f"grid {grid}")


def test_get_rope_index_matches_hf():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig, Qwen2_5_VLTextConfig, Qwen2_5_VLVisionConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import Qwen2_5_VLModel

    vcfg = Qwen2_5_VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        window_size=56, fullatt_block_indexes=[1], out_hidden_size=48,
        tokens_per_second=2)
    tcfg = Qwen2_5_VLTextConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]})
    cfg = Qwen2_5_VLConfig(text_config=tcfg.to_dict(),
                           vision_config=vcfg.to_dict(),
                           image_token_id=150, video_token_id=151,
                           vision_start_token_id=152)
    hf = Qwen2_5_VLModel(cfg)

    # image case
    ids = [5, 6, 152] + [150] * 16 + [7, 8, 9]
    grid = (1, 8, 8)
    pos_hf, delta_hf = hf.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor([list(grid)]))
    ours, delta = qwen2_5_vl.get_rope_index_host(
        np.asarray(ids), [grid], QCFG, 150, 151, 152)
    np.testing.assert_array_equal(ours, pos_hf[:, 0, :].numpy())
    assert delta == int(delta_hf[0, 0])

    # video case with second_per_grid_ts=2.0 (temporal stride scaling)
    vids = [5, 152] + [151] * 32 + [9]
    vgrid = (2, 8, 8)
    pos_hf, delta_hf = hf.get_rope_index(
        torch.tensor([vids]), video_grid_thw=torch.tensor([list(vgrid)]),
        second_per_grid_ts=torch.tensor([2.0]))
    ours, delta = qwen2_5_vl.get_rope_index_host(
        np.asarray(vids), [vgrid], QCFG, 150, 151, 152,
        second_per_grid_ts=[2.0])
    np.testing.assert_array_equal(ours, pos_hf[:, 0, :].numpy())
    assert delta == int(delta_hf[0, 0])
