"""Prefill / TTFT on-chip, vision towers included (VERDICT r4 item 2).

The reference's speedup metric is wall_time per question INCLUDING the
full-prompt target prefill and the vision tower (gen_spec_answer_sqa.py:
264-276); every prior on-chip number in this repo starts after prefill, and
neither tower had ever run on real XLA:TPU/Mosaic.  This drive measures, at
the 7B serving config (int8 target + int8 KV, fabricated weights):

- **text**: 120-token prompt, no tower (prefill-bucket baseline);
- **llava-1.5**: the real CLIP-ViT-L/14-336 tower (24 layers, hidden 1024)
  + 2-layer projector -> 576 image tokens (modeling_llava_kv.py path);
- **anyres** (LLaVA-1.6): 672x672 -> 1 base + 4 crop tiles through the same
  tower, packed with newline rows to ~2928 tokens
  (spec_model_ours.py:311-378 parity via llava.plan_anyres).

Per leg: TTFT (specgenerate(max_new_tokens=1) wall — tower + target prefill
+ first draft tree + one verify + the committed-token readback), the steady
spec round for reference, an estimated pure-prefill time (TTFT minus one
round minus ~1 ms dispatch), analytic prefill TFLOPs (backbone + attention
quadratic + tower), and prefill MFU — the one phase where MFU (not HBM
bandwidth) is the honest metric.

Run (on the chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_ttft.py
CPU smoke: ... bench_ttft.py --tiny
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import clip_vit, draft as draft_mod, llava
from vispec_tpu.spec.spec_model import SpecModel

IMG_TOKEN = 32000
PEAK_BF16 = 197e12  # v5e MXU peak


def prefill_flops(tcfg, prompt_len, vcfg=None, n_tiles=0):
    """Analytic matmul FLOPs of one target prefill (+ tower): 2*W per token
    for every weight matrix touched, + the attention quadratic term
    (scores + values, causal ~S/2 average context), + lm_head on ONE row."""
    d, i, L = tcfg.hidden_size, tcfg.intermediate_size, tcfg.num_hidden_layers
    hq = tcfg.num_attention_heads * tcfg.head_dim
    hkv = tcfg.num_key_value_heads * tcfg.head_dim
    w_layer = d * (hq + 2 * hkv) + hq * d + 3 * d * i
    f = 2 * w_layer * L * prompt_len
    f += L * 2 * 2 * (prompt_len * prompt_len // 2) * tcfg.head_dim \
        * tcfg.num_attention_heads  # scores + values at avg causal context
    f += 2 * d * tcfg.vocab_size  # lm_head, last row only
    if vcfg is not None and n_tiles:
        s = 1 + vcfg.num_patches  # class token + patches
        w_v = 4 * vcfg.hidden_size**2 + 2 * vcfg.hidden_size * vcfg.intermediate_size
        f += n_tiles * (2 * w_v * vcfg.num_hidden_layers * s
                        + vcfg.num_hidden_layers * 4 * s * s * vcfg.hidden_size
                        + 2 * s * (vcfg.patch_size**2 * 3) * vcfg.hidden_size)
        # projector: 576-per-tile rows through [1024,4096]+[4096,4096]
        f += 2 * n_tiles * vcfg.num_patches * (
            vcfg.hidden_size * tcfg.hidden_size + tcfg.hidden_size**2)
    return f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-len", type=int, default=4096)
    p.add_argument("--tiny", action="store_true", help="CPU smoke geometry")
    args = p.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        bench.N_TOKENS, bench.REPEATS = 8, 1
        tcfg = LlamaConfig(vocab_size=512, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=4,
                           max_position_embeddings=1024)
        vcfg = clip_vit.ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=56, patch_size=14)
        pinpoints = ((56, 112), (112, 56), (112, 112))
        max_len, img_side = 1024, 112
    else:
        tcfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                           intermediate_size=11008, num_hidden_layers=32,
                           num_attention_heads=32, num_key_value_heads=32,
                           max_position_embeddings=args.max_len)
        vcfg = clip_vit.ClipVisionConfig()  # the real CLIP-ViT-L/14-336
        pinpoints = llava.DEFAULT_PINPOINTS
        max_len, img_side = args.max_len, 672

    dcfg = DraftConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        intermediate_size=tcfg.intermediate_size,
        num_attention_heads=tcfg.num_attention_heads,
        num_key_value_heads=tcfg.num_key_value_heads,
        max_position_embeddings=max_len, num_q=2)

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    int8 = not args.tiny
    if int8:
        from bench_13b import fabricate_q8_target

        tparams = fabricate_q8_target(tcfg, k1)
    else:
        from vispec_tpu.models import llama

        tparams = llama.init_params(tcfg, k1, jnp.float32)
    dtype = jnp.bfloat16 if int8 else jnp.float32
    dparams = draft_mod.init_params(dcfg, k2, dtype)
    dparams["embed"] = tparams["embed"]
    vparams = {
        "vision": clip_vit.init_params(vcfg, k3, dtype),
        **llava.init_projector_params(k4, vcfg.hidden_size,
                                      tcfg.hidden_size, dtype),
    }

    def build(anyres):
        lcfg = llava.LlavaConfig(text=tcfg, vision=vcfg,
                                 image_token_index=IMG_TOKEN, anyres=anyres,
                                 projector_hidden=tcfg.hidden_size,
                                 image_grid_pinpoints=pinpoints)
        m = SpecModel(tcfg, dcfg,
                      SpecConfig(total_tokens=30, depth=3, top_k=8),
                      tparams, dparams, max_len=max_len, dtype=dtype,
                      eos_token_id=10**6, llava_cfg=lcfg, vparams=vparams,
                      image_token_index=IMG_TOKEN, quantize_kv=int8)
        if int8:
            m.quantize_target = "int8"
        return m

    rng = np.random.default_rng(0)
    text = rng.integers(10, tcfg.vocab_size - 64, 60).tolist()
    img = jnp.asarray(rng.uniform(0, 1, (img_side, img_side, 3)), jnp.float32)

    def measure(model, prompt, pix):
        kw = {"pixel_values": pix} if pix is not None else {}
        model.specgenerate(prompt, max_new_tokens=1, **kw)  # compile
        ttft = 1e9
        for _ in range(bench.REPEATS):
            t0 = time.perf_counter()
            model.specgenerate(prompt, max_new_tokens=1, **kw)
            ttft = min(ttft, time.perf_counter() - t0)
        model.specgenerate(prompt, max_new_tokens=8, **kw)
        t_round = 1e9
        for _ in range(bench.REPEATS):
            res = model.specgenerate(prompt, max_new_tokens=bench.N_TOKENS,
                                     **kw)
            t_round = min(t_round, res.decode_time / max(res.rounds, 1))
        return ttft, t_round

    legs = {}

    # text-only leg
    m15 = build(anyres=False)
    ttft, t_round = measure(m15, text, None)
    pl = len(text)
    fl = prefill_flops(tcfg, 128 * ((pl + 127) // 128 + 1))
    pre = max(ttft - t_round - 1e-3, 1e-9)
    legs["text"] = dict(prompt_tokens=pl, ttft_ms=round(ttft * 1e3, 1),
                        t_round_ms=round(t_round * 1e3, 2),
                        prefill_est_ms=round(pre * 1e3, 1),
                        prefill_tflops=round(fl / 1e12, 3),
                        prefill_mfu=round(fl / pre / PEAK_BF16, 4))

    # llava-1.5 single tile: 576 image tokens
    n_img = vcfg.num_patches
    prompt15 = text[:30] + [IMG_TOKEN] * n_img + text[30:]
    ttft, t_round = measure(m15, prompt15, img)
    pl = len(prompt15)
    fl = prefill_flops(tcfg, 128 * ((pl + 127) // 128 + 1), vcfg, n_tiles=1)
    pre = max(ttft - t_round - 1e-3, 1e-9)
    legs["llava15"] = dict(prompt_tokens=pl, image_tokens=n_img,
                           tiles=1, ttft_ms=round(ttft * 1e3, 1),
                           t_round_ms=round(t_round * 1e3, 2),
                           prefill_est_ms=round(pre * 1e3, 1),
                           prefill_tflops=round(fl / 1e12, 3),
                           prefill_mfu=round(fl / pre / PEAK_BF16, 4))

    # anyres: planned tile grid + newline rows (LLaVA-1.6)
    m16 = build(anyres=True)
    plan = llava.plan_anyres(img_side, img_side, m16.llava_cfg)
    n_img = plan.n_tokens
    prompt16 = text[:30] + [IMG_TOKEN] * n_img + text[30:]
    ttft, t_round = measure(m16, prompt16, img)
    pl = len(prompt16)
    tiles = 1 + plan.grid_h * plan.grid_w
    fl = prefill_flops(tcfg, 128 * ((pl + 127) // 128 + 1), vcfg,
                       n_tiles=tiles)
    pre = max(ttft - t_round - 1e-3, 1e-9)
    legs["anyres"] = dict(prompt_tokens=pl, image_tokens=n_img,
                          tiles=tiles, ttft_ms=round(ttft * 1e3, 1),
                          t_round_ms=round(t_round * 1e3, 2),
                          prefill_est_ms=round(pre * 1e3, 1),
                          prefill_tflops=round(fl / 1e12, 3),
                          prefill_mfu=round(fl / pre / PEAK_BF16, 4))

    detail = {
        "model": ("tiny" if args.tiny else
                  f"7B@{max_len} int8 target+KV, bf16 CLIP-ViT-L/14-336"),
        "legs": legs,
        "note": "prefill_est = TTFT - one spec round - ~1ms dispatch; "
                "prefill MFU vs 197 TFLOP/s bf16 peak (v5e)",
    }
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        detail["hbm_gb"] = round(stats.get("bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass
    print(json.dumps({
        "metric": "ttft_anyres_ms",
        "value": legs["anyres"]["ttft_ms"],
        "unit": "ms",
        "detail": detail,
    }), flush=True)


if __name__ == "__main__":
    main()
