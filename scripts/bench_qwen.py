"""Qwen2.5-VL on-chip benchmark — the other half of the reference's results
table (README.md:190-195 T=0, :202-207 T=1).

What this exercises that no LLaVA-geometry bench does (VERDICT r4 item 1):
- **M-RoPE live in the decode round**: the prompt contains a real image span,
  so ``get_rope_index_host`` produces 3-D position ids with a NONZERO
  rope_delta that rides SpecState into every verify/draft step (reference
  get_rope_index, modeling_qwen2_5_vl_kv.py:1789-2008; utils.py:398-402).
- **qkv_bias** QKV projections (modeling_qwen2_kv.py:482-488).
- **GQA through the Mosaic kernels**: Qwen-3B is 16q/2kv, Qwen-7B is 28q/4kv
  at head_dim=128 — the first grouped-query geometry on real Mosaic (the
  7B/13B llama geometries are MHA; GQA was CPU-interpret-tested only).
- **The windowed ViT on real XLA:TPU**: a fabricated full-geometry
  Qwen2.5-VL vision tower (32 blocks, window 112, fullatt {7,15,23,31},
  2x2 merger) encodes a 448x448 image (grid 1x32x32 -> 256 merged tokens)
  during prefill; TTFT is reported with the tower included.

Weights are fabricated (no network egress — CLAUDE.md): 3B directly in bf16
(~6.8 GB fits the chip), 7B directly as int8 QTensors + int8 KV cache
(bf16 7B is ~15.2 GB and cannot fit; the reference runs Qwen-7B on an A100 —
int8 target is this chip's serving mode, same methodology as bench_13b.py).
Round cost is independent of token content (acceptance only changes gather
rows), so the systems ratio is the real Qwen number; speedups are reported at
the reference's published tau per method (BASELINE.md:29-61).

Run (on the chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_qwen.py --model 3b
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_qwen.py --model 7b
Prints one JSON line per run (bench.py tau+1 accounting).
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
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.models import medusa as medusa_mod
from vispec_tpu.models import qwen2_5_vl as qwen_vl
from vispec_tpu.ops.quant import QTensor
from vispec_tpu.spec.spec_model import SpecModel

# reference taus/speedups (BASELINE.md; averages over the 8 Qwen benchmarks)
REF = {
    "3b": dict(tau=2.19, speedup=1.87, tau_t1=1.42, speedup_t1=1.47,
               tau_eagle=1.16, speedup_eagle=1.39,
               tau_medusa=0.61, speedup_medusa=1.14),
    "7b": dict(tau=2.24, speedup=1.80, tau_t1=1.66, speedup_t1=1.49,
               tau_eagle=1.34, speedup_eagle=1.40,
               tau_medusa=0.60, speedup_medusa=1.11),
}

# real HF geometries (Qwen/Qwen2.5-VL-{3B,7B}-Instruct config.json)
GEOM = {
    "3b": dict(vocab_size=151936, hidden_size=2048, intermediate_size=11008,
               num_hidden_layers=36, num_attention_heads=16,
               num_key_value_heads=2),
    "7b": dict(vocab_size=152064, hidden_size=3584, intermediate_size=18944,
               num_hidden_layers=28, num_attention_heads=28,
               num_key_value_heads=4),
}

IMG_TOKEN, VIDEO_TOKEN, VSTART = 151655, 151656, 151652


def qwen_text_config(model: str, max_len: int) -> LlamaConfig:
    g = GEOM[model]
    return LlamaConfig(
        max_position_embeddings=max_len, rope_theta=1e6, qkv_bias=True,
        mrope_section=(16, 24, 24), **g,
    )


def qwen_vision_config(model: str) -> qwen_vl.QwenVisionConfig:
    # both sizes share the tower; only the merger's out_hidden differs
    return qwen_vl.QwenVisionConfig(out_hidden_size=GEOM[model]["hidden_size"])


def fabricate_vision_params(qcfg: qwen_vl.QwenVisionConfig, key, dtype):
    ks = jax.random.split(key, 8)
    h, m, l = qcfg.hidden_size, qcfg.intermediate_size, qcfg.depth
    pin = qcfg.in_channels * qcfg.temporal_patch_size * qcfg.patch_size**2

    def w(k, shape, scale=0.02):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

    return {
        "patch_w": w(ks[0], (pin, h)),
        "blocks": {
            "norm1": jnp.ones((l, h), jnp.float32),
            "norm2": jnp.ones((l, h), jnp.float32),
            "wqkv": w(ks[1], (l, h, 3 * h)), "bqkv": jnp.zeros((l, 3 * h), dtype),
            "wo": w(ks[2], (l, h, h)), "bo": jnp.zeros((l, h), dtype),
            "w_gate": w(ks[3], (l, h, m)), "b_gate": jnp.zeros((l, m), dtype),
            "w_up": w(ks[4], (l, h, m)), "b_up": jnp.zeros((l, m), dtype),
            "w_down": w(ks[5], (l, m, h)), "b_down": jnp.zeros((l, h), dtype),
        },
        "merger": {
            "ln_q": jnp.ones((h,), jnp.float32),
            "w1": w(ks[6], (4 * h, 4 * h)), "b1": jnp.zeros((4 * h,), dtype),
            "w2": w(ks[7], (4 * h, qcfg.out_hidden_size)),
            "b2": jnp.zeros((qcfg.out_hidden_size,), dtype),
        },
    }


def fabricate_q8_target(cfg: LlamaConfig, key: jax.Array, dtype=jnp.bfloat16):
    """Random int8-quantized GQA target with qkv biases — the pytree
    quantize_target_params produces for a Qwen backbone (QTensor per stacked
    matmul, bf16 embed + biases, f32 norms).  Same layer-streamed generation
    as bench_13b.fabricate_q8_target (the randint int32 transient is 4x the
    int8 output; lax.map bounds it to one layer)."""
    from functools import partial

    keys = iter(jax.random.split(key, 12))
    l, d, i = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    hq = cfg.num_attention_heads * cfg.head_dim
    hkv = cfg.num_key_value_heads * cfg.head_dim

    @partial(jax.jit, static_argnums=(1, 2))
    def _stacked_rows(ks, a, b):
        return jax.lax.map(
            lambda k: jax.random.randint(k, (a, b), -127, 128, jnp.int8), ks)

    def q8(shape):
        if len(shape) == 3:
            q = _stacked_rows(jax.random.split(next(keys), shape[0]),
                              shape[1], shape[2])
        else:
            q = jax.random.randint(next(keys), shape, -127, 128, jnp.int8)
        s = jnp.full(shape[:-2] + shape[-1:], 0.02 / 127.0, jnp.float32)
        return QTensor(q=q, s=s)

    layers = {
        "input_norm": jnp.ones((l, d), jnp.float32),
        "post_norm": jnp.ones((l, d), jnp.float32),
        "wq": q8((l, d, hq)), "wk": q8((l, d, hkv)), "wv": q8((l, d, hkv)),
        "wo": q8((l, hq, d)),
        "w_gate": q8((l, d, i)), "w_up": q8((l, d, i)), "w_down": q8((l, i, d)),
        "bq": jnp.zeros((l, hq), dtype), "bk": jnp.zeros((l, hkv), dtype),
        "bv": jnp.zeros((l, hkv), dtype),
    }
    embed = (jax.random.normal(next(keys), (cfg.vocab_size, d), dtype)
             * jnp.asarray(0.02, dtype))
    return {
        "embed": embed, "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": q8((d, cfg.vocab_size)),
    }


def build_prompt(rng, n_img: int, vocab: int):
    """Text + vision_start + image span + text — a real M-RoPE layout."""
    pre = rng.integers(10, vocab - 64, 24).tolist()
    post = rng.integers(10, vocab - 64, 40).tolist()
    return pre + [VSTART] + [IMG_TOKEN] * n_img + post


def time_spec(model, prompt, img, temperature=0.0):
    kw = {"pixel_values": img} if img is not None else {}
    model.specgenerate(prompt, max_new_tokens=8, temperature=temperature, **kw)
    t = 1e9
    for _ in range(bench.REPEATS):
        res = model.specgenerate(prompt, max_new_tokens=bench.N_TOKENS,
                                 temperature=temperature, **kw)
        t = min(t, res.decode_time / max(res.rounds, 1))
    return t


def time_ar(model, prompt, img, temperature=0.0):
    kw = {"pixel_values": img} if img is not None else {}
    model.ar_generate(prompt, max_new_tokens=8, temperature=temperature, **kw)
    t = 1e9
    for _ in range(bench.REPEATS):
        res = model.ar_generate(prompt, max_new_tokens=bench.N_TOKENS,
                                temperature=temperature, **kw)
        t = min(t, res.decode_time / max(res.new_tokens - 1, 1))
    return t


def time_ttft(model, prompt, img):
    """Wall time of specgenerate(max_new_tokens=1): ViT + target prefill +
    first draft tree + one verify + the committed-token readback — the time a
    user waits for the first output token (the phase inside the reference's
    wall_time metric that no prior on-chip number covered)."""
    kw = {"pixel_values": img} if img is not None else {}
    model.specgenerate(prompt, max_new_tokens=1, **kw)  # compile
    t = 1e9
    for _ in range(bench.REPEATS):
        t0 = time.perf_counter()
        model.specgenerate(prompt, max_new_tokens=1, **kw)
        t = min(t, time.perf_counter() - t0)
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("3b", "7b"), default="3b")
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--no-image", action="store_true",
                   help="text-only prompt (skips the ViT; M-RoPE trivial)")
    p.add_argument("--skip-t1", action="store_true")
    p.add_argument("--capacity", action="store_true",
                   help="lean capacity probe: TTFT + AR + int8-draft round "
                        "only (skips bf16-draft/T=1/eagle/medusa legs) — for "
                        "long-context rows where each leg is a fresh "
                        "multi-minute 32k compile")
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke: shrink the geometry (keeps GQA ratios + "
                        "head_dim 128 so the same code paths trace)")
    args = p.parse_args()

    img_hw, n_img, min_pixels = 448, 256, 256 * 28 * 28
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        # keep GQA (4q/1kv) and head_dim=128 (mrope_section sums to 64)
        GEOM[args.model] = dict(
            vocab_size=1024, hidden_size=512, intermediate_size=1024,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=1)
        bench.N_TOKENS, bench.REPEATS = 12, 1
        global IMG_TOKEN, VIDEO_TOKEN, VSTART
        IMG_TOKEN, VIDEO_TOKEN, VSTART = 1000, 1001, 1002
        # 112x112 -> grid (1,8,8) -> 16 merged tokens
        img_hw, n_img, min_pixels = 112, 16, 56 * 56

    ref = REF[args.model]
    tcfg = qwen_text_config(args.model, args.max_len)
    if args.tiny:
        dcfg = DraftConfig(
            vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
            intermediate_size=tcfg.intermediate_size,
            num_attention_heads=tcfg.num_attention_heads,
            num_key_value_heads=tcfg.num_attention_heads,
            rope_theta=1e6, qkv_bias=True)
        qcfg = qwen_vl.QwenVisionConfig(
            hidden_size=64, out_hidden_size=tcfg.hidden_size,
            intermediate_size=128, depth=3, num_heads=4, window_size=56,
            fullatt_block_indexes=(1,))
    else:
        dcfg = DraftConfig.from_json(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                         "vispec_tpu", "train", "configs",
                         f"qwen2.5_vl_{args.model.upper()}_config.json"))
        qcfg = qwen_vision_config(args.model)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    int8_target = args.model == "7b"
    if int8_target:
        tparams = fabricate_q8_target(tcfg, k1)
    else:
        tparams = llama.init_params(tcfg, k1, jnp.bfloat16)
    dparams = draft_mod.init_params(dcfg, k2, jnp.bfloat16)
    dparams["embed"] = tparams["embed"]
    vparams = fabricate_vision_params(qcfg, k3, jnp.bfloat16)

    model = SpecModel(
        tcfg, dcfg, SpecConfig(total_tokens=30, depth=3, top_k=8),
        tparams, dparams, max_len=args.max_len, dtype=jnp.bfloat16,
        eos_token_id=10**6, qwen_cfg=qcfg, vparams=vparams,
        image_token_index=IMG_TOKEN, video_token_index=VIDEO_TOKEN,
        vision_start_token_id=VSTART, quantize_kv=int8_target,
        min_pixels=min_pixels,
    )
    if int8_target:
        model.quantize_target = "int8"  # fabricated pre-quantized params

    rng = np.random.default_rng(0)
    if args.no_image:
        img = None
        prompt = rng.integers(10, tcfg.vocab_size - 64, 120).tolist()
    else:
        # 448x448 -> smart_resize keeps 448 (== min_pixels) -> grid (1,32,32)
        # -> 1024 patches -> 256 merged vision tokens
        img = jnp.asarray(rng.uniform(0, 1, (img_hw, img_hw, 3)), jnp.float32)
        prompt = build_prompt(rng, n_img, tcfg.vocab_size)

    detail = {
        "model": f"qwen2.5-vl-{args.model}@{args.max_len}",
        "target": "int8 (fabricated)" if int8_target else "bf16",
        "kv": "int8" if int8_target else "bf16",
        "gqa": f"{tcfg.num_attention_heads}q/{tcfg.num_key_value_heads}kv",
        "qkv_bias": True, "mrope": True,
        "image": None if args.no_image
        else f"{img_hw}x{img_hw} ({n_img} vision tokens)",
        "prompt_len": len(prompt),
    }

    # TTFT with the windowed ViT + M-RoPE prefill on the chip
    ttft = time_ttft(model, prompt, img)
    detail["ttft_ms"] = round(ttft * 1e3, 1)

    # AR baseline (per-step decode, M-RoPE delta live: positions = idx + delta)
    t_ar = time_ar(model, prompt, img)
    detail["t_ar_ms"] = round(t_ar * 1e3, 3)
    detail["ar_toks_per_s"] = round(1.0 / t_ar, 1)

    # ViSpec rounds: exact bf16 draft, then the int8-draft serving mode
    orig_dparams = model.dparams
    if not args.capacity:
        t_round = time_spec(model, prompt, img)
        r = t_round / t_ar
        detail.update(t_round_ms=round(t_round * 1e3, 3), ratio=round(r, 4),
                      speedup_at_ref_tau=round((ref["tau"] + 1) / r, 3))
    model.quantize_draft_inplace("int8")
    t_round_q8 = time_spec(model, prompt, img)
    r_q8 = t_round_q8 / t_ar
    detail.update(
        t_round_int8draft_ms=round(t_round_q8 * 1e3, 3),
        ratio_int8draft=round(r_q8, 4),
        ref_tau=ref["tau"],
        speedup_at_ref_tau_int8=round((ref["tau"] + 1) / r_q8, 3),
        spec_toks_per_s_at_ref_tau=round((ref["tau"] + 1) / t_round_q8, 1),
    )

    # T=1 sampling legs (reference README.md:202-207)
    if not args.skip_t1 and not args.capacity:
        t_round_t1 = time_spec(model, prompt, img, temperature=1.0)
        t_ar_t1 = time_ar(model, prompt, img, temperature=1.0)
        r_t1 = t_round_t1 / t_ar_t1
        detail.update(
            t_ar_T1_ms=round(t_ar_t1 * 1e3, 3),
            t_round_int8_T1_ms=round(t_round_t1 * 1e3, 3),
            ratio_T1_int8=round(r_t1, 4), ref_tau_T1=ref["tau_t1"],
            speedup_at_ref_tau_T1=round((ref["tau_t1"] + 1) / r_t1, 3),
            vs_ref_T1=round(((ref["tau_t1"] + 1) / r_t1) / ref["speedup_t1"], 3),
        )

    if not args.capacity:
        # EAGLE-2 leg: same 1-layer draft, no vision adaptor (cnets.py)
        model.dparams = orig_dparams
        model._target_cache = model._draft_cache = None
        import dataclasses

        dcfg_e = dataclasses.replace(dcfg, vision=False)
        dparams_e = draft_mod.init_params(dcfg_e, jax.random.PRNGKey(7),
                                          jnp.bfloat16)
        dparams_e["embed"] = tparams["embed"]
        eagle = SpecModel(
            tcfg, dcfg_e, model.spec, tparams, dparams_e,
            max_len=args.max_len, dtype=jnp.bfloat16, eos_token_id=10**6,
            qwen_cfg=qcfg, vparams=vparams,
            image_token_index=IMG_TOKEN, video_token_index=VIDEO_TOKEN,
            vision_start_token_id=VSTART, quantize_kv=int8_target,
            min_pixels=min_pixels,
        )
        eagle.quantize_target = model.quantize_target
        eagle.quantize_draft_inplace("int8")
        t_round_eagle = time_spec(eagle, prompt, img)
        r_e = t_round_eagle / t_ar
        detail.update(
            t_round_eagle_int8_ms=round(t_round_eagle * 1e3, 3),
            ratio_eagle=round(r_e, 4),
            speedup_at_ref_tau_eagle=round((ref["tau_eagle"] + 1) / r_e, 3),
            vs_ref_eagle=round(((ref["tau_eagle"] + 1) / r_e)
                               / ref["speedup_eagle"], 3),
        )
        eagle._target_cache = eagle._draft_cache = None
        del eagle, dparams_e

        # Medusa leg: per-offset heads, no draft transformer.  Heads get
        # per-leaf independent noise (zero-init heads are the identity and
        # cause spurious acceptances — bench.py medusa note).
        km = jax.random.PRNGKey(8)
        mparams = medusa_mod.init_params(tcfg.hidden_size, km, jnp.bfloat16)
        leaves, treedef = jax.tree.flatten(mparams)
        leaves = [x + 0.05 * jax.random.normal(jax.random.fold_in(km, i),
                                               x.shape, x.dtype)
                  for i, x in enumerate(leaves)]
        mparams = jax.tree.unflatten(treedef, leaves)
        med = SpecModel(
            tcfg, dcfg, model.spec, tparams, orig_dparams,
            max_len=args.max_len, dtype=jnp.bfloat16, eos_token_id=10**6,
            qwen_cfg=qcfg, vparams=vparams,
            image_token_index=IMG_TOKEN, video_token_index=VIDEO_TOKEN,
            vision_start_token_id=VSTART, quantize_kv=int8_target,
            mparams=mparams, min_pixels=min_pixels,
        )
        med.quantize_target = model.quantize_target
        t_round_med = time_spec(med, prompt, img)
        r_m = t_round_med / t_ar
        detail.update(
            t_round_medusa_ms=round(t_round_med * 1e3, 3),
            ratio_medusa=round(r_m, 4),
            speedup_at_ref_tau_medusa=round((ref["tau_medusa"] + 1) / r_m, 3),
            vs_ref_medusa=round(((ref["tau_medusa"] + 1) / r_m)
                                / ref["speedup_medusa"], 3),
        )

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        detail["hbm_gb"] = round(stats.get("bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass

    value = (ref["tau"] + 1) / r_q8
    print(json.dumps({
        "metric": f"qwen{args.model}_spec_speedup_at_ref_tau_T0",
        "value": round(value, 3),
        "unit": "x",
        "vs_baseline": round(value / ref["speedup"], 3),
        "detail": detail,
    }), flush=True)


if __name__ == "__main__":
    main()
