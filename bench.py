"""Headline benchmark: speculative decode round cost vs AR step cost on one TPU.

Prints ONE JSON line:
  {"metric": "spec_speedup_at_ref_tau_T0", "value": N, "unit": "x", "vs_baseline": N}

Method.  The wall-clock speedup of tree speculative decoding factors as
``speedup = tau / R`` where ``tau`` is the mean accepted length per round
(a property of the *trained* draft, reference README τ=2.98 for LLaVA-1.6-7B,
BASELINE.md) and ``R = t_round / t_ar_step`` is the pure systems ratio this
framework controls.  With no network egress we cannot load trained ViSpec
checkpoints, so the bench measures R end-to-end at 7B scale with random
weights (round cost is independent of what tokens are accepted — acceptance
only changes *which* rows are gathered) and reports the speedup at the
reference's published τ.  ``vs_baseline`` divides by the reference's 2.58×
average speedup for LLaVA-1.6-7B at T=0 (README.md:186).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compile cache: the host has 1 CPU and XLA compiles of 7B graphs
# take minutes — cache them across bench runs
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.spec import loop as spec_loop

REF_TAU = 2.98  # LLaVA-1.6 7B, T=0 (BASELINE.md)
REF_SPEEDUP = 2.58

# LLaVA-1.6-7B text backbone (Vicuna-7B): 32 x 4096 x 11008, 32 heads, vocab 32000
CONFIGS = [
    dict(num_hidden_layers=32, hidden_size=4096, intermediate_size=11008,
         num_attention_heads=32, num_key_value_heads=32, vocab_size=32000,
         max_len=1024, label="7B"),
    dict(num_hidden_layers=24, hidden_size=3072, intermediate_size=8192,
         num_attention_heads=24, num_key_value_heads=24, vocab_size=32000,
         max_len=1024, label="3B"),
    dict(num_hidden_layers=12, hidden_size=2048, intermediate_size=5504,
         num_attention_heads=16, num_key_value_heads=16, vocab_size=32000,
         max_len=1024, label="1B"),
]


def build(cfg_d, dtype=jnp.bfloat16):
    max_len = cfg_d["max_len"]
    tcfg = LlamaConfig(
        vocab_size=cfg_d["vocab_size"], hidden_size=cfg_d["hidden_size"],
        intermediate_size=cfg_d["intermediate_size"],
        num_hidden_layers=cfg_d["num_hidden_layers"],
        num_attention_heads=cfg_d["num_attention_heads"],
        num_key_value_heads=cfg_d["num_key_value_heads"],
        max_position_embeddings=max_len,
    )
    dcfg = DraftConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        intermediate_size=tcfg.intermediate_size,
        num_attention_heads=tcfg.num_attention_heads,
        num_key_value_heads=tcfg.num_key_value_heads,
        max_position_embeddings=max_len,
    )
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tparams = llama.init_params(tcfg, k1, dtype)
    dparams = draft_mod.init_params(dcfg, k2, dtype)
    dparams["embed"] = tparams["embed"]
    return tcfg, dcfg, tparams, dparams, max_len


def run_bench(cfg_d):
    tcfg, dcfg, tparams, dparams, max_len = build(cfg_d)
    spec = SpecConfig(total_tokens=30, depth=3, top_k=8)
    sampling = spec_loop.SamplingParams()
    dtype = jnp.bfloat16
    prompt_len, pad_len = 120, 128
    prompt = np.random.default_rng(0).integers(10, tcfg.vocab_size - 10, prompt_len)

    embeds = llama.embed(tparams, jnp.asarray(prompt, jnp.int32))
    embeds = jnp.pad(embeds, ((0, pad_len - prompt_len), (0, 0)))

    # ---- AR path ----
    cache = kv.init_cache(tcfg.num_hidden_layers, tcfg.num_key_value_heads,
                          max_len, tcfg.head_dim, dtype)
    tok, cache, key = spec_loop.ar_prefill(
        tparams, tcfg, sampling, embeds, jnp.asarray(prompt_len, jnp.int32),
        cache, jax.random.PRNGKey(0))
    # warmup + compile
    for _ in range(5):
        tok, cache, key = spec_loop.ar_step(tparams, tcfg, sampling, tok, cache, key)
    jax.block_until_ready(tok)
    # min-of-chunks: robust to tunnel/host interference spikes
    chunks = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(15):
            tok, cache, key = spec_loop.ar_step(tparams, tcfg, sampling, tok, cache, key)
        jax.block_until_ready(tok)
        chunks.append((time.perf_counter() - t0) / 15)
    t_ar = min(chunks)

    # ---- spec path ----
    target_cache = kv.init_cache(tcfg.num_hidden_layers, tcfg.num_key_value_heads,
                                 max_len, tcfg.head_dim, dtype)
    draft_cache = kv.init_cache(1, dcfg.num_key_value_heads, max_len, dcfg.head_dim, dtype)
    plan, max_span = draft_mod.make_prefill_plan(None, prompt_len, dcfg.num_q, pad_len)
    state = spec_loop.spec_prefill(
        tparams, dparams, tcfg, dcfg, spec, plan, sampling, embeds,
        target_cache, draft_cache, jax.random.PRNGKey(0), max_len, max_span)
    big = jnp.asarray(10**6, jnp.int32)  # device-resident: a np scalar would
    # DevicePut every call (~0.5ms/round profiled)
    for _ in range(5):
        state = spec_loop.decode_round(
            tparams, dparams, tcfg, dcfg, spec, sampling, state, big, big)
    jax.block_until_ready(state.out_len)
    chunks = []
    n_per, n_chunks = 12, 4
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(n_per):
            state = spec_loop.decode_round(
                tparams, dparams, tcfg, dcfg, spec, sampling, state, big, big)
        jax.block_until_ready(state.out_len)
        chunks.append((time.perf_counter() - t0) / n_per)
    t_round = min(chunks)
    measured_tau = float(state.new_token) / (n_chunks * n_per + 5)

    r = t_round / t_ar
    return dict(
        t_ar_ms=t_ar * 1e3, t_round_ms=t_round * 1e3, ratio=r,
        speedup_at_ref_tau=REF_TAU / r, measured_tau_random_draft=measured_tau,
        model=cfg_d["label"],
    )


def main():
    import gc

    last_err = ""
    for cfg_d in CONFIGS:
        try:
            res = run_bench(cfg_d)
            value = res["speedup_at_ref_tau"]
            print(json.dumps({
                "metric": "spec_speedup_at_ref_tau_T0",
                "value": round(value, 3),
                "unit": "x",
                "vs_baseline": round(value / REF_SPEEDUP, 3),
                "detail": {k: (round(v, 3) if isinstance(v, float) else v)
                           for k, v in res.items()},
            }))
            return
        except Exception as e:  # OOM on smaller HBM -> fall back
            # keep only the message: the traceback would pin the failed
            # attempt's device buffers and OOM every later config too
            last_err = f"{type(e).__name__}: {e}"[:200]
            sys.stderr.write(f"[bench] {cfg_d['label']} failed: {last_err}\n")
        jax.clear_caches()
        gc.collect()
    print(json.dumps({
        "metric": "spec_speedup_at_ref_tau_T0", "value": 0.0, "unit": "x",
        "vs_baseline": 0.0, "error": last_err,
    }))


if __name__ == "__main__":
    main()
