"""Continuous-batching serving demo: random-weight model, fixed decode slots,
queued requests admitted mid-flight, optional int8 draft + prefix caching.

    python examples/serving.py [--int8] [--batch 4]

With real checkpoints, build the model via SpecModel.from_pretrained instead
(see examples/quickstart.py) — the engine API is identical.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/examples", 1)[0])

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit JAX_PLATFORMS even under site hooks that import jax
    # at interpreter startup and pin a backend before env vars take effect
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.spec.spec_model import SpecModel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--requests", type=int, default=12)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--hidden", type=int, default=256)
    args = p.parse_args()

    tcfg = LlamaConfig(
        vocab_size=1024, hidden_size=args.hidden,
        intermediate_size=args.hidden * 2, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=1024,
    )
    dcfg = DraftConfig(
        vocab_size=1024, hidden_size=args.hidden,
        intermediate_size=args.hidden * 2, num_attention_heads=8,
        num_key_value_heads=4, max_position_embeddings=1024,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(tcfg, k1, jnp.bfloat16)
    dparams = draft_mod.init_params(dcfg, k2, jnp.bfloat16)
    dparams["embed"] = tparams["embed"]
    model = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=30, depth=3, top_k=8),
                      tparams, dparams, max_len=1024, dtype=jnp.bfloat16,
                      eos_token_id=10**6, quantize_draft=args.int8)

    rng = np.random.default_rng(0)
    system_prompt = rng.integers(5, 1000, 48).tolist()  # shared prefix
    prompts = [system_prompt + rng.integers(5, 1000, rng.integers(8, 60)).tolist()
               for _ in range(args.requests)]

    engine = model.serving_engine(
        batch_size=args.batch, max_new_tokens=64, pad_bucket=256,
        prefix_ids=system_prompt, suffix_bucket=128,
    )
    engine.run_all(prompts[: args.batch])  # warm compiles
    t0 = time.perf_counter()
    outs = engine.run_all(prompts)
    dt = time.perf_counter() - t0
    total = sum(len(o) for o in outs)
    print(f"served {len(prompts)} requests on {args.batch} slots "
          f"({'int8' if args.int8 else 'bf16'} draft, prefix-cached): "
          f"{total} tokens in {dt:.2f}s = {total / dt:.1f} tok/s")
    mean_tau = np.mean([a + 1 for lens in engine.acceptance.values()
                        for a in lens] or [1.0])
    print(f"mean accepted length (random draft ~1): {mean_tau:.2f}")


if __name__ == "__main__":
    main()
