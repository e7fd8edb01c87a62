"""Per-fusion TPU profile of getkacc's rollout (sequential vs batched).

bench_train measured getkacc at ~0.9-1.5 s/sample sequential and ~2 s
batched at the stage-2 geometry — both far above the ~0.25 s byte/FLOP
estimate.  Trace both variants and print the fusion tables.

Usage:  python scripts/profile_kacc.py
"""

import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_round import parse_xplane, show
from bench_train import fabricate_sample

from vispec_tpu.configs import DraftConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.ops.kv_cache import init_cache
from vispec_tpu.train import trainer


def main():
    d, v = 4096, 32000
    dcfg = DraftConfig(
        vocab_size=v, hidden_size=d, intermediate_size=11008,
        num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=2048,
    )
    rng = np.random.default_rng(0)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(0), jnp.float32)
    head_w = (jax.random.normal(jax.random.PRNGKey(1), (d, v), jnp.float32)
              * 0.02)
    sample = fabricate_sample(rng, 512, d)
    max_len, k = 512, 5

    # warm both variants through the public entry (compiles everything)
    trainer.getkacc(dparams, dcfg, head_w, sample, max_len=max_len)
    t0 = time.perf_counter()
    trainer.getkacc(dparams, dcfg, head_w, sample, max_len=max_len)
    print(f"getkacc (batched impl) warm: {time.perf_counter() - t0:.2f}s")

    # profile the batched dispatch alone (device work, one graph)
    s = sample["hidden_state"].shape[0]
    hidden = jnp.asarray(sample["hidden_state"][:s], jnp.float32)
    embeds = jnp.asarray(sample["inputs_embeds"][:s], jnp.float32)
    image_mask = sample["image_mask"][:s]
    prefixes = list(range(8, 8 + 16 * 24, 24))[:16]
    plans, h_pads, e_pads = [], [], []
    for pre_len in prefixes:
        plan, _ = draft_mod.make_prefill_plan(
            image_mask[1:pre_len], pre_len - 1, dcfg.num_q, max_len,
            max_images=8, max_span=64)
        plans.append(plan)
        h_pads.append(jnp.pad(hidden[: pre_len - 1],
                              ((0, max_len - pre_len + 1), (0, 0))))
        e_pads.append(jnp.pad(embeds[1:pre_len],
                              ((0, max_len - pre_len + 1), (0, 0))))
    cache = init_cache(1, dcfg.num_key_value_heads, max_len + k + 2,
                       dcfg.head_dim, jnp.float32)
    caches = jax.tree.map(lambda x: jnp.zeros((16,) + x.shape, x.dtype), cache)
    args = (dparams, dcfg, head_w, jnp.stack(h_pads), jnp.stack(e_pads),
            jax.tree.map(lambda *xs: jnp.stack(xs), *plans), caches, k, 1)
    np.asarray(trainer._kacc_rollout_batched(*args))  # warm this exact shape

    logdir = "/tmp/vispec_prof_kacc_b"
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        np.asarray(trainer._kacc_rollout_batched(*args))
    print(f"batched rollout: {time.perf_counter() - t0:.2f}s")
    for plane, table in parse_xplane(logdir).items():
        show(f"BATCHED {plane}", table, top=35)

    # sequential variant: 16 per-prefix dispatches, one readback
    cache1 = init_cache(1, dcfg.num_key_value_heads, max_len + k + 2,
                        dcfg.head_dim, jnp.float32)
    def run_seq():
        toks = [trainer._kacc_rollout(dparams, dcfg, head_w, h, e, p, cache1,
                                      k, 1)
                for h, e, p in zip(h_pads, e_pads, plans)]
        return jax.device_get(toks)
    run_seq()  # warm
    logdir = "/tmp/vispec_prof_kacc_s"
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        run_seq()
    print(f"sequential rollouts: {time.perf_counter() - t0:.2f}s")
    for plane, table in parse_xplane(logdir).items():
        show(f"SEQUENTIAL {plane}", table, top=35)


if __name__ == "__main__":
    main()
