"""Per-fusion TPU profile of the stage-2 MTP train step.

bench_train measured the step at ~10% MFU (283 ms device vs a 28 ms matmul
floor at 5.6 TFLOPs) in BOTH f32 and bf16 compute — so ~90% of the step is
not MXU work.  This traces a few warm steps and prints the fusion table to
find where the time goes (the round-4 int8-KV scale-table copy was found
exactly this way).

Usage:  python scripts/profile_train.py [--bf16] [--steps 3]
"""

import argparse
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

from vispec_tpu.configs import DraftConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.train.step import make_optimizer, train_step
from vispec_tpu.train.trainer import TrainConfig, batch_examples, prepare_example

from bench_train import fabricate_sample  # same geometry as the bench


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--seq", type=int, default=900)
    args = p.parse_args()

    d, v, inter = 4096, 32000, 11008
    dcfg = DraftConfig(
        vocab_size=v, hidden_size=d, intermediate_size=inter,
        num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=2048,
    )
    cfg = TrainConfig(bs=args.bs, max_len=1024, mtp_steps=2)
    rng = np.random.default_rng(0)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(0), jnp.float32)
    head_w = (jax.random.normal(jax.random.PRNGKey(1), (d, v), jnp.float32)
              * 0.02)
    optimizer = make_optimizer(cfg.lr, cfg.warmup_steps, cfg.total_steps,
                               cfg.grad_clip)
    opt_state = jax.jit(optimizer.init)(dparams)

    exs = []
    while len(exs) < cfg.bs:
        ex = prepare_example(fabricate_sample(rng, args.seq, d), cfg, dcfg, rng)
        if ex is not None:
            exs.append(ex)
    batch, max_span = batch_examples(exs)
    ms = cfg.max_span_bucket if max_span > 1 else 1
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    # warm
    dparams, opt_state, metrics = train_step(
        dparams, opt_state, dcfg, head_w, batch, optimizer,
        mtp_steps=cfg.mtp_steps, max_span=ms, bf16=args.bf16)
    float(metrics["loss"])

    logdir = "/tmp/vispec_prof_train"
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            dparams, opt_state, metrics = train_step(
                dparams, opt_state, dcfg, head_w, batch, optimizer,
                mtp_steps=cfg.mtp_steps, max_span=ms, bf16=args.bf16)
        float(metrics["loss"])
    wall = time.perf_counter() - t0
    print(f"{args.steps} steps in {wall:.2f}s => {wall / args.steps * 1e3:.1f} "
          f"ms/step (profiler-inflated; fenced bench number is the truth)")
    for plane, table in parse_xplane(logdir).items():
        show(f"TRAIN {plane}", table, top=45)


if __name__ == "__main__":
    main()
