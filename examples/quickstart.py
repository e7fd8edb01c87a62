"""Quickstart: speculative decoding end-to-end on random weights (no downloads).

  PYTHONPATH=.:$PYTHONPATH python examples/quickstart.py

Builds a small target + draft, trains the draft briefly on the target's own
continuations (the ViSpec data recipe), and compares speculative vs
autoregressive decoding.  With real checkpoints use SpecModel.from_pretrained
(see README.md).
"""

import os
import sys
import time

sys.path.insert(0, ".")

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
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.spec.spec_model import SpecModel
from vispec_tpu.train import data_gen, trainer
from vispec_tpu.train.step import make_optimizer, train_step


def main():
    tcfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=512)
    dcfg = DraftConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=512)
    tparams = llama.init_params(tcfg, jax.random.PRNGKey(0), jnp.float32)

    # 1. generate training data: the target's own greedy continuations
    import tempfile

    datadir = tempfile.mkdtemp(prefix="vispec_data_")
    cache = kv.init_cache(2, 2, 256, 16, jnp.float32)
    rng = np.random.default_rng(0)
    for i in range(12):
        ids = rng.integers(1, 90, 16)
        embeds = llama.embed(tparams, jnp.asarray(ids))
        embeds = jnp.pad(embeds, ((0, 64 - len(ids)), (0, 0)))
        sample, cache = data_gen.generate_sample(
            tparams, tcfg, embeds, len(ids), None, cache,
            max_new_tokens=48, eos_token_id=999)
        data_gen.save_sample(datadir, i, sample)
    print(f"generated 12 samples -> {datadir}")

    # 2. train the 1-layer draft (MTP loss)
    cfg = trainer.TrainConfig(lr=3e-3, bs=2, max_len=64, mtp_steps=1,
                              warmup_steps=5, total_steps=4000, max_images=1,
                              max_span_bucket=8, noise_std=0.05)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(1), jnp.float32)
    dparams["embed"] = tparams["embed"] + 0  # train_step donates dparams
    head_w = tparams["lm_head"].astype(jnp.float32)
    opt = make_optimizer(cfg.lr, cfg.warmup_steps, cfg.total_steps, cfg.grad_clip)
    ost = opt.init(dparams)
    t0 = time.time()
    steps = 0
    for epoch in range(30):
        for batch, _ in trainer.data_iterator(datadir, cfg, dcfg, seed=epoch):
            dparams, ost, metrics = train_step(
                dparams, ost, dcfg, head_w, batch, opt, mtp_steps=1, max_span=8)
            steps += 1
    print(f"trained {steps} steps in {time.time() - t0:.0f}s "
          f"(loss {float(metrics['loss']):.3f})")

    # 3. speculative vs autoregressive decoding
    model = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=16, depth=3, top_k=4),
                      tparams, dparams, max_len=512, dtype=jnp.float32,
                      eos_token_id=999)
    prompt = rng.integers(1, 90, 16).tolist()
    spec = model.specgenerate(prompt, max_new_tokens=48)
    ar = model.ar_generate(prompt, max_new_tokens=48)
    tau = np.mean([a + 1 for a in spec.acceptance_lengths])
    n = min(spec.new_tokens, ar.new_tokens)
    same = spec.sequences[: 16 + n].tolist() == ar.sequences[: 16 + n].tolist()
    print(f"spec: {spec.new_tokens} tokens in {spec.rounds} rounds "
          f"(tau={tau:.2f}); greedy-lossless vs AR: {same}")


if __name__ == "__main__":
    main()
