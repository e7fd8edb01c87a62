"""Build tests/data/tau_fixture.npz: a DETERMINISTIC trained toy target+draft
pair plus its measured greedy tau, used by tests/test_e2e_tau.py's regression
test.  The statistical pipeline test proves training works; this fixture
catches proposal-quality regressions bit-deterministically (VERDICT r2 weak #7
/ next #10).

Rerun after intentional draft/teacher changes:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/make_tau_fixture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.spec.spec_model import SpecModel
from vispec_tpu.train import data_gen, trainer
from vispec_tpu.train.step import make_optimizer, train_step

T = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=512)
D = DraftConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "tests", "data", "tau_fixture.npz")
DATADIR = "/tmp/tau_fixture_data"


def main():
    tparams = llama.init_params(T, jax.random.PRNGKey(0), jnp.float32)
    cache = kv.init_cache(2, 2, 256, 16, jnp.float32)
    rng = np.random.default_rng(0)
    os.makedirs(DATADIR, exist_ok=True)
    for i in range(16):
        ids = rng.integers(1, 90, 16)
        embeds = llama.embed(tparams, jnp.asarray(ids))
        embeds = jnp.pad(embeds, ((0, 64 - len(ids)), (0, 0)))
        sample, cache = data_gen.generate_sample(
            tparams, T, embeds, len(ids), None, cache,
            max_new_tokens=48, eos_token_id=999,
        )
        data_gen.save_sample(DATADIR, i, sample)

    cfg = trainer.TrainConfig(lr=3e-3, bs=2, max_len=64, mtp_steps=1,
                              warmup_steps=5, total_steps=4000, max_images=1,
                              max_span_bucket=8, noise_std=0.05)
    dparams = draft_mod.init_params(D, jax.random.PRNGKey(1), jnp.float32)
    dparams["embed"] = tparams["embed"] + 0
    head_w = tparams["lm_head"].astype(jnp.float32)
    opt = make_optimizer(cfg.lr, cfg.warmup_steps, cfg.total_steps,
                         cfg.grad_clip)
    ost = opt.init(dparams)
    for epoch in range(60):
        for batch, _ in trainer.data_iterator(DATADIR, cfg, D, seed=epoch):
            dparams, ost, _ = train_step(
                dparams, ost, D, head_w, batch, opt, mtp_steps=1, max_span=8,
            )

    model = SpecModel(T, D, SpecConfig(total_tokens=16, depth=3, top_k=4),
                      tparams, dict(dparams), max_len=512, dtype=jnp.float32,
                      eos_token_id=999)
    taus = []
    for s in range(6):
        prompt = np.random.default_rng(100 + s).integers(1, 90, 16).tolist()
        r = model.specgenerate(prompt, max_new_tokens=40)
        taus.extend(a + 1 for a in r.acceptance_lengths)
    tau = float(np.mean(taus))
    print(f"fixture tau = {tau:.4f} over {len(taus)} rounds")

    flat = {}
    for side, params in (("t", tparams), ("d", dparams)):
        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in leaves:
            key = side + "/" + "/".join(str(getattr(p, "key", p)) for p in path)
            flat[key] = np.asarray(leaf)
    flat["__tau__"] = np.asarray(tau)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **flat)
    print(f"wrote {OUT} ({os.path.getsize(OUT) // 1024} KB)")


if __name__ == "__main__":
    main()
