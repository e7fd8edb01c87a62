"""Batched serving: per-request outputs must equal single-request decoding."""

import jax
import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.spec import batch as batch_mod
from vispec_tpu.spec.spec_model import SpecModel

TCFG = LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
)
DCFG = DraftConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
)
SPEC = SpecConfig(total_tokens=12, depth=3, top_k=4)


def test_batched_matches_single():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    prompts = [list(range(20, 50)), list(range(60, 85)), list(range(5, 40))]
    outs = batch_mod.generate_batch(
        tparams, dparams, TCFG, DCFG, SPEC, prompts,
        max_new_tokens=15, max_len=256, eos_id=99999, dtype=jnp.float32,
    )
    assert len(outs) == 3

    model = SpecModel(TCFG, DCFG, SPEC, tparams, dparams, max_len=256,
                      dtype=jnp.float32, eos_token_id=99999)
    for prompt, got in zip(prompts, outs):
        ref = model.specgenerate(prompt, max_new_tokens=15)
        n = min(len(got), ref.new_tokens, 15)
        assert n >= 10
        assert got[:n].tolist() == ref.sequences[len(prompt):len(prompt) + n].tolist()
