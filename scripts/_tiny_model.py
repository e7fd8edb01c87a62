"""Shared tiny random target+draft builder for the drive scripts (one place
to track SpecModel's constructor / embed-sharing conventions)."""

import sys

sys.path.insert(0, __file__.rsplit("/scripts", 1)[0])

import jax
import jax.numpy as jnp

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.spec.spec_model import SpecModel


def tiny_model(hidden=128, layers=2, vocab=512, max_len=512,
               dtype=jnp.bfloat16, total_tokens=12, depth=3, top_k=4, **kw):
    """(model, tcfg, dcfg, tparams, dparams) with the draft sharing the
    target's embedding table (the reference convention, cnets_ours.py:683)."""
    tcfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=max_len,
    )
    dcfg = DraftConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=max_len, num_q=2,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(tcfg, k1, dtype)
    dparams = draft_mod.init_params(dcfg, k2, dtype)
    dparams["embed"] = tparams["embed"]
    model = SpecModel(
        tcfg, dcfg, SpecConfig(total_tokens=total_tokens, depth=depth,
                               top_k=top_k),
        tparams, dparams, max_len=max_len, dtype=dtype, eos_token_id=10**6,
        **kw,
    )
    return model, tcfg, dcfg, tparams, dparams
