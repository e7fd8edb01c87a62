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


def test_mixtral_from_pretrained(tmp_path):
    """Fabricated HF-layout Mixtral checkpoint -> from_pretrained dispatch
    (reference: modeling_mixtral_kv.py:1021) -> greedy lossless decode."""
    import json
    import os

    import pytest

    st = pytest.importorskip("safetensors.numpy")
    from tests.test_from_pretrained import write_draft_ckpt

    rng = np.random.default_rng(3)
    H, I, V, L, E = 48, 96, 160, 2, 4

    def w(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    sd = {
        "model.embed_tokens.weight": w(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(V, H),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        sd.update({
            p + "input_layernorm.weight": np.ones(H, np.float32),
            p + "post_attention_layernorm.weight": np.ones(H, np.float32),
            p + "self_attn.q_proj.weight": w(H, H),
            p + "self_attn.k_proj.weight": w(H // 2, H),
            p + "self_attn.v_proj.weight": w(H // 2, H),
            p + "self_attn.o_proj.weight": w(H, H),
            p + "block_sparse_moe.gate.weight": w(E, H),
        })
        for j in range(E):
            q = p + f"block_sparse_moe.experts.{j}."
            sd.update({
                q + "w1.weight": w(I, H),
                q + "w2.weight": w(H, I),
                q + "w3.weight": w(I, H),
            })
    tdir = str(tmp_path / "mixtral")
    os.makedirs(tdir, exist_ok=True)
    st.save_file(sd, os.path.join(tdir, "model.safetensors"))
    cfg = {
        "architectures": ["MixtralForCausalLM"], "model_type": "mixtral",
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": 4,
        "num_key_value_heads": 2, "max_position_embeddings": 2048,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0, "eos_token_id": 5,
        "num_local_experts": E, "num_experts_per_tok": 2,
    }
    with open(os.path.join(tdir, "config.json"), "w") as f:
        json.dump(cfg, f)

    ddir = str(tmp_path / "draft")
    write_draft_ckpt(ddir)
    model = SpecModel.from_pretrained(
        base_model_path=tdir, spec_model_path=ddir,
        total_token=12, depth=3, top_k=4, max_len=512, dtype=jnp.float32,
    )
    assert model.tcfg.num_local_experts == E
    prompt = list(range(10, 40))
    res = model.specgenerate(prompt, max_new_tokens=12)
    ar = model.ar_generate(prompt, max_new_tokens=12)
    n = min(res.new_tokens, ar.new_tokens, 12)
    assert n >= 5
    assert res.sequences[: len(prompt) + n].tolist() == \
        ar.sequences[: len(prompt) + n].tolist()


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
