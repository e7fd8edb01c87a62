"""End-to-end checkpoint ingestion: fabricate HF-layout checkpoint directories
on disk (safetensors + config.json with real HF key names), load through
SpecModel.from_pretrained, and generate."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

st = pytest.importorskip("safetensors.numpy")

H, I, V, L = 48, 96, 160, 2
HEADS, KV = 4, 2


def write_llama_ckpt(d):
    rng = np.random.default_rng(0)

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
            p + "mlp.gate_proj.weight": w(I, H),
            p + "mlp.up_proj.weight": w(I, H),
            p + "mlp.down_proj.weight": w(H, I),
        })
    os.makedirs(d, exist_ok=True)
    st.save_file(sd, os.path.join(d, "model.safetensors"))
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": HEADS,
        "num_key_value_heads": KV, "max_position_embeddings": 2048,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0, "eos_token_id": 5,
        "model_type": "llama",
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


def write_draft_ckpt(d):
    rng = np.random.default_rng(1)

    def w(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    sd = {
        "embed_tokens.weight": w(V, H),
        "fc.weight": w(H, 2 * H),
        "fc.bias": np.zeros(H, np.float32),
        "img_fc.weight": w(H, 2 * H),
        "img_fc.bias": np.zeros(H, np.float32),
        "imadpt.q": w(2, HEADS, H // HEADS),
        "imadpt.k_proj.weight": w(H, H),
        "imadpt.v_proj.weight": w(H, H),
        "imadpt.o_proj.weight": w(H, H),
        "layers.0.post_attention_layernorm.weight": np.ones(H, np.float32),
        "layers.0.self_attn.q_proj.weight": w(H, H),
        "layers.0.self_attn.k_proj.weight": w(H // 2, H),
        "layers.0.self_attn.v_proj.weight": w(H // 2, H),
        "layers.0.self_attn.o_proj.weight": w(H, H),
        "layers.0.mlp.gate_proj.weight": w(I, H),
        "layers.0.mlp.up_proj.weight": w(I, H),
        "layers.0.mlp.down_proj.weight": w(H, I),
    }
    os.makedirs(d, exist_ok=True)
    st.save_file(sd, os.path.join(d, "model.safetensors"))
    cfg = {
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": 1, "num_attention_heads": HEADS,
        "num_key_value_heads": KV, "max_position_embeddings": 2048,
        "rms_norm_eps": 1e-6, "bias": True,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


def test_from_pretrained_roundtrip(tmp_path):
    from vispec_tpu.spec.spec_model import SpecModel

    tdir, ddir = str(tmp_path / "target"), str(tmp_path / "draft")
    write_llama_ckpt(tdir)
    write_draft_ckpt(ddir)
    model = SpecModel.from_pretrained(
        base_model_path=tdir, spec_model_path=ddir,
        total_token=12, depth=3, top_k=4, max_len=512, dtype=jnp.float32,
    )
    assert model.tcfg.num_key_value_heads == KV
    assert model.dcfg.fc_bias

    prompt = list(range(10, 40))
    res = model.specgenerate(prompt, max_new_tokens=15)
    ar = model.ar_generate(prompt, max_new_tokens=15)
    n = min(res.new_tokens, ar.new_tokens, 15)
    assert n >= 5
    assert res.sequences[: len(prompt) + n].tolist() == \
        ar.sequences[: len(prompt) + n].tolist()

    # eagle method on the same files (ignores vision weights)
    eagle = SpecModel.from_pretrained(
        base_model_path=tdir, spec_model_path=ddir, method="eagle",
        total_token=12, depth=3, top_k=4, max_len=512, dtype=jnp.float32,
    )
    res_e = eagle.specgenerate(prompt, max_new_tokens=10)
    assert res_e.new_tokens >= 5

    # one-line sharded loading: mesh kwarg => shard_over() before returning;
    # generation must match the unsharded load token for token
    from vispec_tpu.parallel.mesh import make_mesh

    sharded = SpecModel.from_pretrained(
        base_model_path=tdir, spec_model_path=ddir,
        total_token=12, depth=3, top_k=4, max_len=512, dtype=jnp.float32,
        mesh=make_mesh(dp=1, tp=2, devices=jax.devices()[:2]),
    )
    res_s = sharded.specgenerate(prompt, max_new_tokens=15)
    n = min(res.new_tokens, res_s.new_tokens, 15)
    assert n >= 5
    assert res_s.sequences[: len(prompt) + n].tolist() == \
        res.sequences[: len(prompt) + n].tolist()


def test_draft_without_embed_falls_back_to_target(tmp_path):
    """Reference-format draft checkpoints may omit the frozen embedding — the
    reference copies it from the base model (spec_model_ours.py:60-63)."""
    from safetensors.numpy import load_file, save_file

    from vispec_tpu.spec.spec_model import SpecModel

    tdir, ddir = str(tmp_path / "target"), str(tmp_path / "draft")
    write_llama_ckpt(tdir)
    write_draft_ckpt(ddir)
    path = os.path.join(ddir, "model.safetensors")
    sd = load_file(path)
    del sd["embed_tokens.weight"]
    save_file(sd, path)

    model = SpecModel.from_pretrained(
        base_model_path=tdir, spec_model_path=ddir,
        total_token=12, depth=3, top_k=4, max_len=512, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(model.dparams["embed"]), np.asarray(model.tparams["embed"])
    )
    res = model.specgenerate(list(range(10, 40)), max_new_tokens=8)
    assert res.new_tokens >= 4


def test_total_token_autotune(tmp_path):
    """total_token == -1 must wire through to autotune_total_token
    (reference spec_model_ours.py:179-202)."""
    from vispec_tpu.spec.spec_model import SpecModel

    tdir, ddir = str(tmp_path / "target"), str(tmp_path / "draft")
    write_llama_ckpt(tdir)
    write_draft_ckpt(ddir)
    model = SpecModel.from_pretrained(
        base_model_path=tdir, spec_model_path=ddir,
        total_token=-1, depth=3, top_k=8, max_len=512, dtype=jnp.float32,
    )
    assert model.spec.total_tokens in (40, 48, 50, 56, 60)
    res = model.specgenerate(list(range(10, 40)), max_new_tokens=8)
    assert res.new_tokens >= 4
