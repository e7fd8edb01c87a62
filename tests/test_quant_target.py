"""int8 TARGET quantization (`SpecModel.quantize_target_inplace`,
ops/quant.quantize_target_params): an opt-in serving mode with no reference
counterpart — the reference's verifier always runs fp16/bf16.

The invariant that must survive: speculative decoding is exactly lossless
*relative to whatever target verifies* — spec output == AR output on the same
int8 weights (the acceptance rule compares against the target's own argmax,
reference utils.py:415-493; which target that is doesn't matter).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops.quant import QTensor, quantize_q8, quantize_target_params
from vispec_tpu.spec.spec_model import SpecModel

T = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=512)
D = DraftConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512)


def _model(**kw):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(T, k1, jnp.float32)
    dparams = draft_mod.init_params(D, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    return SpecModel(T, D, SpecConfig(total_tokens=12, depth=3, top_k=4),
                     tparams, dparams, max_len=512, dtype=jnp.float32,
                     eos_token_id=10**6, **kw)


def test_stacked_q8_slices_match_per_layer():
    """A scan-stacked [L, in, out] QTensor must equal quantizing each layer's
    2-D matrix independently (that's what each lax.scan slice sees)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 32, 48)) * 0.02, jnp.float32)
    stacked = quantize_q8(w)
    assert stacked.q.shape == (3, 32, 48) and stacked.s.shape == (3, 48)
    for i in range(3):
        per = quantize_q8(w[i])
        np.testing.assert_array_equal(np.asarray(stacked.q[i]),
                                      np.asarray(per.q))
        np.testing.assert_allclose(np.asarray(stacked.s[i]),
                                   np.asarray(per.s))


def test_quantize_target_params_layout():
    tparams = llama.init_params(T, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_target_params(tparams)
    for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        assert isinstance(qp["layers"][k], QTensor), k
        assert qp["layers"][k].q.dtype == jnp.int8
    assert isinstance(qp["lm_head"], QTensor)
    # embed / norms untouched (and the originals not mutated)
    assert qp["embed"] is tparams["embed"]
    assert qp["layers"]["input_norm"] is tparams["layers"]["input_norm"]
    assert not isinstance(tparams["layers"]["wq"], QTensor)


def test_spec_equals_ar_on_quantized_target():
    """The core guarantee: both loops run the SAME int8 weights, so greedy
    spec output must match greedy AR output token for token."""
    model = _model()
    model.quantize_target_inplace()
    assert model.quantize_target == "int8"
    prompt = list(range(20, 52))
    spec = model.specgenerate(prompt, max_new_tokens=24)
    ar = model.ar_generate(prompt, max_new_tokens=24)
    n = min(spec.new_tokens, ar.new_tokens)
    assert n >= 8
    assert spec.sequences.tolist()[:len(prompt) + n] == \
        ar.sequences.tolist()[:len(prompt) + n]


def test_quantized_target_changes_outputs_plausibly():
    """int8 is lossy vs bf16 — outputs may differ from the full-precision
    model, but the quantized forward must stay close (per-channel int8:
    logits within ~1% of full precision on a tiny model)."""
    model = _model()
    prompt = list(range(30, 60))
    ids = jnp.asarray(prompt, jnp.int32)
    embeds = llama.embed(model.tparams, ids)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)
    from vispec_tpu.ops import kv_cache as kvm
    cache = kvm.init_cache(T.num_hidden_layers, T.num_key_value_heads, 128,
                           T.head_dim, jnp.float32)
    mask = (jnp.arange(128) <= jnp.arange(len(prompt))[:, None])
    h_bf, _ = llama.forward_hidden(model.tparams, T, embeds, pos, cache, mask)
    logits_bf = llama.lm_head(model.tparams, h_bf[-1])
    model.quantize_target_inplace()
    h_q, _ = llama.forward_hidden(model.tparams, T, embeds, pos, cache, mask)
    logits_q = llama.lm_head(model.tparams, h_q[-1])
    denom = float(jnp.abs(logits_bf).max())
    rel = float(jnp.abs(logits_q - logits_bf).max()) / max(denom, 1e-6)
    assert rel < 0.05, rel


def test_compose_with_quantized_draft_after():
    """Draft quantized AFTER the target ranks with the target's own int8 head
    (no duplicate lm_head copy) and spec==AR still holds exactly."""
    model = _model()
    model.quantize_target_inplace()
    model.quantize_draft_inplace("int8")
    assert model.dparams["rank_head"] is model.tparams["lm_head"]
    prompt = list(range(40, 70))
    spec = model.specgenerate(prompt, max_new_tokens=16)
    ar = model.ar_generate(prompt, max_new_tokens=16)
    n = min(spec.new_tokens, ar.new_tokens)
    assert n >= 8
    assert spec.sequences.tolist()[:len(prompt) + n] == \
        ar.sequences.tolist()[:len(prompt) + n]


def test_compose_with_quantized_draft_before():
    """Draft quantized BEFORE the target keeps its own rank_head copy; the
    verify/AR sides quantize independently and spec==AR still holds."""
    model = _model(quantize_draft="int8")
    model.quantize_target_inplace()
    prompt = list(range(10, 44))
    spec = model.specgenerate(prompt, max_new_tokens=16)
    ar = model.ar_generate(prompt, max_new_tokens=16)
    n = min(spec.new_tokens, ar.new_tokens)
    assert n >= 8
    assert spec.sequences.tolist()[:len(prompt) + n] == \
        ar.sequences.tolist()[:len(prompt) + n]


def test_serving_engine_on_quantized_target():
    model = _model()
    model.quantize_target_inplace()
    rng = np.random.default_rng(3)
    prompts = [rng.integers(5, 120, rng.integers(8, 20)).tolist()
               for _ in range(4)]
    singles = [model.specgenerate(p, max_new_tokens=12).sequences.tolist()
               for p in prompts]
    eng = model.serving_engine(batch_size=2, max_new_tokens=12)
    outs = eng.run_all(prompts)
    for p, s, o in zip(prompts, singles, outs):
        # the single-request loop may overshoot max_new by the last round's
        # accepted tokens; the engine trims to exactly max_new
        assert len(o) == 12
        assert s[len(p):len(p) + len(o)] == list(o)


def test_mixtral_target_rejected():
    import pytest

    tparams = llama.init_params(T, jax.random.PRNGKey(0), jnp.float32)
    tparams = dict(tparams)
    tparams["layers"] = dict(tparams["layers"], router=jnp.zeros((2, 64, 4)))
    with pytest.raises(NotImplementedError):
        quantize_target_params(tparams)
