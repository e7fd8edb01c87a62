"""int8 KV cache (`SpecModel(quantize_kv=True)`, ops/kv_cache.quantize_rows):
the long-context serving mode — per-row symmetric int8 K/V with float32
scales, halving KV HBM and the KV bytes every verify/decode round reads.

No reference counterpart (the reference cache is fp16, kv_cache.py:4-166).
The invariant that must survive is the same as target quantization's:
spec output == AR output on the SAME quantized cache — acceptance compares
the target's own argmax against itself, so whatever the attention numerics
are, both loops see them identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kvm
from vispec_tpu.ops import pallas_attention
from vispec_tpu.ops.attention import attend, tree_verify_mask
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


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 2, 17, 8)), jnp.float32)
    q, s = kvm.quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 2, 17)
    deq = kvm.dequantize_rows(q, s)
    # symmetric round-to-nearest: error <= scale/2 per element
    err = np.abs(np.asarray(deq - x))
    bound = np.asarray(s)[..., None] * 0.5 + 1e-7
    assert (err <= bound).all(), float((err - bound).max())
    # zero rows stay exactly zero
    q0, s0 = kvm.quantize_rows(jnp.zeros((4, 8)))
    assert not np.asarray(q0).any() and not np.asarray(
        kvm.dequantize_rows(q0, s0)).any()


def test_init_cache_quantized_layout():
    c = kvm.init_cache(2, 3, 64, 8, quantized=True)
    assert c.k.dtype == jnp.int8 and c.v.dtype == jnp.int8
    assert c.k_scale.shape == (2, 3, 64) and c.k_scale.dtype == jnp.float32
    plain = kvm.init_cache(2, 3, 64, 8)
    assert plain.k_scale is None and plain.v_scale is None


@pytest.mark.parametrize("hkv,groups,s,start", [(2, 1, 8, 100), (2, 2, 8, 500)])
def test_kernel_int8_matches_dequant_reference(hkv, groups, s, start):
    """The Pallas kernel on int8 tiles + per-row scales must match the XLA
    reference over the explicitly dequantized cache (same f32 math)."""
    h = hkv * groups
    d = 128
    max_len = 1024
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((h, s, d)), jnp.float32)
    k8, ks = kvm.quantize_rows(
        jnp.asarray(rng.standard_normal((hkv, max_len, d)), jnp.float32))
    v8, vs = kvm.quantize_rows(
        jnp.asarray(rng.standard_normal((hkv, max_len, d)), jnp.float32))
    tm = np.tril(rng.uniform(size=(s, s)) < 0.5)
    np.fill_diagonal(tm, True)
    tm[:, 0] = True
    tree_mask = jnp.asarray(tm)
    tree_start = jnp.asarray(start, jnp.int32)

    ref_mask = tree_verify_mask(tree_mask, tree_start, max_len)
    ref = attend(q, kvm.dequantize_rows(k8, ks),
                 kvm.dequantize_rows(v8, vs), ref_mask)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_attention.verify_attention(
            q, k8, v8, tree_start, tree_mask, block=256,
            k_scale=ks, v_scale=vs,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_commit_from_blocks_requantizes_identically():
    """Accepted rows committed from the bf16 verify blocks must land in the
    cache bit-identical to a direct append of the same rows."""
    rng = np.random.default_rng(2)
    blocks_k = jnp.asarray(rng.standard_normal((2, 2, 6, 8)), jnp.float32)
    blocks_v = jnp.asarray(rng.standard_normal((2, 2, 6, 8)), jnp.float32)
    cache = kvm.init_cache(2, 2, 64, 8, quantized=True)
    cache = cache._replace(length=jnp.asarray(10, jnp.int32),
                           real_length=jnp.asarray(10, jnp.int32))
    nodes = jnp.asarray([0, 2, 5, 5], jnp.int32)
    out = kvm.commit_from_blocks(cache, jnp.asarray(10, jnp.int32),
                                 blocks_k, blocks_v, nodes,
                                 jnp.asarray(3, jnp.int32))
    qk, sk = kvm.quantize_rows(jnp.take(blocks_k, nodes, axis=2))
    np.testing.assert_array_equal(np.asarray(out.k[:, :, 10:14]),
                                  np.asarray(qk))
    np.testing.assert_allclose(np.asarray(out.k_scale[:, :, 10:14]),
                               np.asarray(sk))
    assert int(out.length) == 13


def test_spec_equals_ar_on_quantized_kv():
    """The core guarantee: both loops attend through the SAME int8 cache, so
    greedy spec output must match greedy AR output token for token."""
    model = _model(quantize_kv=True)
    assert model.target_cache.k.dtype == jnp.int8
    prompt = list(range(20, 52))
    spec = model.specgenerate(prompt, max_new_tokens=24)
    ar = model.ar_generate(prompt, max_new_tokens=24)
    n = min(spec.new_tokens, ar.new_tokens)
    assert n >= 8
    assert spec.sequences.tolist()[:len(prompt) + n] == \
        ar.sequences.tolist()[:len(prompt) + n]


def test_quantized_kv_outputs_close_to_full_precision():
    """int8 KV is lossy but per-row scaling keeps attention outputs close on
    a tiny model."""
    prompt = list(range(30, 60))
    full = _model().specgenerate(prompt, max_new_tokens=8)
    quant = _model(quantize_kv=True).specgenerate(prompt, max_new_tokens=8)
    assert quant.new_tokens >= 4 and full.new_tokens >= 4
    # no exactness claim across modes — just that decoding works end to end
    assert quant.sequences[:len(prompt)].tolist() == \
        full.sequences[:len(prompt)].tolist()


def test_compose_all_three_quant_modes():
    """int8 target weights + int8 draft + int8 KV together: the full serving
    stack, still exactly spec == AR."""
    model = _model(quantize_kv=True)
    model.quantize_target_inplace()
    model.quantize_draft_inplace("int8")
    prompt = list(range(40, 70))
    spec = model.specgenerate(prompt, max_new_tokens=16)
    ar = model.ar_generate(prompt, max_new_tokens=16)
    n = min(spec.new_tokens, ar.new_tokens)
    assert n >= 8
    assert spec.sequences.tolist()[:len(prompt) + n] == \
        ar.sequences.tolist()[:len(prompt) + n]


def test_medusa_quantized_kv_losslessness():
    """Medusa drafting over an int8 target cache: spec == AR exactly (the
    heads propose from the target's hidden; both loops attend through the
    same quantized cache)."""
    from vispec_tpu.models import medusa as medusa_mod

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    tparams = llama.init_params(T, k1, jnp.float32)
    dparams = draft_mod.init_params(D, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    mparams = medusa_mod.init_params(T.hidden_size, k3, jnp.float32)
    mparams = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(k3, x.shape, x.dtype), mparams)
    model = SpecModel(T, D, SpecConfig(total_tokens=12, depth=3, top_k=4),
                      tparams, dparams, max_len=512, dtype=jnp.float32,
                      eos_token_id=10**6, mparams=mparams, quantize_kv=True)
    assert model.target_cache.k.dtype == jnp.int8
    prompt = list(range(25, 55))
    spec = model.specgenerate(prompt, max_new_tokens=16)
    ar = model.ar_generate(prompt, max_new_tokens=16)
    n = min(spec.new_tokens, ar.new_tokens)
    assert n >= 8
    assert spec.sequences.tolist()[:len(prompt) + n] == \
        ar.sequences.tolist()[:len(prompt) + n]


def test_serving_engine_quantized_kv():
    model = _model(quantize_kv=True)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(5, 120, rng.integers(8, 20)).tolist()
               for _ in range(4)]
    singles = [model.specgenerate(p, max_new_tokens=12).sequences.tolist()
               for p in prompts]
    eng = model.serving_engine(batch_size=2, max_new_tokens=12)
    outs = eng.run_all(prompts)
    for p, s, o in zip(prompts, singles, outs):
        assert len(o) == 12
        assert s[len(p):len(p) + len(o)] == list(o)


def test_batched_quantized_kv():
    model = _model(quantize_kv=True)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(5, 120, 12).tolist() for _ in range(2)]
    singles = [model.specgenerate(p, max_new_tokens=10).sequences.tolist()
               for p in prompts]
    outs = model.specgenerate_batch(
        [{"input_ids": p} for p in prompts], max_new_tokens=10)
    for p, s, r in zip(prompts, singles, outs):
        gen = r.sequences[len(p):].tolist()
        assert len(gen) >= 8
        assert s[len(p):len(p) + len(gen)] == gen


def test_snapshot_continuation_quantized_kv():
    """Multi-turn prefix reuse composes with the int8 cache: continuing from
    a ConversationSnapshot equals re-prefilling the full conversation."""
    model = _model(quantize_kv=True)
    turn1 = list(range(20, 40))
    r1 = model.specgenerate(turn1, max_new_tokens=10, keep_hiddens=True)
    snap = model.last_snapshot
    assert snap is not None and snap.t_ks is not None
    turn2 = r1.sequences.tolist() + list(range(60, 70))
    full = model.specgenerate(turn2, max_new_tokens=10)
    cont = model.specgenerate(turn2, max_new_tokens=10, continue_from=snap)
    n = min(full.new_tokens, cont.new_tokens)
    assert n >= 6
    assert full.sequences.tolist()[:len(turn2) + n] == \
        cont.sequences.tolist()[:len(turn2) + n]


def test_mixtral_quantized_kv_losslessness():
    """The MoE target shares the llama append/attend helpers — spec == AR on
    the same int8 cache holds there too."""
    from vispec_tpu.models import mixtral

    from .test_mixtral import DCFG, MCFG

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = mixtral.init_params(MCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    model = SpecModel(
        MCFG, DCFG, SpecConfig(total_tokens=12, depth=3, top_k=4),
        tparams, dparams, max_len=512, dtype=jnp.float32, eos_token_id=999,
        quantize_kv=True,
    )
    assert model.target_cache.k.dtype == jnp.int8
    prompt = list(range(30, 60))
    spec = model.specgenerate(prompt, max_new_tokens=14)
    ar = model.ar_generate(prompt, max_new_tokens=14)
    n = min(spec.new_tokens, ar.new_tokens, 14)
    assert n >= 8
    assert spec.sequences[: len(prompt) + n].tolist() == \
        ar.sequences[: len(prompt) + n].tolist()


def test_tp2_quantized_kv_matches_single_device():
    """int8 KV shards over the tp axis like its rows (kv_cache_specs
    quantized=True): decode under tp=2 is token-identical to single-device."""
    from vispec_tpu.parallel.mesh import make_mesh
    from vispec_tpu.parallel.sharding import (
        apply_specs, draft_param_specs, llama_param_specs, shard_cache,
    )

    from .test_tp_inference import DCFG, TCFG, run_rounds

    assert len(jax.devices()) >= 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    tc = kvm.init_cache(2, 2, 256, 16, jnp.float32, quantized=True)
    dc = kvm.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, dparams, tc, dc)

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with mesh:
        tp_t = apply_specs(mesh, tparams, llama_param_specs(TCFG))
        tp_d = apply_specs(mesh, dparams, draft_param_specs(DCFG))
        tc2 = shard_cache(mesh, kvm.init_cache(2, 2, 256, 16, jnp.float32,
                                               quantized=True))
        dc2 = shard_cache(mesh, kvm.init_cache(1, 2, 256, 16, jnp.float32))
        assert tc2.k.dtype == jnp.int8 and tc2.k_scale is not None
        out = run_rounds(tp_t, tp_d, tc2, dc2)

    n = min(len(ref), len(out))
    assert n >= 8
    np.testing.assert_array_equal(out[:n], ref[:n])


def test_engine_prefix_cache_quantized_kv():
    """The engine's shared-prefix snapshot path carries the int8 rows +
    scales; outputs match the full-prompt single-request loop."""
    model = _model(quantize_kv=True)
    prefix = list(range(20, 52))
    rng = np.random.default_rng(5)
    suffixes = [rng.integers(5, 120, 6).tolist() for _ in range(2)]
    prompts = [prefix + s for s in suffixes]
    singles = [model.specgenerate(p, max_new_tokens=10).sequences.tolist()
               for p in prompts]
    eng = model.serving_engine(batch_size=2, max_new_tokens=10,
                               prefix_ids=prefix)
    outs = eng.run_all(prompts)
    assert eng.stats["admissions"] == 0
    for p, s, o in zip(prompts, singles, outs):
        assert s[len(p):len(p) + len(o)] == list(o)
