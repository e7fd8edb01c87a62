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


def test_batch_of_one_matches_single():
    """B=1 takes the squeezed no-vmap path (batch.py: vmap's degenerate unit
    batch makes XLA:TPU relayout the stacked qkv weights — 3 GB of HLO-temp
    copies at 7B, a compile OOM) and must still match specgenerate exactly."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    prompt = list(range(20, 50))
    outs = batch_mod.generate_batch(
        tparams, dparams, TCFG, DCFG, SPEC, [prompt],
        max_new_tokens=15, max_len=256, eos_id=99999, dtype=jnp.float32,
    )
    model = SpecModel(TCFG, DCFG, SPEC, tparams, dparams, max_len=256,
                      dtype=jnp.float32, eos_token_id=99999)
    ref = model.specgenerate(prompt, max_new_tokens=15)
    n = min(len(outs[0]), ref.new_tokens, 15)
    assert n >= 10
    assert outs[0][:n].tolist() == \
        ref.sequences[len(prompt):len(prompt) + n].tolist()


def test_specgenerate_batch_api():
    """SpecModel.specgenerate_batch: chunked batched rounds + cache-pool reuse
    must match single-request specgenerate per request."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    model = SpecModel(TCFG, DCFG, SPEC, tparams, dparams, max_len=256,
                      dtype=jnp.float32, eos_token_id=99999)
    prompts = [list(range(20, 50)), list(range(60, 85))]
    results = model.specgenerate_batch(
        [{"input_ids": p} for p in prompts], max_new_tokens=15)
    assert len(model._batch_pool) == 2
    for prompt, res in zip(prompts, results):
        ref = model.specgenerate(prompt, max_new_tokens=15)
        n = min(res.new_tokens, ref.new_tokens, 15)
        assert n >= 10
        assert res.sequences[: len(prompt) + n].tolist() == \
            ref.sequences[: len(prompt) + n].tolist()
        assert res.acceptance_lengths  # tau bookkeeping present
    # second call reuses the pooled caches (no growth)
    results2 = model.specgenerate_batch(
        [{"input_ids": p} for p in prompts], max_new_tokens=8)
    assert len(model._batch_pool) == 2
    assert results2[0].new_tokens >= 5


def test_medusa_batched_and_serving_match_single():
    """Medusa in the batched AND continuous-batching paths (previously
    NotImplementedError surfaces): per-request outputs must equal
    single-request medusa specgenerate."""
    from vispec_tpu.models import medusa as medusa_mod

    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    mparams = medusa_mod.init_params(TCFG.hidden_size, k2, jnp.float32)
    mparams = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(k2, x.shape, x.dtype), mparams
    )
    model = SpecModel(TCFG, DCFG, SpecConfig(total_tokens=12, depth=3, top_k=4),
                      tparams, dparams, max_len=256, dtype=jnp.float32,
                      eos_token_id=99999, mparams=mparams)
    prompts = [list(range(20, 50)), list(range(60, 85)), list(range(5, 40))]
    refs = [model.specgenerate(p, max_new_tokens=12) for p in prompts]

    results = model.specgenerate_batch(
        [{"input_ids": p} for p in prompts], max_new_tokens=12)
    for ref, res, p in zip(refs, results, prompts):
        n = min(res.new_tokens, ref.new_tokens, 12)
        assert n >= 6
        assert res.sequences[: len(p) + n].tolist() == \
            ref.sequences[: len(p) + n].tolist()

    eng = model.serving_engine(batch_size=2, max_new_tokens=12, chunk_rounds=4)
    outs = eng.run_all(prompts)
    ok = 0
    for ref, p, o in zip(refs, prompts, outs):
        ref_new = list(ref.sequences[len(p):])
        n = min(len(o), len(ref_new))
        ok += list(o[:n]) == ref_new[:n]
    assert ok == 3


def test_specgenerate_batch_vision(tmp_path):
    """Batched VISION requests match single-request output (VERDICT item 9)."""
    import pytest

    pytest.importorskip("safetensors.numpy")
    from tests.vlm_fixtures import IMAGE_TOKEN, write_llava_ckpt, write_vision_draft_ckpt

    tdir, ddir = str(tmp_path / "t"), str(tmp_path / "d")
    write_llava_ckpt(tdir, anyres=True)
    write_vision_draft_ckpt(ddir)
    model = SpecModel.from_pretrained(
        tdir, ddir, total_token=12, depth=3, top_k=4, max_len=512,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 1, (40, 40, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 1, (40, 40, 3)).astype(np.float32))
    n = model.count_image_tokens((40, 40))
    ids1 = list(range(10, 20)) + [IMAGE_TOKEN] * n + list(range(30, 45))
    ids2 = list(range(50, 58)) + [IMAGE_TOKEN] * n + list(range(60, 80))
    reqs = [
        {"input_ids": ids1, "pixel_values": img1, "image_size": (40, 40)},
        {"input_ids": ids2, "pixel_values": img2, "image_size": (40, 40)},
    ]
    results = model.specgenerate_batch(reqs, max_new_tokens=10)
    for req, res in zip(reqs, results):
        ref = model.specgenerate(req["input_ids"], max_new_tokens=10,
                                 pixel_values=req["pixel_values"],
                                 image_size=req["image_size"])
        m = min(res.new_tokens, ref.new_tokens, 10)
        assert m >= 5
        assert res.sequences[: len(req["input_ids"]) + m].tolist() == \
            ref.sequences[: len(req["input_ids"]) + m].tolist()


def test_batched_topk1_sampling_equals_greedy():
    """T>0 with top_k=1 is mathematically greedy (the warper one-hots the
    target distribution, so rejection acceptance reduces to argmax matching):
    the batched SAMPLING graph must produce the greedy outputs exactly.
    Covers the batched T>0 path end-to-end (reference T=1 benchmark rows run
    through the single-request equivalent of this graph)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    prompts = [list(range(20, 50)), list(range(60, 85))]
    greedy = batch_mod.generate_batch(
        tparams, dparams, TCFG, DCFG, SPEC, prompts,
        max_new_tokens=12, max_len=256, eos_id=99999, dtype=jnp.float32,
    )
    sampled = batch_mod.generate_batch(
        tparams, dparams, TCFG, DCFG, SPEC, prompts,
        max_new_tokens=12, max_len=256, eos_id=99999, dtype=jnp.float32,
        temperature=0.7, top_k=1, seed=3,
    )
    for g, s in zip(greedy, sampled):
        n = min(len(g), len(s))
        assert n >= 8
        np.testing.assert_array_equal(s[:n], g[:n])


def test_bench_batch_cli_quant_flags(monkeypatch):
    """bench_batch CLI composes the engine with int8 draft+target+KV (the
    config behind the SCALING.md serving sweep) — smoke on a toy model."""
    import sys

    from vispec_tpu.evaluation import bench_batch

    monkeypatch.setitem(bench_batch.MODELS, "toy", dict(
        num_hidden_layers=2, hidden_size=128, intermediate_size=256,
        num_attention_heads=4, num_key_value_heads=2))
    monkeypatch.setattr(sys, "argv", [
        "bench_batch", "--model", "toy", "--sizes", "2", "--max-len", "256",
        "--new-tokens", "8", "--engine", "--int8", "--int8-target",
        "--int8-kv"])
    rows = bench_batch.main()
    assert rows[0]["mode"] == "engine+int8+int8t+int8kv"
    assert rows[0]["tokens_per_s"] > 0 and rows[0]["tokens"] > 0


def test_arrival_bench_contract():
    """Seeded Poisson arrival benchmark (bench_batch.arrival_bench): runs
    through the online submit/step API, completes every request, and reports
    the latency/throughput/stall fields the README table is built from."""
    from vispec_tpu.evaluation.bench_batch import arrival_bench

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    model = SpecModel(TCFG, DCFG, SPEC, tparams, dparams, max_len=512,
                      dtype=jnp.float32, eos_token_id=99999)
    row = arrival_bench(model, b=2, new_tokens=8, rate=50.0, n_requests=5,
                        seed=3, vocab=TCFG.vocab_size)
    assert row["n_requests"] == 5 and row["batch"] == 2
    for key in ("tokens_per_s", "latency_p50_s", "latency_p99_s",
                "latency_mean_s", "admit_stall_share", "wall_s"):
        assert key in row, key
    assert row["tokens_per_s"] > 0
    assert 0 <= row["latency_p50_s"] <= row["latency_p99_s"]
    assert 0 <= row["admit_stall_share"] < 1
    assert row["admissions"] >= 1  # 5 requests on 2 slots => mid-flight admits

    # --no-ladder A/B control (round-4 behavior: full-chunk dispatches only)
    # completes the same workload through the same contract.
    row2 = arrival_bench(model, b=2, new_tokens=8, rate=50.0, n_requests=5,
                         seed=3, vocab=TCFG.vocab_size, no_ladder=True)
    assert row2["n_requests"] == 5 and row2["tokens_per_s"] > 0


def test_pick_chunk_rounds_ladder():
    """Chunk ladder selection (spec/batch.pick_chunk_rounds): the largest
    static ladder value not expected to overshoot any LIVE slot's remaining
    budget; dead slots are ignored; tpr floors at 1 so the estimate never
    exceeds the cap-driven truth."""
    import numpy as np

    from vispec_tpu.spec.batch import pick_chunk_rounds

    live = np.array([True, True])
    # fresh slots (no rounds yet): horizon = remaining budget
    assert pick_chunk_rounds(8, np.zeros(2), np.zeros(2),
                             np.array([24, 24]), live) == 8
    assert pick_chunk_rounds(8, np.zeros(2), np.zeros(2),
                             np.array([3, 24]), live) == 2
    assert pick_chunk_rounds(8, np.zeros(2), np.zeros(2),
                             np.array([1, 24]), live) == 1
    # a fast slot (4 tokens/round) with 8 left finishes in ~2 rounds
    assert pick_chunk_rounds(8, np.array([16, 0]), np.array([4, 0]),
                             np.array([24, 24]), live) == 2
    # dead slots don't constrain the chunk
    assert pick_chunk_rounds(8, np.array([3, 0]), np.array([4, 0]),
                             np.array([4, 24]), np.array([False, True])) == 8
    # the floor is the smallest ladder rung
    assert pick_chunk_rounds(8, np.array([23, 0]), np.array([6, 0]),
                             np.array([24, 24]), live) == 1
    # max_chunk below the ladder degenerates gracefully
    assert pick_chunk_rounds(2, np.zeros(1), np.zeros(1),
                             np.array([24]), np.array([True])) == 2
