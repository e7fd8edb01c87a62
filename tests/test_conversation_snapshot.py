"""Post-generation ConversationSnapshot: turn k+1 of a conversation continues
from turn k's committed KV instead of re-prefilling the whole history
(VERDICT r2 weak #6 / next #8 — the reference re-prefills every turn,
gen_spec_answer_vicuna.py:160-275).  Continuation output must equal the full
re-prefill path."""

import jax
import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.spec.spec_model import SpecModel

T = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=512)
D = DraftConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512)


def _model(eos=10**6):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(T, k1, jnp.float32)
    dparams = draft_mod.init_params(D, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    return SpecModel(T, D, SpecConfig(total_tokens=12, depth=3, top_k=4),
                     tparams, dparams, max_len=512, dtype=jnp.float32,
                     eos_token_id=eos)


def test_snapshot_continuation_matches_full_prefill():
    model = _model()
    prompt1 = list(range(20, 50))
    r1 = model.specgenerate(prompt1, max_new_tokens=16, keep_hiddens=True)
    snap = model.last_snapshot
    assert snap is not None
    assert snap.prompt_len == len(prompt1)
    np.testing.assert_array_equal(snap.seq, r1.sequences)

    # turn 2: conversation so far + new user tokens
    prompt2 = list(r1.sequences) + list(range(60, 75))
    full = model.specgenerate(prompt2, max_new_tokens=16)
    cont = model.specgenerate(prompt2, max_new_tokens=16, continue_from=snap)
    assert cont.new_tokens >= 8
    assert cont.sequences.tolist() == full.sequences.tolist()


def test_snapshot_cut_partial_overlap():
    """The cut can land mid-output: a prompt that extends only PART of the
    committed sequence reuses exactly the matching prefix."""
    model = _model()
    prompt1 = list(range(30, 60))
    r1 = model.specgenerate(prompt1, max_new_tokens=16, keep_hiddens=True)
    snap = model.last_snapshot
    keep = len(prompt1) + 6  # reuse prompt + 6 generated tokens
    prompt2 = list(r1.sequences[:keep]) + [99, 101, 103]
    assert snap.cut_for(np.asarray(prompt2)) == keep
    full = model.specgenerate(prompt2, max_new_tokens=12)
    cont = model.specgenerate(prompt2, max_new_tokens=12, continue_from=snap)
    assert cont.sequences.tolist() == full.sequences.tolist()


def test_snapshot_cut_rejects_non_extension():
    model = _model()
    prompt1 = list(range(20, 40))
    model.specgenerate(prompt1, max_new_tokens=8, keep_hiddens=True)
    snap = model.last_snapshot
    # divergence inside the original prompt => no reusable cut
    other = [1, 2, 3] + list(range(23, 40))
    assert snap.cut_for(np.asarray(other)) is None
    # prompt identical to the committed sequence: cut at len-1 (>= 1 suffix
    # token is always left for the continuation prefill)
    assert snap.cut_for(snap.seq) == len(snap.seq) - 1
    # falls back to a full prefill without error
    res = model.specgenerate(other, max_new_tokens=8, continue_from=snap)
    ref = model.specgenerate(other, max_new_tokens=8)
    assert res.sequences.tolist() == ref.sequences.tolist()


def test_snapshot_continuation_with_repetition_penalty():
    """Prefix caching composes with the repetition penalty: the seen mask is
    built from the FULL conversation ids host-side and rides into
    spec_prefill_continue, so continue_from must NOT silently fall back (and
    must sample identically to the full-prefill path at the same seed)."""
    model = _model()
    prompt1 = list(range(20, 50))
    r1 = model.specgenerate(prompt1, max_new_tokens=12, keep_hiddens=True,
                            temperature=0.8, seed=5, repetition_penalty=1.4)
    snap = model.last_snapshot
    assert snap is not None
    prompt2 = list(r1.sequences) + list(range(60, 72))
    full = model.specgenerate(prompt2, max_new_tokens=12, temperature=0.8,
                              seed=7, repetition_penalty=1.4)
    cont = model.specgenerate(prompt2, max_new_tokens=12, temperature=0.8,
                              seed=7, repetition_penalty=1.4,
                              continue_from=snap)
    assert cont.new_tokens >= 4
    assert cont.sequences.tolist() == full.sequences.tolist()


def test_snapshot_continuation_overflow_falls_back():
    """A continuation whose suffix block would not fit (plen + bucketed
    suffix + slack > max_len) must fall back to the full prefill path instead
    of letting XLA's clamped dynamic_update_slice overwrite committed prefix
    KV rows near a full cache — output must equal the full-prefill result."""
    model = _model()
    prompt1 = list(range(20, 20 + 300))
    r1 = model.specgenerate(prompt1, max_new_tokens=8, keep_hiddens=True)
    snap = model.last_snapshot
    # suffix bucketed to 256 rows at plen~308 overflows max_len=512; the
    # whole prompt (~480) still fits a full prefill
    prompt2 = list(r1.sequences) + [5] * 170
    full = model.specgenerate(prompt2, max_new_tokens=4)
    cont = model.specgenerate(prompt2, max_new_tokens=4, continue_from=snap)
    assert cont.sequences.tolist() == full.sequences.tolist()


def test_snapshot_chains_across_turns():
    """Turn 3 continues from turn 2's snapshot (which itself continued from
    turn 1): keep_hiddens composes with continue_from."""
    model = _model()
    p1 = list(range(10, 34))
    r1 = model.specgenerate(p1, max_new_tokens=10, keep_hiddens=True)
    s1 = model.last_snapshot
    p2 = list(r1.sequences) + list(range(40, 52))
    r2 = model.specgenerate(p2, max_new_tokens=10, keep_hiddens=True,
                            continue_from=s1)
    s2 = model.last_snapshot
    assert s2 is not None and s2.prompt_len == len(p2)
    p3 = list(r2.sequences) + list(range(70, 80))
    full = model.specgenerate(p3, max_new_tokens=10)
    cont = model.specgenerate(p3, max_new_tokens=10, continue_from=s2)
    assert cont.sequences.tolist() == full.sequences.tolist()


def test_multiturn_harness_prefix_cache_equivalent(tmp_path):
    """run_eval(prefix_cache=True) produces the same answers as the default
    full-reprefill path on a composing fake tokenizer."""
    from vispec_tpu.evaluation.harness import Question, run_eval

    model = _model()

    class Tok:
        special_tokens_map = {}

        def __call__(self, text):
            class R:
                pass

            r = R()
            # per-char ids offset into vocab: prefix-composing by construction
            r.input_ids = [10 + (ord(c) % 100) for c in text]
            return r

        def decode(self, ids, **kw):
            return "".join(chr(65 + (int(t) % 26)) for t in ids)

    qs = [Question(question_id=1, prompt_inputs={},
                   turns=["hello there", "again more"])]
    rec_full = run_eval(model, qs, str(tmp_path / "a.jsonl"), tokenizer=Tok(),
                        max_new_tokens=8, num_warmup=0)
    rec_snap = run_eval(model, qs, str(tmp_path / "b.jsonl"), tokenizer=Tok(),
                        max_new_tokens=8, num_warmup=0, prefix_cache=True)
    assert rec_full[0]["turns"] == rec_snap[0]["turns"]


def test_snapshot_continuation_under_tp_mesh():
    """Prefix-cached continuation under tensor parallelism: the snapshot's
    committed KV carries tp shardings into spec_prefill_continue; turn-2
    output must match both the full-prefill path on the SAME sharded model
    and the unsharded model (token identity)."""
    from vispec_tpu.parallel.mesh import make_mesh

    ref_model = _model()
    prompt1 = list(range(20, 50))
    ref1 = ref_model.specgenerate(prompt1, max_new_tokens=12)
    prompt2 = list(ref1.sequences) + list(range(60, 75))
    ref2 = ref_model.specgenerate(prompt2, max_new_tokens=12)

    model = _model()
    model.shard_over(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    r1 = model.specgenerate(prompt1, max_new_tokens=12, keep_hiddens=True)
    np.testing.assert_array_equal(r1.sequences, ref1.sequences)
    snap = model.last_snapshot
    assert snap is not None

    full = model.specgenerate(prompt2, max_new_tokens=12)
    cont = model.specgenerate(prompt2, max_new_tokens=12, continue_from=snap)
    assert cont.new_tokens >= 6
    assert cont.sequences.tolist() == full.sequences.tolist()
    np.testing.assert_array_equal(cont.sequences, ref2.sequences)
