"""End-to-end speculative decoding tests on tiny random models.

The key oracle (SURVEY.md section 4): at temperature 0 the speculative decode
output must be *identical* to plain autoregressive greedy decoding of the same
target — losslessness is implied by evaluate_posterior's argmax matching
(reference vispec/model/utils.py:438-451).  This holds for ANY draft weights,
so random inits exercise the full loop without trained checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.spec import loop as spec_loop

TCFG = LlamaConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
)
DCFG = DraftConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    num_q=2,
)
SPEC = SpecConfig(total_tokens=12, depth=3, top_k=4)
MAX_LEN = 256
DTYPE = jnp.float32  # exact argmax comparisons need f32 on CPU


def make_models(seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    tparams = llama.init_params(TCFG, k1, DTYPE)
    dparams = draft_mod.init_params(DCFG, k2, DTYPE)
    dparams["embed"] = tparams["embed"]  # draft reuses target embeddings
    return tparams, dparams


def ar_generate(tparams, prompt, max_new, pad_len=64):
    """Greedy AR decode via the same llama module (the T=0 oracle)."""
    cache = kv.init_cache(
        TCFG.num_hidden_layers, TCFG.num_key_value_heads, MAX_LEN, TCFG.head_dim, DTYPE
    )
    sampling = spec_loop.SamplingParams()
    embeds = llama.embed(tparams, jnp.asarray(prompt, jnp.int32))
    embeds = jnp.pad(embeds, ((0, pad_len - len(prompt)), (0, 0)))
    key = jax.random.PRNGKey(0)
    tok, cache, key, _ = spec_loop.ar_prefill(
        tparams, TCFG, sampling, embeds, jnp.asarray(len(prompt), jnp.int32), cache, key
    )
    out = [int(tok)]
    for _ in range(max_new - 1):
        tok, cache, key, _ = spec_loop.ar_step(tparams, TCFG, sampling, tok, cache, key)
        out.append(int(tok))
    return out


def spec_generate(tparams, dparams, prompt, max_new, image_mask=None, pad_len=64,
                  temperature=0.0, seed=0):
    target_cache = kv.init_cache(
        TCFG.num_hidden_layers, TCFG.num_key_value_heads, MAX_LEN, TCFG.head_dim, DTYPE
    )
    draft_cache = kv.init_cache(1, DCFG.num_key_value_heads, MAX_LEN, DCFG.head_dim, DTYPE)
    sampling = spec_loop.SamplingParams(temperature=temperature)
    plan, max_span = draft_mod.make_prefill_plan(
        image_mask, len(prompt), DCFG.num_q, pad_len, max_images=2, max_span=8
    )
    embeds = llama.embed(tparams, jnp.asarray(prompt, jnp.int32))
    embeds = jnp.pad(embeds, ((0, pad_len - len(prompt)), (0, 0)))
    max_out = max_new + 2 * (SPEC.depth + 2)
    state = spec_loop.spec_prefill(
        tparams, dparams, TCFG, DCFG, SPEC, plan, sampling, embeds,
        target_cache, draft_cache, jax.random.PRNGKey(seed), max_out, max_span,
    )
    accept_lengths = []
    for _ in range(max_new):  # hard bound; loop exits on done
        prev = int(state.new_token)
        state = spec_loop.decode_round(
            tparams, dparams, TCFG, DCFG, SPEC, sampling, state,
            np.int32(999999), np.int32(max_new),
        )
        accept_lengths.append(int(state.new_token) - prev - 1)
        if bool(state.done):
            break
    out_len = int(state.out_len)
    return np.asarray(state.output)[:out_len].tolist(), accept_lengths


def test_greedy_losslessness_text_only():
    tparams, dparams = make_models()
    prompt = list(range(10, 30))
    max_new = 40
    ar = ar_generate(tparams, prompt, max_new)
    spec, accs = spec_generate(tparams, dparams, prompt, max_new)
    n = min(len(ar), len(spec), max_new)
    assert n >= 10
    assert spec[:n] == ar[:n], f"spec {spec[:n]} != ar {ar[:n]} (accepts {accs})"


def test_greedy_losslessness_with_image_spans():
    """Image-mask path: the draft compresses the 'image' span; target output
    must still match AR exactly (the draft only proposes, never decides)."""
    tparams, dparams = make_models(seed=3)
    prompt = list(range(5)) + [7] * 9 + list(range(40, 52))  # 9-token image span
    image_mask = np.zeros(len(prompt), bool)
    image_mask[5:14] = True
    shifted_mask = image_mask[1:]
    max_new = 30
    ar = ar_generate(tparams, prompt, max_new)
    spec, _ = spec_generate(tparams, dparams, prompt, max_new, image_mask=shifted_mask)
    n = min(len(ar), len(spec), max_new)
    assert spec[:n] == ar[:n]


def test_acceptance_nonnegative_and_bounded():
    tparams, dparams = make_models(seed=1)
    prompt = list(range(50, 70))
    _, accs = spec_generate(tparams, dparams, prompt, 30)
    assert all(0 <= a <= SPEC.depth + 1 for a in accs)


def test_sampling_path_runs():
    """T>0 path: output must be plausible tokens and rounds must advance."""
    tparams, dparams = make_models(seed=2)
    prompt = list(range(10, 25))
    out, accs = spec_generate(tparams, dparams, prompt, 20, temperature=0.9, seed=7)
    assert len(out) >= 20
    assert all(0 <= t < TCFG.vocab_size for t in out)
    assert all(0 <= a <= SPEC.depth + 1 for a in accs)
