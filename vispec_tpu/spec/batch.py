"""Batched multi-request speculative decoding — beyond the reference.

The reference is batch-size-1 everywhere (utils.py:541, kv_cache.py:88).  Since
the whole decode round is a pure function of per-request state (spec/loop.py),
batching is `jax.vmap` over a stacked SpecState: every request carries its own
tree, caches, RNG, and done flag; finished requests keep executing (masked by
``done``) until the batch drains — static shapes, no ragged work.

Serving-path features (parity with the single-request path):
- vision requests: callers pass vision-merged embeds + PrefillPlans (built by
  SpecModel._prompt_embeds — see SpecModel.specgenerate_batch);
- chunked device-side rounds (one host sync per ``n_rounds``, mirroring
  batched_decode_rounds_chunk);
- KV-cache buffer reuse across calls (no per-request init_cache churn).

Memory note: KV caches dominate ([B, L, H, max_len, D]); pick max_len per
serving budget.  Throughput scales with B until HBM bandwidth saturates (the
weights are read once per round for the whole batch — this is the usual
large-batch decode win and the reason batching beats the reference's bs=1
design on chips with spare compute).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..configs import DraftConfig, LlamaConfig, SpecConfig
from ..models import draft as draft_mod
from ..models import llama
from ..ops import kv_cache as kv
from . import loop as spec_loop


def _batched_kernel_ctx(states: spec_loop.SpecState):
    """Attention-kernel scope for the vmapped (B>=2) decode graphs.

    Default: kernel ELIGIBLE — `jax.vmap` over `verify_attention` lowers to
    the hand-batched (B, Hkv)-grid Mosaic kernel via its custom_vmap rule
    (pallas_attention._invoke_fn), ONE launch for the whole batch.  Measured
    on-chip (7B engine run_all, round 4):
    - int8 target+KV+draft @4096 B=2: 73.1 tok/s vs 45.9 XLA (1.59x — the
      XLA fallback dequantizes each layer's full [Hkv, max_len, D] table
      every step; the kernel DMAs only live int8 rows and folds scales);
    - bf16 @1024 B=2: 52.1 vs 52.0 (wash; weights-dominated);
    - vmap's GENERIC pallas batching rule (pre-custom_vmap): 7.6 tok/s at
      the int8 config — 6x WORSE than XLA.  Never remove the custom_vmap
      rule and re-enable the kernel under plain vmap.

    VISPEC_BATCH_KERNEL=0 forces the XLA attention path (escape hatch).
    """
    import os

    from ..ops.attention import no_kernel_scope

    if os.environ.get("VISPEC_BATCH_KERNEL") == "0":
        return no_kernel_scope()
    import contextlib

    return contextlib.nullcontext()


@functools.partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "spec", "sampling"),
    donate_argnames=("states",),
)
def batched_decode_round(
    tparams: dict,
    dparams: dict,
    tcfg: LlamaConfig,
    dcfg: DraftConfig,
    spec: SpecConfig,
    sampling: spec_loop.SamplingParams,
    states: spec_loop.SpecState,  # stacked over a leading batch axis
    eos_id,
    max_new_tokens,  # scalar, or [B] per-request caps
):
    caps = jnp.broadcast_to(jnp.asarray(max_new_tokens, jnp.int32),
                            states.done.shape)

    def one(state, cap):
        # decode_round freezes finished requests internally (latch_done):
        # rounds execute unconditionally and only the cursor/output leaves
        # are selected — a full-tree `where` here would copy the
        # multi-hundred-MB caches per request per round
        return spec_loop.decode_round.__wrapped__(
            tparams, dparams, tcfg, dcfg, spec, sampling, state,
            eos_id, cap,
        )

    if states.done.shape[0] == 1:
        # Unit batch: vmap's degenerate [1, s, D] dots make XLA:TPU relayout
        # the scan-stacked qkv weights (three 1 GB HLO-temp copies at 7B —
        # a compile-time OOM).  Squeeze to the single-request graph instead;
        # this also keeps the Pallas attention kernel eligible.
        out = one(jax.tree.map(lambda x: x[0], states), caps[0])
        return jax.tree.map(lambda x: x[None], out)

    with _batched_kernel_ctx(states):
        return jax.vmap(one)(states, caps)


@functools.partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "spec", "sampling", "n_rounds"),
    donate_argnames=("states",),
)
def batched_decode_rounds_chunk(
    tparams: dict,
    dparams: dict,
    tcfg: LlamaConfig,
    dcfg: DraftConfig,
    spec: SpecConfig,
    sampling: spec_loop.SamplingParams,
    states: spec_loop.SpecState,
    eos_id,
    max_new_tokens,
    n_rounds: int = 8,
):
    """``n_rounds`` batched rounds in one dispatch; the host checks the done
    flags once per chunk (the single-request analog is decode_rounds_chunk).
    ``max_new_tokens`` may be a scalar or a [B] vector of per-request caps
    (serving: each request's own budget ends its slot independently)."""
    caps = jnp.broadcast_to(jnp.asarray(max_new_tokens, jnp.int32),
                            states.done.shape)

    def one(state, cap):
        # internal latch_done freezes finished requests
        return spec_loop.decode_round.__wrapped__(
            tparams, dparams, tcfg, dcfg, spec, sampling, state,
            eos_id, cap,
        )

    if states.done.shape[0] == 1:
        # unit batch: bypass vmap (see batched_decode_round — the degenerate
        # [1, s, D] dots force 3 GB of stacked-weight relayout copies on TPU)
        def body1(state, _):
            state = one(state, caps[0])
            return state, state.new_token[None]

        state, counts = lax.scan(
            body1, jax.tree.map(lambda x: x[0], states), None,
            length=n_rounds)
        return jax.tree.map(lambda x: x[None], state), counts

    def body(states, _):
        states = jax.vmap(one)(states, caps)
        return states, states.new_token  # [B] cumulative counters per round

    with _batched_kernel_ctx(states):
        states, counts = lax.scan(body, states, None, length=n_rounds)
    return states, counts


@functools.partial(
    jax.jit,
    static_argnames=("tcfg", "spec", "sampling", "n_rounds"),
    donate_argnames=("states",),
)
def batched_medusa_rounds_chunk(
    tparams: dict,
    mparams: dict,
    tcfg: LlamaConfig,
    spec: SpecConfig,
    sampling: spec_loop.SamplingParams,
    states: spec_loop.SpecState,
    eos_id,
    max_new_tokens,
    n_rounds: int = 8,
):
    """``n_rounds`` batched MEDUSA rounds in one dispatch (the medusa analog
    of batched_decode_rounds_chunk; no draft transformer — heads on the
    target's hidden, spec_loop.medusa_decode_round).  ``max_new_tokens`` may
    be a scalar or a [B] vector of per-request caps."""
    caps = jnp.broadcast_to(jnp.asarray(max_new_tokens, jnp.int32),
                            states.done.shape)

    def one(state, cap):
        return spec_loop.medusa_decode_round.__wrapped__(
            tparams, mparams, tcfg, spec, sampling, state,
            eos_id, cap,
        )

    if states.done.shape[0] == 1:
        # unit batch: bypass vmap (see batched_decode_round — the degenerate
        # [1, s, D] dots force 3 GB of stacked-weight relayout copies on TPU)
        def body1(state, _):
            state = one(state, caps[0])
            return state, state.new_token[None]

        state, counts = lax.scan(
            body1, jax.tree.map(lambda x: x[0], states), None,
            length=n_rounds)
        return jax.tree.map(lambda x: x[None], state), counts

    def body(states, _):
        states = jax.vmap(one)(states, caps)
        return states, states.new_token

    with _batched_kernel_ctx(states):
        states, counts = lax.scan(body, states, None, length=n_rounds)
    return states, counts


def batched_prefill(
    tparams, dparams, tcfg, dcfg, spec, sampling,
    requests: Sequence[dict],
    max_len: int,
    max_out: int,
    dtype=jnp.bfloat16,
    seed: int = 0,
    cache_pool: Optional[List] = None,
    mparams: Optional[dict] = None,
    quantize_kv: bool = False,  # int8 target caches (kv_cache.init_cache)
) -> spec_loop.SpecState:
    """Prefill each request and stack into a batched SpecState.

    Each request dict carries ``embeds`` [pad, D] (vision-merged, padded to a
    SHARED bucket), ``real_len``, ``plan``, ``max_span``, and optionally
    ``position_ids`` / ``rope_delta`` (Qwen M-RoPE).  ``cache_pool`` is a list
    of (target_cache, draft_cache) pairs reused across calls (grown on
    demand); pass None to allocate fresh buffers.  With ``mparams`` the
    medusa prefill runs instead (no draft cache; ``plan``/``max_span``
    ignored).
    """
    states: List[spec_loop.SpecState] = []
    for i, req in enumerate(requests):
        if cache_pool is not None and i < len(cache_pool):
            tc, dc = cache_pool[i]
            tc, dc = kv.reset(tc), kv.reset(dc)
        else:
            tc = kv.init_cache(tcfg.num_hidden_layers, tcfg.num_key_value_heads,
                               max_len, tcfg.head_dim, dtype,
                               quantized=quantize_kv)
            # medusa has no draft transformer; keep the pool entry tiny
            dc = kv.init_cache(1, dcfg.num_key_value_heads,
                               128 if mparams is not None else max_len,
                               dcfg.head_dim, dtype)
            if cache_pool is not None:
                cache_pool.append((tc, dc))
        if mparams is not None:
            st = spec_loop.medusa_prefill_pooled(
                tparams, mparams, tcfg, spec, sampling, req["embeds"],
                jnp.asarray(req["real_len"], jnp.int32), tc,
                jax.random.PRNGKey(seed + i), max_out,
            )
        else:
            st = spec_loop.spec_prefill(
                tparams, dparams, tcfg, dcfg, spec, req["plan"], sampling,
                req["embeds"], tc, dc, jax.random.PRNGKey(seed + i), max_out,
                req["max_span"],
                position_ids=req.get("position_ids"),
                rope_delta=req.get("rope_delta"),
            )
        states.append(st)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def text_requests(tparams, dcfg, prompts: Sequence[Sequence[int]],
                  max_len: int, slack: int) -> List[dict]:
    """Prepare plain-text requests with a shared pad bucket."""
    longest = max(len(p) for p in prompts)
    from .spec_model import _bucket  # the one 128-row bucket rule

    pad = _bucket(longest)
    if pad > max_len or longest + slack > max_len:
        raise ValueError(
            f"longest prompt {longest} (bucketed {pad}) too long for "
            f"max_len={max_len} (needs {slack} rows of tree headroom)"
        )
    out = []
    for prompt in prompts:
        l = len(prompt)
        embeds = llama.embed(tparams, jnp.asarray(prompt, jnp.int32))
        embeds = jnp.pad(embeds, ((0, pad - l), (0, 0)))
        plan, ms = draft_mod.make_prefill_plan(None, l, dcfg.num_q, pad)
        out.append(dict(embeds=embeds, real_len=l, plan=plan, max_span=ms))
    return out


def apply_count_diffs(counts_np, prev, accepts, slot_keys) -> None:
    """Recover per-round acceptance lengths from cumulative device counters.

    counts_np: [n_rounds, B] cumulative new_token per round; prev: mutable
    per-slot int array; accepts: mapping key -> list; slot_keys: (slot, key)
    pairs to track.  A round whose counter didn't move was latched (done)."""
    for r in range(counts_np.shape[0]):
        for slot, key in slot_keys:
            c = int(counts_np[r, slot])
            if c != int(prev[slot]):
                accepts[key].append(c - int(prev[slot]) - 1)
                prev[slot] = c


def pick_chunk_rounds(max_chunk: int, prev, rounds_in, caps, live) -> int:
    """Chunk-size ladder: the largest of {1, 2, 4, max_chunk} (each a static
    scan length => one compiled graph apiece) not expected to overshoot any
    live slot's remaining budget, so early finishers stop paying dead
    full-cost verify rounds to a distant chunk boundary.  Per-slot
    rounds-to-finish = remaining / tokens-per-round (floored at 1: every
    live round commits at least the bonus token, so the estimate never
    exceeds the cap-driven truth)."""
    ladder = sorted({v for v in (1, 2, 4) if v < max_chunk} | {max_chunk})
    horizon = max_chunk
    for j in range(len(prev)):
        if not live[j]:
            continue
        tpr = max(1.0, int(prev[j]) / max(1, int(rounds_in[j])))
        rem = max(1, int(caps[j]) - int(prev[j]))
        horizon = min(horizon, int(np.ceil(rem / tpr)))
    best = ladder[0]
    for v in ladder:
        if v <= max(1, horizon):
            best = v
    return best


def drain_batch(
    tparams, dparams, tcfg, dcfg, spec, sampling, states,
    budget: int, eos_id: int, chunk_rounds: int = 8,
    mparams: Optional[dict] = None,
):
    """Run batched rounds until every request is done or the budget is hit,
    selecting each dispatch's size from the chunk ladder (tail rounds past a
    slot's expected completion are not dispatched).
    Returns (states, per-request acceptance-length lists)."""
    eos = jnp.asarray(eos_id, jnp.int32)
    cap = jnp.asarray(budget, jnp.int32)
    b = int(states.done.shape[0])
    prev = np.zeros(b, np.int64)
    rounds_in = np.zeros(b, np.int64)
    live = np.ones(b, bool)
    caps = np.full(b, budget, np.int64)
    accepts: List[List[int]] = [[] for _ in range(b)]
    slot_keys = [(j, j) for j in range(b)]
    rounds = 0
    while rounds < budget:
        ch = pick_chunk_rounds(chunk_rounds, prev, rounds_in, caps, live)
        if mparams is not None:
            states, counts = batched_medusa_rounds_chunk(
                tparams, mparams, tcfg, spec, sampling, states, eos, cap,
                n_rounds=ch,
            )
        else:
            states, counts = batched_decode_rounds_chunk(
                tparams, dparams, tcfg, dcfg, spec, sampling, states, eos, cap,
                n_rounds=ch,
            )
        apply_count_diffs(np.asarray(counts), prev, accepts, slot_keys)
        rounds += ch
        rounds_in += ch
        done = np.asarray(states.done)
        live = ~done
        if done.all():
            break
    return states, accepts


def generate_batch(
    tparams, dparams, tcfg, dcfg, spec,
    prompts: Sequence[Sequence[int]],
    max_new_tokens: int = 128,
    max_len: int = 1024,
    eos_id: int = 2,
    temperature: float = 0.0,
    top_p: float = 0.0,
    top_k: int = 0,
    dtype=jnp.bfloat16,
    seed: int = 0,
    chunk_rounds: int = 8,
    cache_pool: Optional[List] = None,
    quantize_kv: bool = False,
) -> List[np.ndarray]:
    """Decode a batch of text prompts to completion; returns generated ids per
    request.  (Vision requests go through SpecModel.specgenerate_batch, which
    prepares vision-merged request dicts.)"""
    sampling = spec_loop.SamplingParams(temperature, top_p, int(top_k))
    slack = max(spec.total_tokens, spec.depth * spec.top_k + spec.depth + 2) + 10
    max_out = max_new_tokens + 2 * (spec.depth + 2)
    requests = text_requests(tparams, dcfg, prompts, max_len, slack)
    states = batched_prefill(
        tparams, dparams, tcfg, dcfg, spec, sampling, requests,
        max_len, max_out, dtype, seed, cache_pool=cache_pool,
        quantize_kv=quantize_kv,
    )
    longest = max(len(p) for p in prompts)
    budget = min(max_new_tokens, max_len - longest - slack)
    if budget <= 0:
        raise ValueError(f"no generation headroom: max_len={max_len}, longest "
                         f"prompt {longest}, slack {slack}")
    states, _ = drain_batch(
        tparams, dparams, tcfg, dcfg, spec, sampling, states, budget, eos_id,
        chunk_rounds,
    )
    outs = []
    for b in range(len(prompts)):
        out_len = int(states.out_len[b])
        toks = np.asarray(states.output[b])[:out_len]
        epos = np.nonzero(toks == eos_id)[0]
        if epos.size:
            toks = toks[: epos[0] + 1]
        outs.append(toks)
    return outs
