"""Batched multi-request speculative decoding — beyond the reference.

The reference is batch-size-1 everywhere (utils.py:541, kv_cache.py:88).  Since
the whole decode round is a pure function of per-request state (spec/loop.py),
batching is `jax.vmap` over a stacked SpecState: every request carries its own
tree, caches, RNG, and done flag; finished requests keep executing (masked by
``done``) until the batch drains — static shapes, no ragged work.

Memory note: KV caches dominate ([B, L, H, max_len, D]); pick max_len per
serving budget.  Throughput scales with B until HBM bandwidth saturates (the
weights are read once per round for the whole batch — this is the usual
large-batch decode win and the reason batching beats the reference's bs=1
design on chips with spare compute).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DraftConfig, LlamaConfig, SpecConfig
from ..models import draft as draft_mod
from ..models import llama
from ..ops import kv_cache as kv
from . import loop as spec_loop


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
    max_new_tokens,
):
    def one(state):
        new = spec_loop.decode_round.__wrapped__(
            tparams, dparams, tcfg, dcfg, spec, sampling, state,
            eos_id, max_new_tokens,
        )
        # freeze finished requests (they still execute, results discarded)
        return jax.tree.map(lambda old, upd: jnp.where(state.done, old, upd),
                            state, new)

    return jax.vmap(one)(states)


def batched_prefill(
    tparams, dparams, tcfg, dcfg, spec, sampling,
    prompts: Sequence[Sequence[int]],
    max_len: int,
    max_out: int,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> spec_loop.SpecState:
    """Prefill each prompt (shared compiled graph per pad bucket) and stack."""
    slack = spec.depth * spec.top_k + spec.depth + 2
    slack = max(spec.total_tokens, slack) + 10
    states: List[spec_loop.SpecState] = []
    for i, prompt in enumerate(prompts):
        l = len(prompt)
        pad = max(128, ((l + 127) // 128) * 128)
        if pad > max_len or l + slack > max_len:
            raise ValueError(
                f"prompt {i} length {l} (bucketed {pad}) too long for "
                f"max_len={max_len} (needs {slack} rows of tree headroom)"
            )
        embeds = llama.embed(tparams, jnp.asarray(prompt, jnp.int32))
        embeds = jnp.pad(embeds, ((0, pad - l), (0, 0)))
        plan, ms = draft_mod.make_prefill_plan(None, l, dcfg.num_q, pad)
        tc = kv.init_cache(tcfg.num_hidden_layers, tcfg.num_key_value_heads,
                           max_len, tcfg.head_dim, dtype)
        dc = kv.init_cache(1, dcfg.num_key_value_heads, max_len, dcfg.head_dim, dtype)
        st = spec_loop.spec_prefill(
            tparams, dparams, tcfg, dcfg, spec, plan, sampling, embeds,
            tc, dc, jax.random.PRNGKey(seed + i), max_out, ms,
        )
        states.append(st)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def generate_batch(
    tparams, dparams, tcfg, dcfg, spec,
    prompts: Sequence[Sequence[int]],
    max_new_tokens: int = 128,
    max_len: int = 1024,
    eos_id: int = 2,
    temperature: float = 0.0,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> List[np.ndarray]:
    """Decode a batch of prompts to completion; returns generated ids per request."""
    sampling = spec_loop.SamplingParams(temperature=temperature)
    max_out = max_new_tokens + 2 * (spec.depth + 2)
    states = batched_prefill(
        tparams, dparams, tcfg, dcfg, spec, sampling, prompts,
        max_len, max_out, dtype, seed,
    )
    # cap generation so no request can overflow its cache (same slack math as
    # SpecModel.specgenerate — the batched path previously had no guard)
    slack = max(spec.total_tokens, spec.depth * spec.top_k + spec.depth + 2) + 10
    longest = max(len(p) for p in prompts)
    budget = min(max_new_tokens, max_len - longest - slack)
    if budget <= 0:
        raise ValueError(f"no generation headroom: max_len={max_len}, longest "
                         f"prompt {longest}, slack {slack}")
    eos = np.int32(eos_id)
    cap = np.int32(budget)
    for _ in range(budget):  # rounds upper bound
        states = batched_decode_round(
            tparams, dparams, tcfg, dcfg, spec, sampling, states, eos, cap
        )
        if bool(jnp.all(states.done)):
            break
    outs = []
    for b in range(len(prompts)):
        out_len = int(states.out_len[b])
        toks = np.asarray(states.output[b])[:out_len]
        epos = np.nonzero(toks == eos_id)[0]
        if epos.size:
            toks = toks[: epos[0] + 1]
        outs.append(toks)
    return outs
