"""The speculative decode loop — draft-expand / verify / accept / commit as one
jitted round.

TPU-native redesign of the reference's host-driven loop
(vispec/model/spec_model_ours.py:484-547 calling utils.py tree_decoding:389,
evaluate_posterior:415, update_inference_inputs:496).  Every round is a single
compiled function with static shapes: the verify forward appends the tree block
to the target cache, acceptance is a vectorized tree walk, KV commit is a masked
gather-compact, and the next draft tree is grown in the same graph — no host
round-trips except reading the tiny ``done`` flag between rounds (the reference
syncs host<->device several times per round for tree bookkeeping).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..configs import DraftConfig, LlamaConfig, SpecConfig
from ..models import draft as draft_mod
from ..models import llama
from ..ops import kv_cache as kv
from ..ops.attention import causal_mask, tree_verify_mask
from ..ops.sampling import (process_logits, sample_categorical,
                            sample_probs_dyn, update_seen)
from ..ops.tree import Tree, greedy_accept, path_to_root, sampling_accept


def target_forward(tparams, tcfg, embeds, pos, cache, mask, region=None,
                   return_new_kv=False, seq_len=None):
    """Dispatch dense vs MoE target backbones on the parameter pytree."""
    if "router" in tparams["layers"]:
        from ..models import mixtral

        return mixtral.forward_hidden(tparams, tcfg, embeds, pos, cache, mask,
                                      region, return_new_kv, seq_len=seq_len)
    return llama.forward_hidden(tparams, tcfg, embeds, pos, cache, mask, region,
                                return_new_kv, seq_len=seq_len)


class SpecState(NamedTuple):
    """Device-resident carry between decode rounds."""

    tree: Tree
    target_cache: kv.KVCache
    draft_cache: kv.KVCache
    last_img: jax.Array  # [hidden]
    output: jax.Array  # [max_out] int32 — tokens generated beyond the prompt
    out_len: jax.Array  # [] int32
    new_token: jax.Array  # [] int32 (reference's counter, spec_model_ours.py:582)
    done: jax.Array  # [] bool
    key: jax.Array
    rope_delta: jax.Array  # [] int32 — Qwen M-RoPE offset (utils.py:398-402); 0 else
    fuse_b: jax.Array  # [hidden] f32 — folded fuse constant (last_img fixed).
    # The request-INDEPENDENT fuse matrices live in dparams["fuse_we"/"fuse_wh"]
    # (draft.ensure_fuse_mats): carrying them here stacked B identical [D, D]
    # copies in the batched/serving paths and re-sliced fc_w per round.
    seen: Optional[jax.Array] = None  # [vocab+1] bool — committed-token mask
    # for the repetition penalty (ops/sampling.py); None when the penalty is
    # off (greedy, or repetition_penalty == 1.0) so the default path pays zero
    hiddens: Optional[jax.Array] = None  # [max_out, hidden] — per-committed-
    # token target verify hiddens (keep_hiddens mode), indexed like ``output``;
    # lets a finished generation become a PrefixSnapshot at ANY committed cut
    # (multi-turn conversation reuse).  None => zero cost on the default path
    samp: Optional[jax.Array] = None  # [3] or [4] f32 — per-request TRACED
    # sampling knobs (temperature, top_p, repetition_penalty[, top_k]) when
    # SamplingParams.per_request; lets one serving graph mix greedy and
    # sampled slots.  samp[3] (f32, used as int) masks the static
    # SamplingParams.top_k bucket per slot — the sort shape stays static.
    # None on the static paths => zero cost


class SamplingParams(NamedTuple):
    """Static sampling configuration (hashable; part of the jit key).

    ``per_request=True`` switches the accept path to TRACED per-slot knobs
    carried in ``SpecState.samp`` (temperature/top_p/repetition_penalty;
    ops/sampling.sample_probs_dyn) — the serving engine's mixed-batch mode.
    Only ``top_k`` stays static (a traced k can't shape the sort)."""

    temperature: float = 0.0
    top_p: float = 0.0
    top_k: int = 0
    repetition_penalty: float = 1.0  # >1 penalizes seen tokens (utils.py:41-50)
    per_request: bool = False

    @property
    def greedy(self) -> bool:
        return (not self.per_request) and self.temperature <= 1e-5


# ---------------------------------------------------------------------------
# Target prefill + first tree
# ---------------------------------------------------------------------------


def _samp_k(samp):
    """Per-request traced top_k (samp[3]) when present; a 3-knob samp vector
    (older callers) falls back to the static bucket applying to every slot.
    The shape test is trace-time Python — no graph cost either way."""
    return samp[3] if samp is not None and samp.shape[0] > 3 else None


def _first_token(last_logits, sampling: SamplingParams, samp, seen, k_sample):
    """First-token draw shared by every prefill: greedy argmax, static
    sampled, or per-request traced knobs (sample_categorical over a one-hot
    is the argmax, so greedy slots stay exact in per_request mode)."""
    if sampling.per_request:
        p = sample_probs_dyn(last_logits, samp[0], samp[1], samp[2], seen,
                             sampling.top_k, top_k_dyn=_samp_k(samp))
        return sample_categorical(k_sample, p).astype(jnp.int32)
    if sampling.greedy:
        return jnp.argmax(last_logits).astype(jnp.int32)
    p = jax.nn.softmax(
        process_logits(last_logits, sampling.temperature, sampling.top_p,
                       sampling.top_k, sampling.repetition_penalty, seen)
    )
    return sample_categorical(k_sample, p).astype(jnp.int32)


def spec_prefill(
    tparams: dict,
    dparams: dict,
    tcfg: LlamaConfig,
    dcfg: DraftConfig,
    spec: SpecConfig,
    plan: draft_mod.PrefillPlan,
    sampling: SamplingParams,
    inputs_embeds: jax.Array,  # [pad_len, hidden] merged (vision) embeds, padded
    target_cache: kv.KVCache,
    draft_cache: kv.KVCache,
    key: jax.Array,
    max_out: int,
    max_span: int = 1,
    position_ids: Optional[jax.Array] = None,  # override ([pad_len] or [3, pad_len])
    rope_delta: Optional[jax.Array] = None,  # [] int32 (Qwen M-RoPE)
    seen: Optional[jax.Array] = None,  # [vocab+1] bool prompt-token mask
    keep_hiddens: bool = False,  # record committed-token verify hiddens
    samp: Optional[jax.Array] = None,  # [3] f32 traced per-request knobs
) -> SpecState:
    """Target prompt prefill, first-token sample, draft prefill + first tree.

    Reference: initialize_tree (utils.py:266-327) — the target full-prompt
    forward, first sample, and the draft's compressed prefill + beam expansion.
    Only bucket sizes (pad_len, max_span, max_images) key the jit — the plan
    itself is traced, so new prompts reuse the compiled graph.
    """
    pad_len = inputs_embeds.shape[0]
    real_len = plan.real_len

    if position_ids is None:
        position_ids = jnp.arange(pad_len, dtype=jnp.int32)
    mask = causal_mask(pad_len, target_cache.max_len, 0)
    hidden, target_cache = target_forward(
        tparams, tcfg, inputs_embeds, position_ids, target_cache, mask,
        seq_len=real_len,
    )
    target_cache = kv.advance(target_cache, real_len)

    last_logits = llama.lm_head(tparams, jnp.take(hidden, real_len - 1, axis=0))
    key, k_sample = jax.random.split(key)
    first_token = _first_token(last_logits, sampling, samp, seen, k_sample)
    if seen is not None:
        seen = seen.at[first_token].set(True)

    # Draft prefill embeds: shifted merged embeds + the sampled token's embedding
    # at slot real_len-1 (cnets_ours.py:1081-1082).
    shifted = jnp.roll(inputs_embeds, -1, axis=0)
    first_embed = jnp.take(dparams["embed"], first_token, axis=0).astype(shifted.dtype)
    rows = jnp.arange(pad_len, dtype=jnp.int32)
    shifted = jnp.where((rows == real_len - 1)[:, None], first_embed[None], shifted)

    last_hidden, last_img, draft_cache = draft_mod.prefill(
        dparams, dcfg, hidden, shifted, plan, draft_cache, max_span
    )
    # int8-draft mode keeps a quantized ranking copy of the head in dparams;
    # the verify pass above always uses the exact bf16 head (ops/quant.py)
    head_w = dparams["rank_head"] if "rank_head" in dparams else tparams["lm_head"]
    w_e, w_h, b_eff = draft_mod.decode_fuse_weights(dparams, dcfg, last_img)
    tree, draft_cache = draft_mod.expand_tree(
        dparams, dcfg, spec, last_hidden, first_token, last_img, head_w,
        draft_cache, fuse_w=(w_e, w_h, b_eff),
    )

    return SpecState(
        tree=tree,
        target_cache=target_cache,
        draft_cache=draft_cache,
        last_img=last_img,
        output=jnp.zeros((max_out,), jnp.int32),
        out_len=jnp.zeros((), jnp.int32),
        new_token=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        key=key,
        rope_delta=(jnp.zeros((), jnp.int32) if rope_delta is None
                    else jnp.asarray(rope_delta, jnp.int32)),
        fuse_b=b_eff,
        seen=seen,
        hiddens=(jnp.zeros((max_out, hidden.shape[-1]), hidden.dtype)
                 if keep_hiddens else None),
        samp=samp,
    )


# ---------------------------------------------------------------------------
# Prefix caching (shared text prefix — e.g. a system prompt — prefilled once)
# ---------------------------------------------------------------------------


class PrefixSnapshot(NamedTuple):
    """Reusable KV + boundary state of a shared TEXT prefix.

    The draft cache holds rows for positions [0, prefix_len-1): the row at
    prefix_len-1 pairs the boundary hidden with the FIRST SUFFIX token's
    embedding (cnets_ours.py:1066-1082's shift), so it cannot be part of the
    snapshot and is recomputed per continuation."""

    t_k: jax.Array  # [L, H, prefix_pad, D]
    t_v: jax.Array
    d_k: jax.Array  # [1, H, prefix_pad, D]
    d_v: jax.Array
    prefix_len: jax.Array  # [] int32
    boundary_hidden: jax.Array  # [hidden] — target hidden at prefix_len-1
    t_ks: Optional[jax.Array] = None  # [L, H, prefix_pad] f32 — per-row scales
    t_vs: Optional[jax.Array] = None  # when the target cache is int8 (the
    # quantize_kv serving mode); the draft cache stays bf16 either way


@functools.partial(jax.jit, static_argnames=("tcfg", "dcfg"))
def make_prefix_snapshot(
    tparams: dict,
    dparams: dict,
    tcfg: LlamaConfig,
    dcfg: DraftConfig,
    prefix_embeds: jax.Array,  # [prefix_pad, hidden]
    prefix_len: jax.Array,  # [] int32
    target_cache: kv.KVCache,  # scratch (reset) caches; not mutated logically
    draft_cache: kv.KVCache,
) -> PrefixSnapshot:
    """Prefill a shared text prefix once; returns trimmed KV rows + boundary
    hidden for spec_prefill_continue.  Text-only (no image spans)."""
    pad = prefix_embeds.shape[0]
    pos = jnp.arange(pad, dtype=jnp.int32)
    if tcfg.mrope_section is not None:
        # Qwen text-only: M-RoPE collapses to linear over all 3 streams
        pos = jnp.broadcast_to(pos[None], (3, pad))
    mask = causal_mask(pad, target_cache.max_len, 0)
    hidden, tc = target_forward(tparams, tcfg, prefix_embeds, pos,
                                target_cache, mask, seq_len=prefix_len)
    boundary = jnp.take(hidden, prefix_len - 1, axis=0)

    # draft rows for positions [0, prefix_len-1): hidden[i] + embed(token[i+1])
    shifted = jnp.roll(prefix_embeds, -1, axis=0)
    x = draft_mod.fuse(dparams, shifted.astype(hidden.dtype), hidden,
                       jnp.zeros((dcfg.hidden_size,), hidden.dtype))
    rows = jnp.arange(pad, dtype=jnp.int32)
    attn = jnp.zeros((pad, draft_cache.max_len), bool)
    attn = attn.at[:, :pad].set(rows[None, :] <= rows[:, None])
    _, dc = draft_mod.layer_forward(
        dparams, dcfg, x, rows, draft_cache, jnp.zeros((), jnp.int32), attn
    )
    return PrefixSnapshot(
        t_k=tc.k[:, :, :pad], t_v=tc.v[:, :, :pad],
        d_k=dc.k[:, :, :pad], d_v=dc.v[:, :, :pad],
        prefix_len=jnp.asarray(prefix_len, jnp.int32),
        boundary_hidden=boundary,
        t_ks=None if tc.k_scale is None else tc.k_scale[:, :, :pad],
        t_vs=None if tc.v_scale is None else tc.v_scale[:, :, :pad],
    )


def spec_prefill_continue(
    tparams: dict,
    dparams: dict,
    tcfg: LlamaConfig,
    dcfg: DraftConfig,
    spec: SpecConfig,
    sampling: SamplingParams,
    snap: PrefixSnapshot,
    suffix_embeds: jax.Array,  # [suffix_pad, hidden]
    suffix_len: jax.Array,  # [] int32
    target_cache: kv.KVCache,
    draft_cache: kv.KVCache,
    key: jax.Array,
    max_out: int,
    seen: Optional[jax.Array] = None,  # [vocab+1] bool prompt-token mask
    keep_hiddens: bool = False,
    samp: Optional[jax.Array] = None,  # [3] f32 traced per-request knobs
) -> SpecState:
    """spec_prefill for ``prefix + suffix`` that only computes the suffix:
    the snapshot's KV rows are written into the (donated) caches, the target
    runs over suffix positions, and the draft continues from the boundary row.
    Bitwise-equal target KV/hiddens to a full prefill (same weights, same
    positions); only batch-shape float associativity can differ."""
    plen = snap.prefix_len
    pad_s = suffix_embeds.shape[0]

    # seed caches with the snapshot rows
    target_cache = target_cache._replace(
        k=lax.dynamic_update_slice(target_cache.k, snap.t_k, (0, 0, 0, 0)),
        v=lax.dynamic_update_slice(target_cache.v, snap.t_v, (0, 0, 0, 0)),
        length=plen, real_length=plen + 0,
        k_scale=target_cache.k_scale if snap.t_ks is None else
        lax.dynamic_update_slice(target_cache.k_scale, snap.t_ks, (0, 0, 0)),
        v_scale=target_cache.v_scale if snap.t_vs is None else
        lax.dynamic_update_slice(target_cache.v_scale, snap.t_vs, (0, 0, 0)),
    )
    draft_cache = draft_cache._replace(
        k=lax.dynamic_update_slice(draft_cache.k, snap.d_k, (0, 0, 0, 0)),
        v=lax.dynamic_update_slice(draft_cache.v, snap.d_v, (0, 0, 0, 0)),
        # distinct ops => distinct buffers (donated pytrees must not alias —
        # see kv_cache.reset)
        length=plen - 1, real_length=(plen - 1) + 0,
    )

    # ---- target forward over the suffix ----
    pos = plen + jnp.arange(pad_s, dtype=jnp.int32)
    if tcfg.mrope_section is not None:
        pos = jnp.broadcast_to(pos[None], (3, pad_s))  # Qwen text-only
    mask = causal_mask(pad_s, target_cache.max_len, plen)
    hidden_s, target_cache = target_forward(
        tparams, tcfg, suffix_embeds, pos, target_cache, mask,
        seq_len=plen + suffix_len,
    )
    target_cache = kv.advance(target_cache, suffix_len)

    last_logits = llama.lm_head(tparams, jnp.take(hidden_s, suffix_len - 1, axis=0))
    key, k_sample = jax.random.split(key)
    first_token = _first_token(last_logits, sampling, samp, seen, k_sample)
    if seen is not None:
        seen = seen.at[first_token].set(True)

    # ---- draft continuation over positions [plen-1, plen+suffix_len) ----
    # row j (block-relative) is position plen-1+j: hidden + NEXT token's embed
    first_embed = jnp.take(dparams["embed"], first_token, axis=0)
    drows = pad_s + 1
    d_embeds = jnp.concatenate([suffix_embeds[:1],
                                jnp.roll(suffix_embeds, -1, axis=0)], axis=0)
    ridx = jnp.arange(drows, dtype=jnp.int32)
    d_embeds = jnp.where((ridx == suffix_len)[:, None],
                         first_embed[None].astype(d_embeds.dtype), d_embeds)
    d_hidden = jnp.concatenate([snap.boundary_hidden[None], hidden_s], axis=0)
    last_img = jnp.zeros((dcfg.hidden_size,), d_hidden.dtype)
    x = draft_mod.fuse(dparams, d_embeds.astype(d_hidden.dtype), d_hidden,
                       last_img)
    d_pos = plen - 1 + ridx
    cols = jnp.arange(draft_cache.max_len, dtype=jnp.int32)
    committed = cols[None, :] < draft_cache.length
    in_block = (cols[None, :] >= draft_cache.length) & (
        cols[None, :] <= draft_cache.length + ridx[:, None]
    )
    attn = committed | in_block
    d_out, draft_cache = draft_mod.layer_forward(
        dparams, dcfg, x, d_pos, draft_cache, draft_cache.length, attn
    )
    draft_cache = kv.advance(draft_cache, suffix_len + 1)
    last_hidden = jnp.take(d_out, suffix_len, axis=0)

    head_w = dparams["rank_head"] if "rank_head" in dparams else tparams["lm_head"]
    w_e, w_h, b_eff = draft_mod.decode_fuse_weights(dparams, dcfg, last_img)
    tree, draft_cache = draft_mod.expand_tree(
        dparams, dcfg, spec, last_hidden, first_token, last_img, head_w,
        draft_cache, fuse_w=(w_e, w_h, b_eff),
    )
    return SpecState(
        tree=tree, target_cache=target_cache, draft_cache=draft_cache,
        last_img=last_img,
        output=jnp.zeros((max_out,), jnp.int32),
        out_len=jnp.zeros((), jnp.int32),
        new_token=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        key=key,
        rope_delta=jnp.zeros((), jnp.int32),
        fuse_b=b_eff,
        seen=seen,
        hiddens=(jnp.zeros((max_out, hidden_s.shape[-1]), hidden_s.dtype)
                 if keep_hiddens else None),
        samp=samp,
    )


_CONTINUE_STATIC = ("tcfg", "dcfg", "spec", "sampling", "max_out",
                    "keep_hiddens")
_spec_prefill_continue_fn = spec_prefill_continue
# non-donated: the serving engine reuses one spare cache pair per admission
spec_prefill_continue = jax.jit(
    _spec_prefill_continue_fn, static_argnames=_CONTINUE_STATIC)
spec_prefill_continue_donated = jax.jit(
    _spec_prefill_continue_fn, static_argnames=_CONTINUE_STATIC,
    donate_argnames=("target_cache", "draft_cache"),
)


_PREFILL_STATIC = ("tcfg", "dcfg", "spec", "sampling", "max_out", "max_span",
                   "keep_hiddens")
_spec_prefill_fn = spec_prefill
spec_prefill = jax.jit(_spec_prefill_fn, static_argnames=_PREFILL_STATIC)
# donated variant for the single-request path: without aliasing, prefill
# copies both multi-hundred-MB caches (OOMs 7B at max_len=2048).  The batched
# path must keep the non-donated variant — its cache pool outlives the call.
spec_prefill_donated = jax.jit(
    _spec_prefill_fn, static_argnames=_PREFILL_STATIC,
    donate_argnames=("target_cache", "draft_cache"),
)


# ---------------------------------------------------------------------------
# One decode round
# ---------------------------------------------------------------------------


def _verify_accept_commit(
    tparams: dict,
    tcfg: LlamaConfig,
    sampling: SamplingParams,
    state: SpecState,
    eos_id,
    max_new_tokens,
    max_path: int,
    max_accept_depth: int,
):
    """Shared core of every drafter's decode round: target verify over the tree
    block, tree-walk acceptance, KV commit, output append.

    Returns (hidden [T, D], path, acc, bonus, partial-state fields)."""
    tree = state.tree
    t = tree.size
    tree_start = state.target_cache.length

    # ---- 1. target verify over the tree block (utils.py:389-412) ----
    embeds = llama.embed(tparams, tree.tokens)
    pos = tree_start + tree.depth + state.rope_delta
    if tcfg.mrope_section is not None:
        # Qwen M-RoPE: decode positions collapse to 1-D + rope_delta, broadcast
        # over the 3 streams (utils.py:398-402)
        pos = jnp.broadcast_to(pos[None], (3, t))
    mask = tree_verify_mask(tree.mask, tree_start, state.target_cache.max_len)
    hidden, target_cache, new_kv = target_forward(
        tparams, tcfg, embeds, pos, state.target_cache, mask,
        region=(tree_start, tree.mask), return_new_kv=True,
        seq_len=tree_start + t,
    )
    logits = llama.lm_head(tparams, hidden)  # [T, V] float32

    # ---- 2. acceptance (utils.py:415-493) ----
    key, k_accept, k_bonus = jax.random.split(state.key, 3)
    if sampling.per_request:
        # per-slot TRACED knobs: one graph serves a mixed batch (greedy
        # slots reduce exactly to the greedy walk via one-hot probs)
        probs = sample_probs_dyn(
            logits, state.samp[0], state.samp[1], state.samp[2],
            state.seen, sampling.top_k, top_k_dyn=_samp_k(state.samp),
        )
        best, acc, resid = sampling_accept(tree, probs, k_accept,
                                           max_accept_depth)
        bonus = sample_categorical(k_bonus, resid).astype(jnp.int32)
    elif sampling.greedy:
        argmax_toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        best, acc = greedy_accept(tree, argmax_toks, max_depth=max_accept_depth)
        bonus = argmax_toks[best]
    else:
        probs = jax.nn.softmax(
            process_logits(logits, sampling.temperature, sampling.top_p,
                           sampling.top_k, sampling.repetition_penalty,
                           state.seen),
            axis=-1,
        )
        best, acc, resid = sampling_accept(tree, probs, k_accept, max_accept_depth)
        bonus = sample_categorical(k_bonus, resid).astype(jnp.int32)

    # ---- 3. commit accepted path (utils.py:496-541) ----
    path = path_to_root(tree, best, max_path)
    target_cache = kv.commit_from_blocks(
        target_cache, tree_start, new_kv[0], new_kv[1], path, acc + 1
    )

    committed = tree.tokens[path]  # [max_path]; rows > acc are padding
    jcols = jnp.arange(max_path, dtype=jnp.int32)
    valid = jcols <= acc
    eos_hit = jnp.any(valid & (committed == eos_id))

    output = lax.dynamic_update_slice(state.output, committed, (state.out_len,))
    out_len = state.out_len + acc + 1
    new_token = state.new_token + acc + 1
    done = state.done | eos_hit | (new_token > max_new_tokens)

    seen = state.seen
    if seen is not None:
        # committed tokens + the bonus (it is the next tree's always-accepted
        # root, i.e. already part of the sequence) enter the penalty history
        seen = update_seen(seen, committed, valid)
        seen = seen.at[bonus].set(True)

    return (hidden, path, jcols, acc, bonus, target_cache, output, out_len,
            new_token, done, key, seen)


@functools.partial(
    jax.jit,
    static_argnames=("tcfg", "dcfg", "spec", "sampling"),
    donate_argnames=("state",),
)
def decode_round(
    tparams: dict,
    dparams: dict,
    tcfg: LlamaConfig,
    dcfg: DraftConfig,
    spec: SpecConfig,
    sampling: SamplingParams,
    state: SpecState,
    eos_id: int,
    max_new_tokens: int,
) -> SpecState:
    """verify -> accept -> commit -> next draft tree, all on device."""
    tree = state.tree
    max_path = spec.depth + 2
    (hidden, path, jcols, acc, bonus, target_cache, output, out_len,
     new_token, done, key, seen) = _verify_accept_commit(
        tparams, tcfg, sampling, state, eos_id, max_new_tokens,
        max_path, spec.depth + 1,
    )

    # ---- 4. next draft tree (utils.py:557-580 -> cnets_ours.py:1090-1108) ----
    accept_hidden = hidden[path]  # [max_path, hidden]
    hiddens = state.hiddens
    if hiddens is not None:
        # record the committed tokens' verify hiddens at their output index
        # (rows past acc are garbage, overwritten by the next live round —
        # same discipline as ``output``); powers post-generation
        # PrefixSnapshots (ConversationSnapshot)
        hiddens = lax.dynamic_update_slice(
            hiddens, accept_hidden.astype(hiddens.dtype), (state.out_len, 0)
        )
    nxt = jnp.take(tree.tokens, path, axis=0)
    tok_next = jnp.where(
        jcols < acc, jnp.roll(nxt, -1), bonus
    )  # row j pairs hidden[path[j]] with token[path[j+1]], last valid row w/ bonus
    # jnp.roll wraps the last element; rows >= acc are overwritten with bonus.

    w_e, w_h = draft_mod.ensure_fuse_mats(dparams, dcfg)
    fuse_w = (w_e, w_h, state.fuse_b)
    seed, draft_cache = draft_mod.append_accepted(
        dparams, dcfg, accept_hidden, tok_next, acc + 1, state.last_img,
        state.draft_cache, fuse_w=fuse_w,
    )
    rank_head = dparams["rank_head"] if "rank_head" in dparams else tparams["lm_head"]
    new_tree, draft_cache = draft_mod.expand_tree(
        dparams, dcfg, spec, seed, bonus, state.last_img, rank_head,
        draft_cache, fuse_w=fuse_w,
    )

    new_state = SpecState(
        tree=new_tree,
        target_cache=target_cache,
        draft_cache=draft_cache,
        last_img=state.last_img,
        output=output,
        out_len=out_len,
        new_token=new_token,
        done=done,
        key=key,
        rope_delta=state.rope_delta,
        fuse_b=state.fuse_b,
        seen=seen,
        hiddens=hiddens,
        samp=state.samp,
    )
    # in-graph done latch: rounds dispatched after completion (the host
    # pipelines one read-batch ahead) are no-ops on every cursor — see
    # latch_done for why the big cache buffers flow through unlatched
    return latch_done(state, new_state)


def latch_done(prev: SpecState, new: SpecState) -> SpecState:
    """Freeze a finished request after an unconditionally-executed round.

    CRITICAL for performance: wrapping the round in ``lax.cond`` (or selecting
    the cache buffers with ``where``) breaks XLA's in-place aliasing of the
    per-layer ``dynamic_update_slice`` cache writes — every layer then copies
    the full multi-hundred-MB cache (measured 128 ms/step vs 21.8 ms at
    7B/1024).  Instead the round always executes and only the small
    cursor/output leaves are selected; the big K/V buffers flow through
    unlatched — rows written past the frozen ``length`` are unreachable
    garbage, overwritten by the next live round.
    """
    sel = lambda old, upd: jnp.where(prev.done, old, upd)
    return new._replace(
        tree=jax.tree.map(sel, prev.tree, new.tree),
        target_cache=new.target_cache._replace(
            length=sel(prev.target_cache.length, new.target_cache.length),
            real_length=sel(prev.target_cache.real_length,
                            new.target_cache.real_length),
        ),
        draft_cache=new.draft_cache._replace(
            length=sel(prev.draft_cache.length, new.draft_cache.length),
            real_length=sel(prev.draft_cache.real_length,
                            new.draft_cache.real_length),
        ),
        output=sel(prev.output, new.output),
        out_len=sel(prev.out_len, new.out_len),
        new_token=sel(prev.new_token, new.new_token),
        done=prev.done | new.done,
        key=sel(prev.key, new.key),
        seen=(None if new.seen is None else sel(prev.seen, new.seen)),
    )


# (The single-request host loops pipeline SOLO decode_round/ar_step dispatches
# and read counters one batch behind — measured equal to a fused scan-of-rounds
# graph at 7B while compiling one round instead of two graphs.  The batched
# paths use spec/batch.batched_decode_rounds_chunk.)


# ---------------------------------------------------------------------------
# Medusa decode (no draft transformer — heads on the target's hidden)
# ---------------------------------------------------------------------------


def medusa_prefill(
    tparams: dict,
    mparams: dict,
    tcfg: LlamaConfig,
    spec: SpecConfig,
    sampling: SamplingParams,
    inputs_embeds: jax.Array,
    real_len: jax.Array,
    target_cache: kv.KVCache,
    key: jax.Array,
    max_out: int,
    samp: Optional[jax.Array] = None,  # [3] f32 traced per-request knobs
) -> SpecState:
    from ..models import medusa as medusa_mod

    pad_len = inputs_embeds.shape[0]
    position_ids = jnp.arange(pad_len, dtype=jnp.int32)
    mask = causal_mask(pad_len, target_cache.max_len, 0)
    hidden, target_cache = target_forward(
        tparams, tcfg, inputs_embeds, position_ids, target_cache, mask,
        seq_len=real_len,
    )
    target_cache = kv.advance(target_cache, real_len)
    last_hidden = jnp.take(hidden, real_len - 1, axis=0)
    last_logits = llama.lm_head(tparams, last_hidden)
    key, k_sample = jax.random.split(key)
    first_token = _first_token(last_logits, sampling, samp, None, k_sample)

    tree = medusa_mod.expand_tree(
        mparams, spec, last_hidden, first_token, tparams["lm_head"]
    )
    dummy_cache = kv.init_cache(1, 1, 8, 8, inputs_embeds.dtype)
    return SpecState(
        tree=tree,
        target_cache=target_cache,
        draft_cache=dummy_cache,
        last_img=jnp.zeros((tcfg.hidden_size,), inputs_embeds.dtype),
        output=jnp.zeros((max_out,), jnp.int32),
        out_len=jnp.zeros((), jnp.int32),
        new_token=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        key=key,
        rope_delta=jnp.zeros((), jnp.int32),
        fuse_b=jnp.zeros((1,), jnp.float32),
        samp=samp,
    )


_MEDUSA_PREFILL_STATIC = ("tcfg", "spec", "sampling", "max_out")
_medusa_prefill_fn = medusa_prefill
# donated variant for the single-request path (the caller re-binds its scratch
# cache from the returned state); the batched pool path must NOT donate — its
# cache pool outlives the call (same split as spec_prefill/spec_prefill_donated)
medusa_prefill = jax.jit(_medusa_prefill_fn,
                         static_argnames=_MEDUSA_PREFILL_STATIC,
                         donate_argnames=("target_cache",))
medusa_prefill_pooled = jax.jit(_medusa_prefill_fn,
                                static_argnames=_MEDUSA_PREFILL_STATIC)


@functools.partial(
    jax.jit,
    static_argnames=("tcfg", "spec", "sampling"),
    donate_argnames=("state",),
)
def medusa_decode_round(
    tparams: dict,
    mparams: dict,
    tcfg: LlamaConfig,
    spec: SpecConfig,
    sampling: SamplingParams,
    state: SpecState,
    eos_id: int,
    max_new_tokens: int,
) -> SpecState:
    """Medusa round: same verify/accept/commit; the next tree comes from the
    heads applied to the deepest accepted node's hidden state
    (cnets_medusa.py topK_genrate via utils.py update_inference_inputs)."""
    from ..models import medusa as medusa_mod

    max_path = medusa_mod.NUM_HEADS + 1
    (hidden, path, jcols, acc, bonus, target_cache, output, out_len,
     new_token, done, key, _seen) = _verify_accept_commit(
        tparams, tcfg, sampling, state, eos_id, max_new_tokens,
        max_path, medusa_mod.NUM_HEADS,
    )
    best_hidden = hidden[path[jnp.clip(acc, 0, max_path - 1)]]
    new_tree = medusa_mod.expand_tree(
        mparams, spec, best_hidden, bonus, tparams["lm_head"]
    )
    new_state = SpecState(
        tree=new_tree,
        target_cache=target_cache,
        draft_cache=state.draft_cache,
        last_img=state.last_img,
        output=output,
        out_len=out_len,
        new_token=new_token,
        done=done,
        key=key,
        rope_delta=state.rope_delta,
        fuse_b=state.fuse_b,
        samp=state.samp,
    )
    return latch_done(state, new_state)  # see decode_round


# ---------------------------------------------------------------------------
# Autoregressive baseline (for speedup measurement / parity tests)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tcfg", "sampling"),
                   donate_argnames=("cache",))
def ar_step(
    tparams: dict,
    tcfg: LlamaConfig,
    sampling: SamplingParams,
    token: jax.Array,  # [] int32
    cache: kv.KVCache,
    key: jax.Array,
    rope_delta: Optional[jax.Array] = None,
    seen: Optional[jax.Array] = None,  # [vocab+1] bool (repetition penalty)
) -> Tuple[jax.Array, kv.KVCache, jax.Array, Optional[jax.Array]]:
    """One greedy/sampled AR decode step over the same KV runtime.

    Mirrors the baseline loop (gen_baseline_answer_sqa.py:146-165).  The cache
    is donated: without aliasing XLA copies both multi-hundred-MB cache
    buffers every step (~1.3 ms at 7B/2048)."""
    embeds = llama.embed(tparams, token[None])
    pos = cache.length[None]
    if rope_delta is not None:
        pos = pos + jnp.asarray(rope_delta, jnp.int32)
    if tcfg.mrope_section is not None:
        pos = jnp.broadcast_to(pos[None], (3, 1))
    cols = jnp.arange(cache.max_len, dtype=jnp.int32)
    mask = (cols <= cache.length)[None, :]
    hidden, cache = target_forward(
        tparams, tcfg, embeds, pos, cache, mask,
        region=(cache.length, jnp.ones((1, 1), bool)),
        seq_len=cache.length + 1,
    )
    cache = kv.advance(cache, 1)
    logits = llama.lm_head(tparams, hidden[0])
    key, k_s = jax.random.split(key)
    if sampling.greedy:
        nxt = jnp.argmax(logits).astype(jnp.int32)
    else:
        p = jax.nn.softmax(
            process_logits(logits, sampling.temperature, sampling.top_p,
                           sampling.top_k, sampling.repetition_penalty, seen)
        )
        nxt = sample_categorical(k_s, p).astype(jnp.int32)
    if seen is not None:
        seen = seen.at[nxt].set(True)
    return nxt, cache, key, seen


def ar_prefill(
    tparams: dict,
    tcfg: LlamaConfig,
    sampling: SamplingParams,
    inputs_embeds: jax.Array,  # [pad_len, hidden]
    real_len: jax.Array,
    cache: kv.KVCache,
    key: jax.Array,
    position_ids: Optional[jax.Array] = None,
    seen: Optional[jax.Array] = None,  # [vocab+1] bool (repetition penalty)
) -> Tuple[jax.Array, kv.KVCache, jax.Array, Optional[jax.Array]]:
    pad_len = inputs_embeds.shape[0]
    pos = (jnp.arange(pad_len, dtype=jnp.int32)
           if position_ids is None else position_ids)
    mask = causal_mask(pad_len, cache.max_len, 0)
    hidden, cache = target_forward(tparams, tcfg, inputs_embeds, pos, cache,
                                   mask, seq_len=real_len)
    cache = kv.advance(cache, real_len)
    logits = llama.lm_head(tparams, hidden[real_len - 1])
    key, k_s = jax.random.split(key)
    if sampling.greedy:
        nxt = jnp.argmax(logits).astype(jnp.int32)
    else:
        p = jax.nn.softmax(
            process_logits(logits, sampling.temperature, sampling.top_p,
                           sampling.top_k, sampling.repetition_penalty, seen)
        )
        nxt = sample_categorical(k_s, p).astype(jnp.int32)
    if seen is not None:
        seen = seen.at[nxt].set(True)
    return nxt, cache, key, seen


_ar_prefill_fn = ar_prefill
ar_prefill = jax.jit(_ar_prefill_fn, static_argnames=("tcfg", "sampling"))
# donated variant (see spec_prefill_donated): avoids a full-cache copy
ar_prefill_donated = jax.jit(
    _ar_prefill_fn, static_argnames=("tcfg", "sampling"),
    donate_argnames=("cache",),
)
