"""Logits processing and token sampling (vectorized, jit-safe).

Replaces the HF LogitsProcessorList the reference assembles in
vispec/model/utils.py:39-55 (temperature -> repetition penalty -> top-p ->
top-k).  All transforms operate on the last axis and broadcast over leading
dims, so the same code processes the [T, vocab] verify logits in one shot
instead of row loops.

Repetition penalty: the reference plumbs the flag (utils.py:41-50) but calls
its processor list with ``input_ids=None`` (utils.py:286, 454), so HF's
``RepetitionPenaltyLogitsProcessor`` would crash if ever enabled — here the
committed-token history is carried as a [vocab+1] boolean ``seen`` mask
(updated by scatter as tokens commit; the +1 row is a trash slot for masked
scatters), so the penalty actually works and stays O(vocab) per round
regardless of history length.

Granularity caveat: the spec path applies the mask at ROUND granularity —
all tree positions of one verify round are penalized against the mask as of
the round's start, so a token accepted at depth 1 is not yet penalized for a
repeat at depth 2 of the SAME round (it is from the next round on).  The AR
path updates per token, so penalized sampling can differ distributionally
between spec and AR within a round's window (2-4 tokens).  Exact per-token
masking inside the round would serialize the tree accept; HF itself has no
speculative-penalty semantics to match (the reference's crashes if enabled).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, not jnp: a module-level jnp constant would initialize the jax
# backend at import time, locking the platform before CLIs can pick cpu.
NEG_INF = np.float32(-1e9)


def process_logits(
    logits: jax.Array,  # [..., vocab] float32
    temperature: float = 0.0,
    top_p: float = 0.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    seen: Optional[jax.Array] = None,  # [vocab+1] bool (seen_mask / update_seen)
) -> jax.Array:
    """Apply temperature/repetition/top-p/top-k warping in HF order
    (utils.py:45-54).

    Static Python floats select the compiled graph (they come from CLI flags);
    temperature <= 1e-5 means greedy and callers shouldn't be here.
    """
    if temperature >= 1e-5 and temperature != 1.0:
        logits = logits / temperature
    if repetition_penalty != 1.0 and seen is not None:
        logits = apply_repetition_penalty(logits, seen, repetition_penalty)
    if 1e-8 <= top_p < 1.0:
        logits = _top_p_warp(logits, top_p)
    if top_k > 0:
        logits = _top_k_warp(logits, int(top_k))
    return logits


def sample_probs_dyn(
    logits: jax.Array,  # [..., vocab] float32
    temperature: jax.Array,  # [] f32 TRACED (per-request)
    top_p: jax.Array,  # [] f32 TRACED
    repetition_penalty: jax.Array,  # [] f32 TRACED
    seen: Optional[jax.Array] = None,  # [vocab+1] bool
    top_k: int = 0,  # static engine-wide bucket (a traced k can't shape sort)
    top_k_dyn: Optional[jax.Array] = None,  # [] i32 TRACED per-request k:
    # sorts once to the static ``top_k`` bucket (max_k) and masks by the
    # traced k — a mixed-top_k batch shares one compiled graph.  0 disables
    # the warp for that slot; values clamp to the bucket.
) -> jax.Array:
    """Per-request sampling transform -> PROBABILITIES, with every knob
    except top_k traced: one compiled graph serves a mixed batch of greedy,
    sampled, and penalized requests (the serving engine's per-slot mode —
    a static SamplingParams would force one engine per sampling config).

    Greedy slots (temperature <= 1e-5) get the one-hot argmax of the RAW
    logits — warps and the penalty don't apply at T=0, matching the static
    path (SpecModel._seen_mask disables the penalty when greedy).  With
    one-hot probabilities the rejection-sampling acceptance walk reduces
    exactly to the greedy walk, so greedy slots stay lossless vs AR.

    Traced-identity notes vs the static ``process_logits`` path: division by
    a traced 1.0 is bitwise exact; slots with no top_p (<=0 or >=1) take the
    UNWARPED logits — bitwise identical to the static path, which skips the
    warp entirely (an eff_p=1.0 warp is only almost-exact: f32 cumsum
    rounding can reach 1.0 with ~1e-7 of tail mass left, clipping real
    tokens); penalty 1.0 is an identity.
    """
    greedy = temperature <= 1e-5
    x = logits / jnp.where(greedy, 1.0, temperature).astype(logits.dtype)
    if seen is not None:
        pen = jnp.where(x > 0, x / repetition_penalty, x * repetition_penalty)
        x = jnp.where(seen[: x.shape[-1]], pen, x)
    no_p = (top_p <= 1e-8) | (top_p >= 1.0)
    eff_p = jnp.where(no_p, 1.0, top_p)
    # comparison-only use of top_p: traced is fine
    x = jnp.where(no_p, x, _top_p_warp(x, eff_p))
    if top_k_dyn is not None and top_k > 0:
        x = _top_k_warp_dyn(x, top_k_dyn, int(top_k))
    elif top_k > 0:
        x = _top_k_warp(x, int(top_k))
    probs = jax.nn.softmax(x, axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1],
                            dtype=probs.dtype)
    return jnp.where(greedy, onehot, probs)


def apply_repetition_penalty(
    logits: jax.Array,  # [..., vocab]
    seen: jax.Array,  # [vocab+1] bool — last row ignored
    penalty: float,
) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor semantics: for every token already
    in the sequence, positive logits are divided by ``penalty`` and negative
    ones multiplied (transformers' processor; reference utils.py:49-50)."""
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen[: logits.shape[-1]], pen, logits)


def seen_mask(vocab_size: int, token_ids) -> np.ndarray:
    """Host-side [vocab+1] bool mask of tokens present in ``token_ids``
    (the prompt); out-of-range ids land in the trash row."""
    m = np.zeros(vocab_size + 1, bool)
    ids = np.clip(np.asarray(token_ids, np.int64), 0, vocab_size)
    m[ids] = True
    m[vocab_size] = False
    return m


def update_seen(seen: jax.Array, tokens: jax.Array, valid: jax.Array) -> jax.Array:
    """Scatter newly committed tokens into the seen mask; invalid rows are
    routed to the trash slot (index vocab)."""
    trash = jnp.asarray(seen.shape[0] - 1, tokens.dtype)
    idx = jnp.where(valid, tokens, trash)
    return seen.at[idx].set(True)


def _top_p_warp(logits: jax.Array, top_p: float) -> jax.Array:
    # position-based nucleus mask (matches HF TopPLogitsWarper on tied logits:
    # only in-nucleus sorted positions survive, not every value-tied token)
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < top_p  # keep first token crossing the mass
    warped_sorted = jnp.where(keep_sorted, sorted_logits, NEG_INF)
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(warped_sorted, inv, axis=-1)


def _top_k_warp(logits: jax.Array, top_k: int) -> jax.Array:
    top_k = min(top_k, logits.shape[-1])  # HF clamps (TopKLogitsWarper)
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    return jnp.where(logits >= kth, logits, NEG_INF)


def _top_k_warp_dyn(logits: jax.Array, k: jax.Array, max_k: int) -> jax.Array:
    """Traced-k top-k over a STATIC max_k bucket: one lax.top_k to the bucket
    (the only shape-bearing step), then the per-request threshold is the
    k-th sorted value, gathered with a traced index.  k<=0 disables the warp
    (that slot keeps all logits); k clamps to the bucket.  Threshold
    semantics match _top_k_warp: every logit >= the k-th value survives."""
    max_k = min(max_k, logits.shape[-1])
    vals = jax.lax.top_k(logits, max_k)[0]  # [..., max_k] descending
    idx = jnp.clip(k, 1, max_k).astype(jnp.int32) - 1
    kth = jnp.take_along_axis(
        vals, jnp.broadcast_to(idx, vals.shape[:-1])[..., None], axis=-1)
    return jnp.where((k <= 0) | (logits >= kth), logits, NEG_INF)


def sample_categorical(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Multinomial draw from a probability vector (utils.py:551)."""
    # Gumbel on log-probs is jit-friendly and avoids cumsum searches.
    logp = jnp.log(jnp.maximum(probs, 1e-20))
    return jax.random.categorical(key, logp)
