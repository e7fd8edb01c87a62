"""Logits processing and token sampling (vectorized, jit-safe).

Replaces the HF LogitsProcessorList the reference assembles in
vispec/model/utils.py:39-55 (temperature -> top-p -> top-k warpers; repetition
penalty is plumbed but never enabled in the eval harness).  All transforms
operate on the last axis and broadcast over leading dims, so the same code
processes the [T, vocab] verify logits in one shot instead of row loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)


def process_logits(
    logits: jax.Array,  # [..., vocab] float32
    temperature: float = 0.0,
    top_p: float = 0.0,
    top_k: int = 0,
) -> jax.Array:
    """Apply temperature/top-p/top-k warping in HF order (utils.py:45-54).

    Static Python floats select the compiled graph (they come from CLI flags);
    temperature <= 1e-5 means greedy and callers shouldn't be here.
    """
    if temperature >= 1e-5 and temperature != 1.0:
        logits = logits / temperature
    if 1e-8 <= top_p < 1.0:
        logits = _top_p_warp(logits, top_p)
    if top_k > 0:
        logits = _top_k_warp(logits, int(top_k))
    return logits


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


def sample_categorical(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Multinomial draw from a probability vector (utils.py:551)."""
    # Gumbel on log-probs is jit-friendly and avoids cumsum searches.
    logp = jnp.log(jnp.maximum(probs, 1e-20))
    return jax.random.categorical(key, logp)
