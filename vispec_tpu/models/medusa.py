"""Medusa baseline draft: per-offset prediction heads, no draft transformer.

Reference: vispec/model/cnets_medusa.py — 5 heads, each one zero-initialized
residual block (``x + silu(linear(x))``, :44-73) sharing the target's lm_head;
``topK_genrate`` (:231-434) runs the same beam bookkeeping as the EAGLE tree
but level i+1's candidates all come from head i+1's logits at the *same*
hidden state (no sequential drafting, :287-301).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..configs import SpecConfig
from ..ops.tree import Tree, build_tree
from ..ops.topk import top_k as fast_top_k

NUM_HEADS = 5  # medusa_num_heads (cnets_medusa.py:158)


def heads_forward(params: dict, hidden: jax.Array) -> jax.Array:
    """[..., D] -> [NUM_HEADS, ..., D] residual-block heads."""
    w, b = params["heads_w"], params["heads_b"]  # [H, D, D], [H, D]
    z = jnp.einsum("...d,hde->h...e", hidden, w, preferred_element_type=jnp.float32)
    z = z + b.reshape((NUM_HEADS,) + (1,) * (hidden.ndim - 1) + (b.shape[-1],))
    return hidden[None] + jax.nn.silu(z).astype(hidden.dtype)


def expand_tree(
    params: dict,
    spec: SpecConfig,
    seed_hidden: jax.Array,  # [D] target hidden at the frontier token
    sample_token: jax.Array,  # [] int32
    head_w: jax.Array,  # [D, V]
) -> Tree:
    """Beam bookkeeping over per-head logits (cnets_medusa.py:269-345).

    Levels = NUM_HEADS - 1 expansion steps after the root top-k; level i's
    candidate pool is head i+1's top-k added to every live beam's score.
    """
    k_beam = spec.top_k
    levels = NUM_HEADS - 1
    num_cand = k_beam + levels * k_beam * k_beam

    mh = heads_forward(params, seed_hidden)  # [H, D]
    # qdot == jnp.dot for plain arrays; head_w is a QTensor under
    # quantize_target_inplace (the heads share the target's lm_head)
    from ..ops.quant import qdot

    logits = qdot(mh, head_w, preferred_element_type=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)  # [H, V]

    top_p0, top_i0 = fast_top_k(logp[0], k_beam)
    tokens_flat = jnp.zeros((num_cand,), jnp.int32).at[:k_beam].set(top_i0)
    scores_flat = jnp.full((num_cand,), -jnp.inf, jnp.float32).at[:k_beam].set(top_p0)
    parent1_flat = jnp.zeros((num_cand,), jnp.int32)

    beam_scores = top_p0
    beam_src = jnp.arange(k_beam, dtype=jnp.int32)

    def level_step(i, carry):
        beam_scores, beam_src, tokens_flat, scores_flat, parent1_flat = carry
        lvl_logp = jax.lax.dynamic_index_in_dim(logp, i + 1, keepdims=False)
        top_p, top_i = fast_top_k(lvl_logp, k_beam)  # same for every beam
        cu = top_p[None, :] + beam_scores[:, None]  # [K, K]
        block = k_beam + i * k_beam * k_beam
        flat_tokens = jnp.tile(top_i.astype(jnp.int32), (k_beam,))
        flat_scores = cu.reshape(-1)
        flat_parent = jnp.repeat(beam_src + 1, k_beam)
        tokens_flat = lax.dynamic_update_slice(tokens_flat, flat_tokens, (block,))
        scores_flat = lax.dynamic_update_slice(scores_flat, flat_scores, (block,))
        parent1_flat = lax.dynamic_update_slice(parent1_flat, flat_parent, (block,))
        new_scores, cs_idx = lax.top_k(cu.reshape(-1), k_beam)
        new_src = block + cs_idx.astype(jnp.int32)
        return new_scores, new_src, tokens_flat, scores_flat, parent1_flat

    carry = (beam_scores, beam_src, tokens_flat, scores_flat, parent1_flat)
    for i in range(levels):  # static trip count: unroll
        carry = level_step(i, carry)
    _, _, tokens_flat, scores_flat, parent1_flat = carry

    return build_tree(
        sample_token, tokens_flat, scores_flat, parent1_flat,
        spec.total_tokens, max_depth=levels + 1,
    )


def init_params(hidden_size: int, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    # zero-init linear => heads start as identity (cnets_medusa.py:57-58)
    del key
    return {
        "heads_w": jnp.zeros((NUM_HEADS, hidden_size, hidden_size), dtype),
        "heads_b": jnp.zeros((NUM_HEADS, hidden_size), dtype),
    }


def convert_medusa(sd, dtype=jnp.bfloat16) -> dict:
    """HF medusa draft state dict (medusa_head.{i}.0.linear.*) -> pytree."""
    import numpy as np

    ws, bs = [], []
    for i in range(NUM_HEADS):
        w = sd[f"medusa_head.{i}.0.linear.weight"]
        b = sd[f"medusa_head.{i}.0.linear.bias"]
        ws.append(np.ascontiguousarray(w.T))
        bs.append(b)
    return {
        "heads_w": jnp.asarray(np.stack(ws), dtype),
        "heads_b": jnp.asarray(np.stack(bs), dtype),
    }
