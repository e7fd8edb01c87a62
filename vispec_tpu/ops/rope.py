"""Rotary position embeddings, computed on the fly from position ids.

The reference precomputes cos/sin tables up to max_position_embeddings and gathers
rows (cnets_ours.py:122-162, apply at :111-119).  On TPU the outer product
``positions x inv_freq`` plus sin/cos is a handful of VPU ops and fuses into the
surrounding QK projections, so we skip the table and gather entirely — this also
makes linear/dynamic-NTK scaling trivially shape-static.

Also hosts Qwen2.5-VL M-RoPE: 3-D (t, h, w) position ids folded per-section into
one cos/sin pair (reference modeling_qwen2_5_vl_kv.py applies mrope by splitting
the head dim into `mrope_section` chunks).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def inv_frequencies(head_dim: int, theta: float) -> jax.Array:
    """[head_dim//2] float32 inverse frequencies."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponent)


def cos_sin(
    position_ids: jax.Array,
    head_dim: int,
    theta: float = 10000.0,
    linear_scale: float = 1.0,
    dynamic_ntk: "Tuple[float, int] | None" = None,
    seq_len=None,  # real (unpadded) kv sequence length for the NTK stretch
) -> Tuple[jax.Array, jax.Array]:
    """cos, sin of shape [..., head_dim] for the given integer positions.

    Matches the reference layout: freqs duplicated along the last axis
    (``emb = cat(freqs, freqs)``, cnets_ours.py:149) so rotate_half applies.

    ``dynamic_ntk=(factor, max_position_embeddings)`` selects dynamic-NTK
    scaling (HF ``LlamaDynamicNTKScalingRotaryEmbedding``; the reference's
    rotary classes in modeling_llama_kv.py ~186-240): once the sequence
    exceeds ``max_position_embeddings`` the base theta is stretched by
    ``((factor*s/max) - (factor-1)) ** (dim/(dim-2))``.  The reference gates
    the recompute on ``seq_len > max_seq_len_cached``; clamping the stretch at
    1 reproduces that gate without a data-dependent branch.  Callers must pass
    the REAL kv sequence length via ``seq_len`` — the ``max(position_ids)+1``
    fallback over-counts 128-bucket prefill padding rows and would stretch
    theta differently from HF for long prompts.
    """
    if dynamic_ntk is not None:
        factor, max_pos = dynamic_ntk
        if seq_len is None:
            seq_len = jnp.max(position_ids) + 1
        s = jnp.asarray(seq_len, jnp.float32)
        stretch = jnp.maximum(
            factor * s / float(max_pos) - (factor - 1.0), 1.0
        )
        theta_eff = theta * stretch ** (head_dim / (head_dim - 2))
        exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
        inv = 1.0 / (theta_eff**exponent)
    else:
        inv = inv_frequencies(head_dim, theta)
    pos = position_ids.astype(jnp.float32) / linear_scale
    freqs = pos[..., None] * inv  # [..., head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Rotate q[..., S, D] and k[..., S, D] with cos/sin broadcastable to [S, D]."""
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out, k_out


def mrope_cos_sin(
    position_ids_3d: jax.Array,
    head_dim: int,
    mrope_section: Tuple[int, int, int],
    theta: float,
) -> Tuple[jax.Array, jax.Array]:
    """Qwen2.5-VL multimodal RoPE: 3xS (t, h, w) positions -> [S, head_dim] cos/sin.

    Each frequency slot is assigned to one of the three position streams according
    to ``mrope_section`` (sections are in half-dim units and the pattern repeats
    for the duplicated half).  Reference behavior: modeling_qwen2_5_vl_kv.py
    (apply_multimodal_rotary_pos_emb).
    """
    cos3, sin3 = cos_sin(position_ids_3d, head_dim, theta)  # [3, S, head_dim]
    half = head_dim // 2
    sec = jnp.cumsum(jnp.asarray((0,) + tuple(mrope_section), jnp.int32))
    slot = jnp.arange(head_dim, dtype=jnp.int32) % half
    # stream[d] in {0,1,2}: which position stream drives frequency slot d
    stream = jnp.searchsorted(sec, slot, side="right") - 1
    stream = jnp.clip(stream, 0, 2)
    cos = jnp.take_along_axis(cos3, stream[None, None, :].repeat(cos3.shape[1], 1), axis=0)[0]
    sin = jnp.take_along_axis(sin3, stream[None, None, :].repeat(sin3.shape[1], 1), axis=0)[0]
    return cos, sin
