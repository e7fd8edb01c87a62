"""Weight-only int8 quantization for the DRAFT side of speculative decoding.

Losslessness is untouched: the target verifies every proposed token with exact
bf16 weights, so quantizing the draft can only change *which* tokens are
proposed (acceptance length tau), never the generated text's correctness
(SURVEY.md §4 oracle 1 still holds bit-for-bit).  The win is bandwidth: a
decode round reads the 1-layer draft ~4x (accepted-token append + one beam
level per depth) and the ranking head ~4x (root + per-level re-rank,
cnets_ours.py:1109-1191) — at 7B scale that is ~2.7GB of bf16/round, halved to
~1.3GB in int8.  XLA fuses the int8->bf16 dequant into the dot's weight
stream (measured 0.52ms -> 0.31ms for the [4096,32000] rank matmul on v5e).

Per-output-channel symmetric quantization; scales kept in float32.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 weight + per-output-channel scale; drop-in for a 2-D matmul rhs."""

    q: jax.Array  # int8 [in, out]
    s: jax.Array  # float32 [out]

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # dtype of the dequantized product path
        return jnp.bfloat16


MaybeQuant = Union[jax.Array, QTensor]


def quantize_q8(w: jax.Array, chunk_cols: int = 8192) -> QTensor:
    """Per-output-channel symmetric int8: w ~= q * s[None, :].

    Column-chunked (scales included) so the float32 transient stays small —
    quantizing the 0.5GB lm_head at near-full HBM (7B @ max_len=2048
    occupancy) OOMs if a whole f32 copy materializes at once."""

    def _scale(block):
        s = jnp.max(jnp.abs(block).astype(jnp.float32), axis=0) / 127.0
        return jnp.where(s == 0, jnp.ones_like(s), s)

    def _q(block, sblock):
        return jnp.clip(
            jnp.round(block.astype(jnp.float32) / sblock), -127, 127
        ).astype(jnp.int8)

    if w.ndim == 2 and w.shape[1] > chunk_cols:
        s_parts, q_parts = [], []
        for i in range(0, w.shape[1], chunk_cols):
            block = w[:, i:i + chunk_cols]
            sb = _scale(block)
            q_parts.append(_q(block, sb))
            s_parts.append(sb)
        return QTensor(q=jnp.concatenate(q_parts, axis=1),
                       s=jnp.concatenate(s_parts))
    s = _scale(w)
    return QTensor(q=_q(w, s), s=s)


def quantize_draft_params(dparams: dict, lm_head: jax.Array) -> dict:
    """int8 copies of the draft layer weights + a ranking copy of the target
    head — the single source for SpecModel(quantize_draft=True) and bench
    mode swaps.  Returns a NEW dict (originals not mutated)."""
    dparams = dict(dparams)
    layer = dict(dparams["layer"])
    for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        if k in layer:
            layer[k] = quantize_q8(layer[k])
    dparams["layer"] = layer
    dparams["rank_head"] = quantize_q8(lm_head)
    return dparams


def dequantize(w: MaybeQuant, dtype=jnp.bfloat16) -> jax.Array:
    if isinstance(w, QTensor):
        return (w.q.astype(jnp.float32) * w.s).astype(dtype)
    return w


def qdot(x: jax.Array, w: MaybeQuant, preferred_element_type=jnp.float32):
    """jnp.dot with an optionally-quantized rhs.  int8 values up to +-127 are
    exact in bf16, so the convert-into-matmul keeps full int8 fidelity while
    streaming half the weight bytes from HBM."""
    if isinstance(w, QTensor):
        y = jnp.dot(x, w.q.astype(jnp.bfloat16),
                    preferred_element_type=preferred_element_type)
        return y * w.s.astype(y.dtype)
    return jnp.dot(x, w, preferred_element_type=preferred_element_type)
