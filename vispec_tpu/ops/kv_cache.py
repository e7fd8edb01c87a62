"""Functional, preallocated KV cache for speculative decoding.

TPU-native redesign of the reference KV runtime (vispec/model/kv_cache.py:4-166 and
the accept-compaction in vispec/model/utils.py:529-541):

- One pair of HBM-resident arrays per model, stacked over layers:
  ``k, v: [num_layers, num_kv_heads, max_len, head_dim]`` — static shapes so the
  whole decode loop jits; a single ``length`` scalar tracks the committed prefix
  (the reference keeps per-layer CPU scalars, kv_cache.py:104-131; on TPU a traced
  int32 carried through the loop is free).
- Append writes a *fixed-size* block at a dynamic offset via
  ``lax.dynamic_update_slice`` and advances ``length`` by the (possibly smaller)
  valid row count; garbage rows beyond ``length`` are never attended and are
  overwritten by the next append.  This turns the reference's narrow+copy_
  (kv_cache.py:52-66) into an XLA-fusable in-place update under buffer donation.
- Commit (accept-compaction) gathers the accepted tree rows back to the contiguous
  frontier — the reference's index_select+copy_ (utils.py:529-541) — again as a
  fixed-size masked gather + dynamic slice write.

The draft model additionally tracks ``real_length``: with image-token compression
the draft cache holds fewer rows than the sequence has positions (reference
cnets_ours.py:398-420, 845-853), so position ids advance by ``real_length`` while
rows append at ``length``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class KVCache(NamedTuple):
    """Stacked per-layer KV buffers plus committed length.

    k, v: [num_layers, num_kv_heads, max_len, head_dim]
    length: int32 scalar — number of committed (attendable) rows.
    real_length: int32 scalar — logical sequence position count; equals ``length``
        unless image compression dropped rows (draft cache only).
    k_scale, v_scale: [num_layers, num_kv_heads, max_len] float32 per-row
        dequantization scales — present (non-None) iff k/v are int8
        (``init_cache(quantized=True)``, the opt-in int8-KV serving mode).
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array
    real_length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]


def init_cache(
    num_layers: int,
    num_kv_heads: int,
    max_len: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    """``quantized=True`` allocates int8 k/v plus per-row float32 scales —
    half the KV HBM and half the KV bytes each verify/decode round reads
    (the opt-in serving mode; see llama.forward_hidden's dequant contract)."""
    shape = (num_layers, num_kv_heads, max_len, head_dim)
    if quantized:
        sshape = (num_layers, num_kv_heads, max_len)
        # distinct buffers throughout (donation must never alias two leaves)
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8) + 0,
            length=jnp.zeros((), jnp.int32),
            real_length=jnp.zeros((), jnp.int32),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32) + 0,
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((), jnp.int32),
        real_length=jnp.zeros((), jnp.int32),
    )


def quantize_rows(x: jax.Array):
    """Symmetric per-row int8: ``x [..., D] -> (int8 [..., D], scale [...])``.

    Row granularity = one (layer, head, position) K or V vector — the finest
    grain whose scales still vanish next to the int8 payload (1/head_dim the
    bytes) and whose dequant factors OUT of both attention dots: scores scale
    per key column, PV scales the prob vector (ops/pallas_attention.py)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rows(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


def reset(cache: KVCache) -> KVCache:
    """Logical reset: zero the lengths, keep the buffers (cf. utils.py:341-358).

    The two length scalars must be DISTINCT buffers: a donated reset cache
    (spec_prefill_donated / ar_prefill_donated) would otherwise donate one
    buffer twice — a TPU-runtime INVALID_ARGUMENT."""
    zero = jnp.zeros((), jnp.int32)
    return cache._replace(length=zero, real_length=zero + 0)


def advance(cache: KVCache, valid_rows, real_rows=None) -> KVCache:
    """Advance lengths after a block append; only ``valid_rows`` of it count."""
    valid_rows = jnp.asarray(valid_rows, jnp.int32)
    real_rows = valid_rows if real_rows is None else jnp.asarray(real_rows, jnp.int32)
    return cache._replace(
        length=cache.length + valid_rows,
        real_length=cache.real_length + real_rows,
    )


def commit_from_blocks(
    cache: KVCache,
    tree_start: jax.Array,
    k_blocks: jax.Array,  # [L, H_kv, T, D] — the verify pass's appended rows
    v_blocks: jax.Array,
    node_indices: jax.Array,  # [max_path] accepted node offsets in the tree
    num_accepted: jax.Array,
) -> KVCache:
    """Accept-compaction that gathers from the *small* tree blocks instead of
    the cache itself.  The big-buffer operation is then a pure overlapping
    write (write-after-write), which XLA keeps in place — gathering the rows
    back out of the cache forced a full-cache copy per array (~0.8 ms each at
    7B, profiled)."""
    k_sel = jnp.take(k_blocks, node_indices, axis=2)  # [L, H, max_path, D]
    v_sel = jnp.take(v_blocks, node_indices, axis=2)
    zero = jnp.zeros((), jnp.int32)
    start = (zero, zero, tree_start, zero)
    new_len = tree_start + jnp.asarray(num_accepted, jnp.int32)
    delta = new_len - cache.length
    k_scale, v_scale = cache.k_scale, cache.v_scale
    if cache.k.dtype == jnp.int8:
        # the verify pass returns the PRE-quant bf16 blocks; re-quantizing the
        # accepted rows here reproduces bit-identical int8 to an append of the
        # same rows (quantize_rows is deterministic), so spec and AR caches
        # agree on every committed row
        k_sel, ks_sel = quantize_rows(k_sel)
        v_sel, vs_sel = quantize_rows(v_sel)
        sstart = (zero, zero, tree_start)
        k_scale = lax.dynamic_update_slice(k_scale, ks_sel, sstart)
        v_scale = lax.dynamic_update_slice(v_scale, vs_sel, sstart)
    k = lax.dynamic_update_slice(cache.k, k_sel.astype(cache.k.dtype), start)
    v = lax.dynamic_update_slice(cache.v, v_sel.astype(cache.v.dtype), start)
    return KVCache(k=k, v=v, length=new_len, real_length=cache.real_length + delta,
                   k_scale=k_scale, v_scale=v_scale)
