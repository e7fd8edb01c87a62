"""Attention over the preallocated KV cache (XLA path + mask builders).

The reference delegates to torch SDPA with a float32 additive mask patched with a
mutable ``model.tree_mask`` side channel (modeling_llama_kv.py:916-922,
cnets_ours.py:807-815).  Here masks are explicit boolean arguments and attention
runs over the *whole* static cache with validity masking — shape-static, so the
full decode round jits.  A Pallas kernel (ops/pallas_attention.py) specializes the
hot verify path; this module is the reference XLA implementation and fallback.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# np scalar, not jnp: a module-level jnp constant would initialize the jax
# backend at import time, locking the platform before CLIs can pick cpu.
NEG_INF = np.float32(-1e9)

_PALLAS_OK: Optional[bool] = None
_KERNEL_DISABLED = False  # trace-time scope flag (no_kernel_scope)


class no_kernel_scope:
    """Trace-time context that forces the XLA attention path.

    Used by the BATCHED decode path: under vmap the Mosaic kernel's grid gets
    a batch dimension that executes measurably slower than the plain XLA
    attention (1B bench: 43.9 vs 49.9 tok/s at B=1, 141 vs 179 at B=4), so
    batched graphs trace with the kernel off."""

    def __enter__(self):
        global _KERNEL_DISABLED
        self._prev = _KERNEL_DISABLED
        _KERNEL_DISABLED = True

    def __exit__(self, *exc):
        global _KERNEL_DISABLED
        _KERNEL_DISABLED = self._prev


def use_pallas() -> bool:
    """Use the Mosaic decode-attention kernel? (real TPU only; override with
    VISPEC_NO_PALLAS=1 or no_kernel_scope)."""
    global _PALLAS_OK
    if _KERNEL_DISABLED:
        return False
    if _PALLAS_OK is None:
        if os.environ.get("VISPEC_NO_PALLAS") == "1":
            _PALLAS_OK = False
        else:
            try:
                dev = jax.devices()[0]
                _PALLAS_OK = dev.platform in ("tpu", "axon") or "TPU" in str(
                    getattr(dev, "device_kind", "")
                )
            except Exception:
                _PALLAS_OK = False
    return _PALLAS_OK


def kernel_eligible(head_dim: int, kv_len: int) -> bool:
    """Mosaic tiling constraints: head_dim must fill the 128-lane tile and the
    cache must be at least one KV block — tiny test models fall back to XLA."""
    return head_dim % 128 == 0 and kv_len >= 128


def pick_block(max_len: int) -> int:
    """Largest power-of-two KV block <= 512 dividing max_len (kernel constraint)."""
    for b in (512, 256, 128, 64, 32, 16, 8):
        if max_len % b == 0 and max_len >= b:
            return b
    return max_len


def attend_region(
    q: jax.Array,  # [num_heads, S, head_dim]
    k_full: jax.Array,  # [num_kv_heads, max_len, head_dim] (new rows written)
    v_full: jax.Array,
    attn_mask: jax.Array,  # [S, max_len] — XLA fallback mask
    region: Optional[Tuple[jax.Array, jax.Array]],  # (start, mask[S, T_reg])
) -> jax.Array:
    """Decode/verify attention: Pallas length-aware kernel on TPU, masked XLA
    everywhere else.  ``region`` describes visibility as committed-prefix +
    masked appended region; None forces the XLA path (e.g. prefill).

    Kernel eligibility: head_dim must fill the 128-lane tile and the cache must
    be at least one KV block long (Mosaic tiling constraints) — tiny test
    models fall back to XLA."""
    if region is not None and kernel_eligible(q.shape[-1], k_full.shape[-2]) \
            and use_pallas():
        from .pallas_attention import verify_attention

        start, small_mask = region
        return verify_attention(
            q, k_full, v_full, start, small_mask, block=pick_block(k_full.shape[1])
        )
    return attend(q, k_full, v_full, attn_mask)


def repeat_kv(x: jax.Array, groups: int) -> jax.Array:
    """[H_kv, S, D] -> [H_kv*groups, S, D] (GQA broadcast, cnets_ours.py:90-101)."""
    if groups == 1:
        return x
    h, s, d = x.shape
    return jnp.broadcast_to(x[:, None], (h, groups, s, d)).reshape(h * groups, s, d)


def attend(
    q: jax.Array,  # [num_heads, q_len, head_dim]
    k: jax.Array,  # [num_kv_heads, kv_len, head_dim]
    v: jax.Array,  # [num_kv_heads, kv_len, head_dim]
    mask: jax.Array,  # [q_len, kv_len] bool (True = attend)
) -> jax.Array:
    """Masked SDPA in float32 accumulation; returns [num_heads, q_len, head_dim]."""
    num_heads = q.shape[0]
    groups = num_heads // k.shape[0]
    k = repeat_kv(k, groups)
    v = repeat_kv(v, groups)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "hqd,hkd->hqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask[None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "hqk,hkd->hqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def causal_mask(q_len: int, kv_len: int, q_start) -> jax.Array:
    """[q_len, kv_len] bool: query i (absolute pos q_start+i) sees cols <= its pos."""
    q_pos = jnp.arange(q_len, dtype=jnp.int32) + jnp.asarray(q_start, jnp.int32)
    k_pos = jnp.arange(kv_len, dtype=jnp.int32)
    return k_pos[None, :] <= q_pos[:, None]


def tree_verify_mask(
    tree_mask: jax.Array,  # [T, T] bool ancestor-closure (incl. self)
    tree_start,  # scalar: row where tree tokens were appended
    kv_len: int,
) -> jax.Array:
    """[T, kv_len] bool mask for the target verify pass.

    Tree token q sees: every committed row (< tree_start) plus its tree ancestors
    (reference side-channel patch, modeling_llama_kv.py:916-922).
    """
    t = tree_mask.shape[0]
    k_pos = jnp.arange(kv_len, dtype=jnp.int32)
    start = jnp.asarray(tree_start, jnp.int32)
    committed = k_pos[None, :] < start
    in_tree = (k_pos[None, :] >= start) & (k_pos[None, :] < start + t)
    rel = jnp.clip(k_pos[None, :] - start, 0, t - 1)
    tree_ok = jnp.take_along_axis(
        tree_mask, jnp.broadcast_to(rel, (t, kv_len)), axis=1
    )
    return committed | (in_tree & tree_ok)
