"""Exact two-stage top-k over the vocab axis.

``jax.lax.top_k`` over a 32k-152k vocab lowers to a full sort on TPU — several
hundred microseconds that the draft's beam expansion pays once per depth step
(cnets_ours.py:1114, 1148).  Splitting into 128-lane blocks, taking per-block
top-k (tiny sorts), then a final top-k over the k*num_blocks survivors is
exact for any k <= block and ~an order of magnitude faster.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

BLOCK = 128


def top_k(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact (values, indices) top-k along the last axis; ties broken by lower
    index (matching lax.top_k)."""
    v = x.shape[-1]
    if v <= 4 * BLOCK or k > BLOCK:
        return lax.top_k(x, k)
    pad = (-v) % BLOCK
    if pad:
        fill = jnp.full(x.shape[:-1] + (pad,), -jnp.inf, x.dtype)
        x = jnp.concatenate([x, fill], axis=-1)
    nb = x.shape[-1] // BLOCK
    blocks = x.reshape(x.shape[:-1] + (nb, BLOCK))
    bv, bi = lax.top_k(blocks, k)  # [..., nb, k]
    base = (jnp.arange(nb, dtype=jnp.int32) * BLOCK)[..., :, None]
    flat_v = bv.reshape(x.shape[:-1] + (nb * k,))
    flat_i = (bi + base).reshape(x.shape[:-1] + (nb * k,))
    fv, fi = lax.top_k(flat_v, k)
    return fv, jnp.take_along_axis(flat_i, fi, axis=-1)
