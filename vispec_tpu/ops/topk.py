"""Exact small-k top-k over the vocab axis without sorts.

``jax.lax.top_k`` over a 32k-152k vocab lowers to a full sort on TPU — profiled
at ~0.4 ms per call inside the draft's beam expansion (one call per depth step,
cnets_ours.py:1114, 1148; ~1.7 ms/round).  For the small k used by beam
expansion (top_k <= 10), k rounds of (argmax, mask) are pure VPU passes over
the row — exact, tie-broken like lax.top_k (first maximum wins), and far
cheaper than sorting 32k lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

ITER_MAX_K = 16


def top_k(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact (values, indices) top-k along the last axis; ties broken by lower
    index (matching lax.top_k)."""
    v = x.shape[-1]
    if v <= 1024 or k > ITER_MAX_K:
        return lax.top_k(x, k)

    work = x.astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, work.shape, work.ndim - 1)
    vals = []
    idxs = []
    for _ in range(k):
        i = jnp.argmax(work, axis=-1)  # first max => lowest index on ties
        val = jnp.take_along_axis(work, i[..., None], axis=-1)[..., 0]
        vals.append(val)
        idxs.append(i.astype(jnp.int32))
        work = jnp.where(cols == i[..., None], -jnp.inf, work)
    return jnp.stack(vals, axis=-1).astype(x.dtype), jnp.stack(idxs, axis=-1)
