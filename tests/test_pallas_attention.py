"""Pallas verify-attention kernel vs the XLA reference (interpreter mode on CPU;
the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from vispec_tpu.ops.attention import attend, tree_verify_mask
from vispec_tpu.ops import pallas_attention


@pytest.mark.parametrize("hkv,groups,s,start", [(2, 1, 8, 100), (2, 2, 8, 500), (4, 1, 16, 37)])
def test_matches_xla_attend(hkv, groups, s, start):
    h = hkv * groups
    d = 128
    max_len = 1024
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (hkv, max_len, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (hkv, max_len, d)), jnp.float32)
    # random ancestor-closure-ish lower-triangular mask with diag
    tm = np.tril(rng.uniform(size=(s, s)) < 0.5)
    np.fill_diagonal(tm, True)
    tm[:, 0] = True
    tree_mask = jnp.asarray(tm)
    tree_start = jnp.asarray(start, jnp.int32)

    ref_mask = tree_verify_mask(tree_mask, tree_start, max_len)
    ref = attend(q, k, v, ref_mask)

    with pltpu.force_tpu_interpret_mode():
        out = pallas_attention.verify_attention(
            q, k, v, tree_start, tree_mask, block=256
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
