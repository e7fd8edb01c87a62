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


def test_vmapped_matches_xla():
    """jax.vmap over verify_attention lowers to the hand-batched (B, Hkv)
    grid (custom_vmap rule) — per-slot starts and masks, one Mosaic launch."""
    b, hkv, groups, s, d, max_len = 3, 2, 2, 8, 128, 512
    h = hkv * groups
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, hkv, max_len, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, hkv, max_len, d)), jnp.float32)
    tm = np.tril(rng.uniform(size=(b, s, s)) < 0.5)
    for i in range(b):
        np.fill_diagonal(tm[i], True)
    tm[:, :, 0] = True
    tree_mask = jnp.asarray(tm)
    starts = jnp.asarray([100, 37, 381], jnp.int32)

    ref = jnp.stack([
        attend(q[i], k[i], v[i],
               tree_verify_mask(tree_mask[i], starts[i], max_len))
        for i in range(b)
    ])
    fn = jax.vmap(lambda qi, ki, vi, st, tmi: pallas_attention.verify_attention(
        qi, ki, vi, st, tmi, block=256))
    with pltpu.force_tpu_interpret_mode():
        out = fn(q, k, v, starts, tree_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("groups", [1, 2])
def test_vmapped_quantized_matches_dequant(groups):
    """Batched int8-KV kernel (stacked layer dim + per-slot layer indices)
    vs dequantize-then-attend; GQA group expansion included."""
    from vispec_tpu.ops.kv_cache import dequantize_rows, quantize_rows

    b, L, hkv, s, d, max_len = 2, 2, 2, 4, 128, 256
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(0, 1, (b, hkv * groups, s, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(0, 1, (b, L, hkv, max_len, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(0, 1, (b, L, hkv, max_len, d)), jnp.float32)
    kq, ks = jax.vmap(jax.vmap(quantize_rows))(kf)
    vq, vs = jax.vmap(jax.vmap(quantize_rows))(vf)
    tm = jnp.asarray(np.tril(np.ones((b, s, s), bool)))
    starts = jnp.asarray([64, 130], jnp.int32)
    layers = jnp.asarray([1, 0], jnp.int32)

    ref = jnp.stack([
        attend(q[i],
               dequantize_rows(kq[i, layers[i]], ks[i, layers[i]], q.dtype),
               dequantize_rows(vq[i, layers[i]], vs[i, layers[i]], q.dtype),
               tree_verify_mask(tm[i], starts[i], max_len))
        for i in range(b)
    ])
    fn = jax.vmap(
        lambda qi, ki, vi, st, tmi, li, ksi, vsi:
        pallas_attention.verify_attention(
            qi, ki, vi, st, tmi, block=128, layer_idx=li,
            k_scale=ksi, v_scale=vsi))
    with pltpu.force_tpu_interpret_mode():
        out = fn(q, kq, vq, starts, tm, layers, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
