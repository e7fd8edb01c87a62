"""Pallas TPU kernel: length-aware tree-verify / decode attention.

The XLA path (ops/attention.py) computes scores over the *entire* preallocated
KV cache (static shapes) and masks — reading `max_len - length` garbage rows
from HBM every layer, every round.  This kernel keeps K/V in HBM and manually
DMAs only ``ceil((tree_start + S) / BLOCK)`` blocks with double buffering (the
guide's pattern), doing online-softmax accumulation in VMEM:

- grid over KV heads; each program handles that head's GQA query group
  (rows laid out group-major: row = g * S + tree_row);
- the committed prefix [0, tree_start) is fully visible; the appended tree
  block [tree_start, tree_start + S) is masked by the tree's ancestor closure
  (the reference's side-channel tree mask, modeling_llama_kv.py:916-922, made
  explicit) — applied via a one-hot MXU matmul, no gathers;
- blocks beyond the live length are neither DMA'd nor computed.

Numerics match ops/attention.attend (f32 scores/softmax, f32-accumulated PV).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: a jnp constant would be a captured array in pallas


def _kernel(
    start_ref,  # int32 scalar prefetch — [2] (tree_start, layer_idx), or
    # [2B] per-slot (start_b, layer_b) pairs when ``batched``
    q_ref,  # [1, GS, D] VMEM — this kv-head's query group
    tm_ref,  # [GS, S] VMEM f32 — per-query-row tree mask (group-expanded)
    k_hbm,  # [L?, Hkv, max_len, D] ANY/HBM (leading layer dim optional;
    # one more leading batch dim when ``batched``)
    v_hbm,
    *rest,  # quantized: (ks_hbm, vs_hbm) [L?, Hkv, nb, block] f32, then the
    # shared refs below, then (ks_all, vs_all) [nb, block] f32 scratch + ssem
    # shared: out_ref [1, GS, D] VMEM; k_buf/v_buf [2, B, D] VMEM scratch;
    # acc_ref [GS, D] f32; ml_ref [GS, 256] f32 (cols 0:128 running max,
    # 128:256 running sum); sem — DMA semaphores [2, 2]
    block: int,
    t_reg: int,  # width of the masked tree region appended at tree_start
    scale: float,
    quantized: bool = False,
    batched: bool = False,  # grid (B, Hkv) with per-slot starts/layers
):
    if quantized:
        (ks_hbm, vs_hbm, out_ref, k_buf, v_buf, acc_ref, ml_ref,
         ks_all, vs_all, sem, ssem) = rest
    else:
        out_ref, k_buf, v_buf, acc_ref, ml_ref, sem = rest
    if batched:
        slot_b = pl.program_id(0)
        head = pl.program_id(1)
        start = start_ref[2 * slot_b]
        layer = start_ref[2 * slot_b + 1]
    else:
        head = pl.program_id(0)
        start = start_ref[0]
        layer = start_ref[1]
    gs = q_ref.shape[1]
    total = start + t_reg  # live rows incl. the appended tree region
    nb = pl.cdiv(total, block)

    def dma(slot, j, buf, hbm, s):
        if batched:  # leading batch dim; layer dim present iff ndim == 5
            if hbm.ndim == 5:
                src = hbm.at[slot_b, layer, head, pl.ds(j * block, block)]
            else:
                src = hbm.at[slot_b, head, pl.ds(j * block, block)]
        elif hbm.ndim == 4:  # full stacked cache: index (layer, head)
            src = hbm.at[layer, head, pl.ds(j * block, block)]
        else:
            src = hbm.at[head, pl.ds(j * block, block)]
        return pltpu.make_async_copy(src, buf.at[slot], s.at[slot])

    dma(0, 0, k_buf, k_hbm, sem.at[0]).start()
    dma(0, 0, v_buf, v_hbm, sem.at[1]).start()
    if quantized:
        # the full per-row scale tables for this (layer, head) are tiny
        # (max_len * 4B ≈ 8 KB at 2048): one DMA each up front, reused by
        # every block iteration as a [1, block] sublane row
        def sdma(hbm, dst, s):
            if batched:  # scales are layer-sliced by the caller: [B, Hkv, ..]
                src = hbm.at[slot_b, head]
            else:
                src = hbm.at[layer, head] if hbm.ndim == 4 else hbm.at[head]
            return pltpu.make_async_copy(src, dst, s)

        sdma(ks_hbm, ks_all, ssem.at[0]).start()
        sdma(vs_hbm, vs_all, ssem.at[1]).start()
        sdma(ks_hbm, ks_all, ssem.at[0]).wait()
        sdma(vs_hbm, vs_all, ssem.at[1]).wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    ml_ref[:, :128] = jnp.full((gs, 128), NEG_INF, jnp.float32)
    ml_ref[:, 128:] = jnp.zeros((gs, 128), jnp.float32)

    q = q_ref[0].astype(jnp.float32) * scale  # [GS, D]
    # batched: tm block is (1, GS, S) — a [B, GS, S] leading-dim slice (the
    # flattened [B*GS, S] layout would need GS % 8 == 0 for Mosaic tiling)
    tmask = tm_ref[0] if batched else tm_ref[:]  # [GS, S] f32 (1.0 = attend)

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < nb)
        def _():
            dma(nxt, j + 1, k_buf, k_hbm, sem.at[0]).start()
            dma(nxt, j + 1, v_buf, v_hbm, sem.at[1]).start()

        dma(slot, j, k_buf, k_hbm, sem.at[0]).wait()
        dma(slot, j, v_buf, v_hbm, sem.at[1]).wait()

        k = k_buf[slot]  # [B, D]
        v = v_buf[slot]
        scores = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [GS, B]
        if quantized:
            # per-row symmetric int8 (ops/kv_cache.quantize_rows): the key
            # scale multiplies its score COLUMN, exact w.r.t. the dequantized
            # dot since the scale is constant over the contracted D axis
            scores = scores * ks_all[pl.ds(j, 1), :]  # [GS, B] * [1, B]

        # visibility: absolute col = j*block + c
        cols = jax.lax.broadcasted_iota(jnp.int32, (gs, block), 1) + j * block
        committed = (cols < start).astype(jnp.float32)
        # tree part via one-hot matmul: oh[c, t] = (col_c == start + t)
        ccols = jax.lax.broadcasted_iota(jnp.int32, (block, t_reg), 0) + j * block
        trows = jax.lax.broadcasted_iota(jnp.int32, (block, t_reg), 1)
        onehot = (ccols - start == trows).astype(jnp.float32)  # [B, S]
        tree_ok = jax.lax.dot_general(
            tmask, onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [GS, B]
        allowed = committed + tree_ok  # disjoint => 0/1
        scores = jnp.where(allowed > 0.5, scores, NEG_INF)

        m_prev = ml_ref[:, :1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        p = jnp.where(allowed > 0.5, p, 0.0)

        ml_ref[:, 128:129] = ml_ref[:, 128:129] * alpha + jnp.sum(
            p, axis=1, keepdims=True
        )
        ml_ref[:, :1] = m_new
        if quantized:
            # fold the value row scales into the prob vector (constant over
            # the contracted row axis), then dot against the raw int8 tile
            pv = jax.lax.dot_general(
                p * vs_all[pl.ds(j, 1), :], v.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[:] = acc_ref[:] * alpha + pv
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out = acc_ref[:] / jnp.maximum(ml_ref[:, 128:129], 1e-20)
    out_ref[0] = out.astype(out_ref.dtype)


def _build_call(scalars, qg, tm_g, k_cache, v_cache, scale_ops, *,
                block, t_reg, quantized, batched, nslots):
    """Construct and invoke the pallas_call for one static geometry.

    ``qg`` is [(B*)Hkv, GS, D] (kv-head rows, batch-major when batched),
    ``tm_g`` [(B*)GS, T_reg], ``scalars`` [2] or [2B] int32.  The batched
    variant grids over (B, Hkv) — ONE Mosaic launch for the whole batch,
    unlike vmap-of-pallas_call whose batching rule was measured 6x slower
    than plain XLA attention at 7B@4096 B=2 (see spec/batch.py).
    """
    p, gs, d = qg.shape
    hkv = p // nslots
    cache_specs = [pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)]
    scale_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in scale_ops]
    scale_scratch = []
    if quantized:
        nb, blk = scale_ops[0].shape[-2], scale_ops[0].shape[-1]
        scale_scratch = [pltpu.VMEM((nb, blk), jnp.float32),
                         pltpu.VMEM((nb, blk), jnp.float32)]

    if batched:
        grid = (nslots, hkv)

        def q_idx(b, i, *_):
            return (b * hkv + i, 0, 0)

        tm_spec = pl.BlockSpec((1, gs, t_reg), lambda b, i, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        grid = (hkv,)

        def q_idx(i, *_):
            return (i, 0, 0)

        tm_spec = pl.BlockSpec((gs, t_reg), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, gs, d), q_idx, memory_space=pltpu.VMEM),
            tm_spec,
            *cache_specs,
            *scale_specs,
        ],
        out_specs=pl.BlockSpec((1, gs, d), q_idx, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, d), k_cache.dtype),
            pltpu.VMEM((2, block, d), v_cache.dtype),
            pltpu.VMEM((gs, d), jnp.float32),
            pltpu.VMEM((gs, 256), jnp.float32),
            *scale_scratch,
            pltpu.SemaphoreType.DMA((2, 2)),
        ] + ([pltpu.SemaphoreType.DMA((2,))] if quantized else []),
    )
    wrapped = functools.partial(_kernel, block=block, t_reg=t_reg,
                                scale=d**-0.5, quantized=quantized,
                                batched=batched)
    return pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, gs, d), qg.dtype),
    )(scalars, qg, tm_g, k_cache, v_cache, *scale_ops)


@functools.lru_cache(maxsize=None)
def _invoke_fn(block: int, t_reg: int, quantized: bool):
    """custom_vmap wrapper: a direct call runs the single-request kernel; a
    `jax.vmap` over it (the batched/serving decode graphs, spec/batch.py)
    lowers to the hand-batched (B, Hkv) grid instead of vmap's generic
    pallas batching rule."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def invoke(scalars, qg, tm_g, k_cache, v_cache, *scale_ops):
        return _build_call(scalars, qg, tm_g, k_cache, v_cache,
                           tuple(scale_ops), block=block, t_reg=t_reg,
                           quantized=quantized, batched=False, nslots=1)

    @invoke.def_vmap
    def _rule(axis_size, in_batched, scalars, qg, tm_g, k_cache, v_cache,
              *scale_ops):
        b = axis_size
        # caches and scale tables must arrive batched (per-slot): silently
        # broadcasting a multi-GB cache B times into HBM would be a disaster
        # masquerading as a convenience — only small operands (the shared
        # tree mask, scalars) get the broadcast fallback
        cache_batched = tuple(in_batched)[3:]
        assert all(cache_batched), (
            "verify_attention vmap: k_cache/v_cache (and int8 scale tables) "
            f"must be batched per-slot, got in_batched[3:]={cache_batched}")
        args = []
        for x, bt in zip(
                (scalars, qg, tm_g, k_cache, v_cache) + tuple(scale_ops),
                tuple(in_batched)):
            # broadcast rare unbatched operands (e.g. a shared tree mask)
            args.append(x if bt else jnp.broadcast_to(x[None], (b,) + x.shape))
        scalars, qg, tm_g, k_cache, v_cache, *scale_ops = args
        hkv, gs, d = qg.shape[1:]
        out = _build_call(
            scalars.reshape(-1), qg.reshape(b * hkv, gs, d),
            tm_g, k_cache, v_cache, tuple(scale_ops),
            block=block, t_reg=t_reg, quantized=quantized,
            batched=True, nslots=b)
        return out.reshape(b, hkv, gs, d), True

    return invoke


@functools.partial(jax.jit, static_argnames=("block",))
def verify_attention(
    q: jax.Array,  # [H, S, D]
    k_cache: jax.Array,  # [Hkv, max_len, D] or [L, Hkv, max_len, D]
    v_cache: jax.Array,
    tree_start: jax.Array,  # [] int32 — committed prefix length
    tree_mask: jax.Array,  # [S, T_reg] bool — per-query visibility of the
    # region appended at tree_start (ancestor closure for verify; ones for AR;
    # scratch ancestry for draft beam expansion)
    block: int = 512,
    layer_idx=None,  # [] int32 — required when k_cache has the layer dim;
    # reading the stacked cache directly avoids materializing the per-layer
    # slice (~8 MB x2 per layer per round at 7B)
    k_scale=None,  # [.., Hkv, max_len] f32 — present iff the cache is int8
    v_scale=None,  # (kv_cache.quantize_rows layout); halves the KV DMA bytes
) -> jax.Array:
    """Length-aware fused attention over the cache; returns [H, S, D]."""
    h, s, d = q.shape
    hkv = k_cache.shape[-3]
    groups = h // hkv
    gs = groups * s
    t_reg = tree_mask.shape[1]
    max_len = k_cache.shape[-2]
    assert max_len % block == 0, "max_len must be a block multiple"
    quantized = k_scale is not None
    if layer_idx is None:
        layer_idx = jnp.zeros((), jnp.int32)

    qg = q.reshape(hkv, gs, d)
    tm_g = jnp.tile(tree_mask.astype(jnp.float32), (groups, 1))  # [GS, T_reg]

    scale_ops = ()
    nb = max_len // block
    if quantized:
        # lay the per-row scales out as [nb, block] so each loop step reads
        # one dynamically-indexed SUBLANE row (lane offsets stay static).
        # CRITICAL: slice the CURRENT LAYER first — the [nb, block] reshape
        # re-tiles, so XLA materializes a layout copy of whatever it is given,
        # per layer, per step (the value derives from the scan-carried cache
        # and cannot be hoisted).  Reshaping the full stacked [L, H, max_len]
        # table cost 2 x 33.5 MB of copy per layer per step at 7B@8192
        # (~3 ms/step, measured); the per-layer [H, max_len] slice costs 1 MB.
        if k_scale.ndim == 3:
            k_scale = jax.lax.dynamic_index_in_dim(
                k_scale, layer_idx, 0, keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(
                v_scale, layer_idx, 0, keepdims=False)
        scale_ops = (
            k_scale.reshape(*k_scale.shape[:-1], nb, block).astype(jnp.float32),
            v_scale.reshape(*v_scale.shape[:-1], nb, block).astype(jnp.float32),
        )

    scalars = jnp.stack([
        jnp.asarray(tree_start, jnp.int32), jnp.asarray(layer_idx, jnp.int32)
    ])
    out = _invoke_fn(block, t_reg, quantized)(
        scalars, qg, tm_g, k_cache, v_cache, *scale_ops)
    return out.reshape(h, s, d)
