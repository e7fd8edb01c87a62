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

import functools
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


class Q4Tensor(NamedTuple):
    """Packed int4 weight (two rows per byte) + per-group scales.

    ``packed[r, n]`` holds original row ``r`` in its LOW nibble and row
    ``r + K//2`` in its HIGH nibble, so unpacking is two contiguous
    half-matrices (no interleave) and the matmul splits into
    ``x[:, :K//2] @ lo + x[:, K//2:] @ hi``.  Scales are per
    (input-row-group, output-column): group ``g`` covers original rows
    ``[g*group_size, (g+1)*group_size)`` where
    ``group_size = K // s.shape[0]`` (derived — keeps the pytree static-free).

    jnp.int4 itself RecursionErrors in this jax build (round-2 finding); the
    nibble-packed uint8 layout sidesteps the dtype entirely and a Pallas
    kernel (``_q4_matmul``) unpacks in VMEM so HBM traffic is the true int4
    byte count — an XLA unpack would materialize int8 halves and read MORE
    bytes than plain int8."""

    packed: jax.Array  # uint8 [K//2, N]
    s: jax.Array  # float32 [G, N]

    @property
    def shape(self):
        return (self.packed.shape[0] * 2, self.packed.shape[1])

    @property
    def dtype(self):
        return jnp.bfloat16


MaybeQuant = Union[jax.Array, QTensor, "Q4Tensor"]


def quantize_q8(w: jax.Array, chunk_cols: int = 8192) -> QTensor:
    """Per-output-channel symmetric int8: w ~= q * s[..., None, :].

    Accepts a 2-D matrix or a scan-stacked ``[L, in, out]`` weight (scales
    are then per (layer, column) — each layer slice of the QTensor is a valid
    2-D QTensor, which is exactly what ``lax.scan`` produces when the stacked
    fields ride the xs).  Column-chunked (scales included) so the float32
    transient stays small — quantizing the 0.5GB lm_head at near-full HBM
    (7B @ max_len=2048 occupancy) OOMs if a whole f32 copy materializes at
    once."""

    def _scale(block):
        s = jnp.max(jnp.abs(block).astype(jnp.float32), axis=-2) / 127.0
        return jnp.where(s == 0, jnp.ones_like(s), s)

    def _q(block, sblock):
        return jnp.clip(
            jnp.round(block.astype(jnp.float32) / sblock[..., None, :]),
            -127, 127,
        ).astype(jnp.int8)

    if w.shape[-1] > chunk_cols:
        s_parts, q_parts = [], []
        for i in range(0, w.shape[-1], chunk_cols):
            block = w[..., i:i + chunk_cols]
            sb = _scale(block)
            q_parts.append(_q(block, sb))
            s_parts.append(sb)
        return QTensor(q=jnp.concatenate(q_parts, axis=-1),
                       s=jnp.concatenate(s_parts, axis=-1))
    s = _scale(w)
    return QTensor(q=_q(w, s), s=s)


def quantize_q4(w: jax.Array, group_size: int = 128,
                chunk_cols: int = 8192) -> Q4Tensor:
    """Per-group symmetric int4 (AWQ-style group_size=128 default):
    ``w[k, n] ~= q[k, n] * s[k // group_size, n]`` with q in [-8, 7], packed
    two rows per uint8 byte (see Q4Tensor).

    Column-chunked like quantize_q8: quantizing the 0.5GB lm_head at near-full
    HBM (7B @ max_len=2048 occupancy) OOMs if a whole f32 copy materializes."""
    k, n = w.shape
    if k % 2:
        raise ValueError(f"int4 packing needs an even input dim, got {k}")
    group_size = min(group_size, k // 2)
    while (k // 2) % group_size:
        group_size //= 2
    g = k // group_size

    def _block(wb):
        nb = wb.shape[1]
        wf = wb.astype(jnp.float32).reshape(g, group_size, nb)
        s = jnp.max(jnp.abs(wf), axis=1) / 7.0
        s = jnp.where(s == 0, jnp.ones_like(s), s)
        q = jnp.clip(jnp.round(wf / s[:, None, :]), -8, 7).astype(jnp.int32)
        q = q.reshape(k, nb)
        lo = (q[: k // 2] & 0xF).astype(jnp.uint8)
        hi = (q[k // 2:] & 0xF).astype(jnp.uint8)
        return lo | (hi << 4), s

    if n > chunk_cols:
        p_parts, s_parts = [], []
        for i in range(0, n, chunk_cols):
            pb, sb = _block(w[:, i:i + chunk_cols])
            p_parts.append(pb)
            s_parts.append(sb)
        return Q4Tensor(packed=jnp.concatenate(p_parts, axis=1),
                        s=jnp.concatenate(s_parts, axis=1))
    packed, s = _block(w)
    return Q4Tensor(packed=packed, s=s)


def _q4_unpack_halves(packed: jax.Array):
    """(lo, hi) int32 values in [-8, 7] for the two stacked half-matrices."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = ((p >> 4) ^ 8) - 8
    return lo, hi


def _q4_dequant(w: Q4Tensor, dtype=jnp.bfloat16) -> jax.Array:
    lo, hi = _q4_unpack_halves(w.packed)
    k = w.packed.shape[0] * 2
    g = w.s.shape[0]
    vals = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    vals = vals.reshape(g, k // g, w.packed.shape[1]) * w.s[:, None, :]
    return vals.reshape(k, w.packed.shape[1]).astype(dtype)


def _q4_kernel(x_ref, p_ref, s_ref, o_ref, *, group_size: int):
    """One N-tile of ``x @ dequant(packed)``: unpack nibbles in VMEM (HBM only
    ever streams the 4-bit bytes), one MXU dot per quantization group with the
    group's scale applied to the small [m, tile_n] OUTPUT —
    ``y_g = (x_g @ q_g) * s[g]`` is exact because the scale is constant over
    the group's rows.  Output-side scaling is the load-bearing choice, probed
    on-chip at the rank-head shape:
      - weight-side f32 scaling with jnp.repeat inside fori_loop: 50.8 ms
      - per-group dots + output scaling inside fori_loop:           1.39 ms
      - whole-block unpack (VMEM-infeasible for the 11008-deep mlp): 1.38 ms
    int4 values in [-8, 7] are exact in bf16, so the unpacked operand feeds
    the MXU without a weight-side multiply.  (A jnp.repeat-free
    reshape-broadcast also fails Mosaic's gather lowering on this build.)"""
    from jax.experimental import pallas as pl

    kh = p_ref.shape[0]
    gh = kh // group_size  # groups per half; lo holds groups [0, gh)

    def body(g, acc):
        lo, hi = _q4_unpack_halves(p_ref[pl.ds(g * group_size, group_size), :])
        yl = jnp.dot(x_ref[:, pl.ds(g * group_size, group_size)],
                     lo.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        yh = jnp.dot(x_ref[:, pl.ds(kh + g * group_size, group_size)],
                     hi.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        return acc + yl * s_ref[g, :][None, :] + yh * s_ref[gh + g, :][None, :]

    acc = jnp.zeros(o_ref.shape, jnp.float32)
    o_ref[:] = jax.lax.fori_loop(0, gh, body, acc)


def _q4_tile_n(kh: int, n: int):
    """N-tile width for the Pallas kernel, or None if shapes don't fit.
    Shrinks for deep matrices so the packed block + double buffering stay
    comfortably inside VMEM."""
    tile_n = 256 if kh > 4096 else 512
    if n % tile_n:
        tile_n = 128 if n % 128 == 0 else None
    return tile_n


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_matmul(x: jax.Array, packed: jax.Array, s: jax.Array,
               interpret: bool = False):
    """Pallas [M, K] @ int4-packed [K, N] -> [M, N] f32, grid over N tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    kh, n = packed.shape
    g = s.shape[0]
    group_size = (2 * kh) // g
    tile_n = _q4_tile_n(kh, n)
    kernel = functools.partial(_q4_kernel, group_size=group_size)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(x, packed, s)


def _q4_supports_pallas(m: int, w: Q4Tensor) -> bool:
    from .attention import use_pallas

    if not use_pallas():  # real TPU only; off under vmap (no_kernel_scope)
        return False
    kh, n = w.packed.shape
    g = w.s.shape[0]
    group_size = (2 * kh) // g
    # small-M decode shapes only: large M (prefill) is compute-bound and goes
    # through a one-shot dequant + XLA dot instead
    return (m <= 64 and _q4_tile_n(kh, n) is not None
            and kh % group_size == 0 and group_size % 8 == 0)


def qdot4(x: jax.Array, w: Q4Tensor,
          preferred_element_type=jnp.float32) -> jax.Array:
    """x @ w for an int4-packed rhs; Pallas in-VMEM unpack on TPU decode
    shapes, grouped-einsum fallback elsewhere (identical quantized math)."""
    squeeze = x.ndim == 1
    x2 = x[None] if squeeze else x.reshape(-1, x.shape[-1])
    x2 = x2.astype(jnp.bfloat16)
    if _q4_supports_pallas(x2.shape[0], w):
        y = _q4_matmul(x2, w.packed, w.s)
    else:
        wd = _q4_dequant(w)
        y = jnp.dot(x2, wd, preferred_element_type=jnp.float32)
    y = y.astype(preferred_element_type)
    if squeeze:
        return y[0]
    return y.reshape(*x.shape[:-1], y.shape[-1])


_LAYER_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# shape-keyed decisions of the last auto-quantization (observability/tests)
last_auto_choices: dict = {}
_AUTO_CACHE: dict = {}


def _heuristic_repr(k: int, n: int) -> str:
    """Static per-matrix representation choice, from the on-chip in-graph
    m=8 measurements at 7B shapes (v5e, ms/use):

      rank_head [4096,32000]: bf16 .498  int8 .306  int4-kernel .637
      w_down   [11008, 4096]: bf16 .315  int8 .559  int4-kernel .244
      w_up     [4096, 11008]: bf16 .258  int8 .339  int4-kernel .318
      wq       [4096,  4096]: bf16 .178  int8 .158  int4-kernel .161

    Deep matrices (K >> N) are where XLA's int8 convert-into-dot collapses
    (81 GB/s on w_down) and the Pallas int4 kernel wins outright; the vocab
    head is where XLA int8 shines (428 GB/s) and the kernel's VPU nibble
    unpack can't keep up; the wide mlp-up is fastest left in plain bf16.

    CAVEAT (BENCH_r03): these isolated winners do NOT compose — in the real
    beam loop "mixed" (25.1 ms round at 7B) loses to int8-everywhere
    (24.3 ms): the loop is HBM-byte-streaming-bound as a whole, so bf16 mlp
    mats cost real bytes that the per-op probes don't charge.  int8 stays
    the recommended mode; this table exists for the deterministic "mixed"
    option and the off-TPU "auto" fallback."""
    if k >= 2 * n:
        return "int4"
    if n >= 4 * k:
        return "int8"
    if n >= 2 * k:
        return "bf16"
    return "int8"


def _measure_repr(w: jax.Array, m: int = 8, reps: int = 16,
                  iters: int = 2, trials: int = 3) -> str:
    """Time bf16/int8/int4 for this matrix IN-GRAPH on the live device (a
    scan of ``reps`` back-to-back uses — per-call timing is dispatch/tunnel
    noise) and return the fastest mode.  Scalar-readback fenced per
    CLAUDE.md's measurement rule.  Candidates are timed in interleaved
    round-robin trials and scored by their MIN trial: a single long chain per
    candidate let slow drift (queue depth, HBM pressure during the bench's
    mode sweeps) flip close calls — an early bench run picked bf16 for the
    rank head this way, costing the whole "auto" round ~1ms vs int8."""
    import time as _time

    k, n = w.shape
    cands: dict = {"bf16": w.astype(jnp.bfloat16), "int8": quantize_q8(w)}
    q4 = quantize_q4(w)
    if _q4_supports_pallas(m, q4):
        cands["int4"] = q4
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (reps, m, k), jnp.bfloat16)
    fns = {}
    for name, wr in cands.items():
        def f_(xs, wr=wr):
            def step(c, x):
                return c + jnp.sum(qdot(x, wr)), None
            return jax.lax.scan(step, jnp.float32(0), xs)[0]

        fns[name] = jax.jit(f_)
        float(fns[name](xs))  # warm + fence
    best_t: dict = {}
    for _ in range(trials):
        for name, f in fns.items():
            t0 = _time.perf_counter()
            for _ in range(iters):
                out = f(xs)
            float(out)  # fence the chain
            dt = _time.perf_counter() - t0
            if name not in best_t or dt < best_t[name]:
                best_t[name] = dt
    return min(best_t, key=best_t.get)


def _auto_repr(w: jax.Array) -> str:
    """Per-matrix representation for mode="auto": measured on a real TPU,
    the static 7B-measurement heuristic elsewhere (hermetic CPU tests)."""
    from .attention import use_pallas

    shape = tuple(w.shape)
    if shape not in _AUTO_CACHE:
        _AUTO_CACHE[shape] = (_measure_repr(w) if use_pallas()
                              else _heuristic_repr(*shape))
    return _AUTO_CACHE[shape]


_QUANTIZERS = {
    "bf16": lambda w: w.astype(jnp.bfloat16),
    "int8": quantize_q8,
    "int4": quantize_q4,
}


def quantize_draft_params(dparams: dict, lm_head: jax.Array,
                          mode: str = "int8") -> dict:
    """Quantized copies of the draft layer weights + a ranking copy of the
    target head — the single source for SpecModel(quantize_draft=...) and
    bench mode swaps.  Returns a NEW dict (originals not mutated).

    Modes: ``int8`` (per-channel int8 everywhere), ``int4`` (per-group int4
    everywhere — halves the beam loop's weight bytes again, but the VPU
    nibble unpack loses at the vocab head: measured ratio 1.287 vs int8's
    1.130 at 7B), ``int4_head`` (int4 ranking head + int8 layer), ``mixed``
    (per-matrix static choice from the on-chip 7B measurement table in
    _heuristic_repr — deterministic, no chip time), ``auto`` (per-matrix
    fastest of bf16/int8/int4, measured in-graph on the live chip; falls
    back to the same heuristic off-TPU)."""
    if mode not in ("int8", "int4", "int4_head", "auto", "mixed"):
        raise ValueError(f"unknown quantize mode {mode!r}")
    last_auto_choices.clear()
    dparams = dict(dparams)
    layer = dict(dparams["layer"])
    for k in _LAYER_QUANT_KEYS:
        if k not in layer:
            continue
        if mode == "auto":
            choice = _auto_repr(layer[k])
        elif mode == "mixed":
            choice = _heuristic_repr(*layer[k].shape)
        else:
            choice = "int4" if mode == "int4" else "int8"
        last_auto_choices[k] = choice
        layer[k] = _QUANTIZERS[choice](layer[k])
    dparams["layer"] = layer
    if isinstance(lm_head, (QTensor, Q4Tensor)):
        # target already quantized (quantize_target_inplace ran first): rank
        # with the target's own quantized head — same bytes the verify reads,
        # no second copy, no double quantization error
        last_auto_choices["rank_head"] = (
            "int8" if isinstance(lm_head, QTensor) else "int4")
        dparams["rank_head"] = lm_head
        return dparams
    if mode == "auto":
        head_choice = _auto_repr(lm_head)
    elif mode == "mixed":
        head_choice = _heuristic_repr(*lm_head.shape)
    else:
        head_choice = "int4" if mode in ("int4", "int4_head") else "int8"
    last_auto_choices["rank_head"] = head_choice
    if head_choice == "bf16":
        # no quantized ranking copy: the draft ranks with the target's own
        # bf16 head (draft.py falls back to tparams["lm_head"]) instead of
        # duplicating a multi-hundred-MB bf16 matrix
        dparams.pop("rank_head", None)
    else:
        dparams["rank_head"] = _QUANTIZERS[head_choice](lm_head)
    return dparams


def quantize_target_params(tparams: dict, mode: str = "int8",
                           inplace: bool = False,
                           chunk_cols: int = 1024) -> dict:
    """Weight-only int8 quantization of the TARGET backbone (opt-in serving
    mode; the source for ``SpecModel.quantize_target_inplace``).

    Quantizes the seven scan-stacked layer matmuls + lm_head (per-(layer,
    output-channel) scales — each ``lax.scan`` slice is a valid 2-D QTensor)
    and leaves embed / norms / qkv biases in their original dtypes.  At 7B
    this halves the ~13.5GB the verify and AR loops stream per step, the
    structural floor of both (README "byte floor") — roughly 2x serving
    throughput and ~6.5GB of HBM freed for batch slots.

    Unlike draft quantization this CHANGES the model's outputs (the verifier
    itself is quantized) — but speculative decoding remains exactly lossless
    *relative to the quantized target*: spec output == AR output on the same
    int8 weights, the same guarantee the reference's bf16 stack makes
    (utils.py:415-493 accepts by target argmax, whatever the target is).

    Returns a NEW dict unless ``inplace`` — then the caller's nested dicts are
    mutated so each bf16 source frees the moment its int8 copy exists.  At 7B
    the bf16 weights are 13.5GB on a 16GB chip: a non-mutating copy would hold
    both generations at once and OOM, and ``chunk_cols`` stays small because a
    column chunk of a scan-stacked [32, 4096, N] matrix materializes
    ``32*4096*chunk_cols`` float32 transients."""
    if mode != "int8":
        raise ValueError(
            f"target quantization supports mode='int8' only (got {mode!r}); "
            "int4's Pallas unpack loses on the 31-row verify block the same "
            "way it lost on the ranking head (README quant A/B)")
    if "router" in tparams.get("layers", {}):
        raise NotImplementedError(
            "int8 target quantization covers the llama-family backbone; the "
            "Mixtral expert stack keeps bf16 (quantize the draft instead)")
    if not inplace:
        tparams = dict(tparams)
        tparams["layers"] = dict(tparams["layers"])
    layers = tparams["layers"]
    # idempotent: skip matrices that are already QTensors — with inplace=True
    # the caller's dict IS the storage, so a second model built over the same
    # (now-quantized) params must be a no-op, not a double-quantization
    for k in _LAYER_QUANT_KEYS:
        if not isinstance(layers[k], QTensor):
            layers[k] = quantize_q8(layers[k], chunk_cols=chunk_cols)
    if not isinstance(tparams["lm_head"], QTensor):
        tparams["lm_head"] = quantize_q8(tparams["lm_head"],
                                         chunk_cols=chunk_cols)
    return tparams


def dequantize(w: MaybeQuant, dtype=jnp.bfloat16) -> jax.Array:
    if isinstance(w, QTensor):
        return (w.q.astype(jnp.float32) * w.s[..., None, :]).astype(dtype)
    if isinstance(w, Q4Tensor):
        return _q4_dequant(w, dtype)
    return w


def qdot(x: jax.Array, w: MaybeQuant, preferred_element_type=jnp.float32):
    """jnp.dot with an optionally-quantized rhs.  int8 values up to +-127 are
    exact in bf16, so the convert-into-matmul keeps full int8 fidelity while
    streaming half the weight bytes from HBM; int4 goes through qdot4."""
    if isinstance(w, QTensor):
        y = jnp.dot(x, w.q.astype(jnp.bfloat16),
                    preferred_element_type=preferred_element_type)
        return y * w.s.astype(y.dtype)
    if isinstance(w, Q4Tensor):
        return qdot4(x, w, preferred_element_type)
    return jnp.dot(x, w, preferred_element_type=preferred_element_type)
