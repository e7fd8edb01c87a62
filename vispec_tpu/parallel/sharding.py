"""PartitionSpecs for model parameter pytrees (GSPMD tensor parallelism).

Replaces the reference's vestigial ``pretraining_tp`` serial weight-slicing
(cnets_ours.py:334-360, 478-506) and ``device_map="auto"`` layer placement with
real sharded matmuls: attention heads and MLP columns split over the ``tp``
axis, row-parallel projections reduce over it (XLA inserts the collectives).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import DraftConfig, LlamaConfig
from ..ops.quant import Q4Tensor, QTensor


def llama_param_specs(cfg: LlamaConfig) -> dict:
    """PartitionSpec pytree matching models/llama.py's parameter layout."""
    layers = {
        "input_norm": P(None, None),
        "post_norm": P(None, None),
        "wq": P(None, None, "tp"),  # column-parallel (heads split)
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),  # row-parallel (psum output)
        "w_gate": P(None, None, "tp"),
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),
    }
    if cfg.qkv_bias:
        layers["bq"] = P(None, "tp")
        layers["bk"] = P(None, "tp")
        layers["bv"] = P(None, "tp")
    return {
        "embed": P("tp", None),  # vocab-sharded lookup (all-gathered rows)
        "layers": layers,
        "final_norm": P(None),
        "lm_head": P(None, "tp"),  # vocab-sharded logits
    }


def draft_param_specs(cfg: DraftConfig) -> dict:
    layer = {
        "post_norm": P(None),
        "wq": P(None, "tp"),
        "wk": P(None, "tp"),
        "wv": P(None, "tp"),
        "wo": P("tp", None),
        "w_gate": P(None, "tp"),
        "w_up": P(None, "tp"),
        "w_down": P("tp", None),
    }
    if cfg.qkv_bias:
        layer.update({"bq": P("tp"), "bk": P("tp"), "bv": P("tp")})
    adaptor = {
        "q": P(None, "tp", None),  # heads split
        "wk": P(None, "tp"),
        "wv": P(None, "tp"),
        "wo": P("tp", None),
    }
    if cfg.qkv_bias:
        adaptor.update({"bk": P("tp"), "bv": P("tp")})
    specs = {
        "embed": P("tp", None),
        "layer": layer,
        "adaptor": adaptor,
        "fc_w": P(None, "tp"),
        "img_fc_w": P(None, "tp"),
    }
    if cfg.fc_bias:
        specs["fc_b"] = P("tp")
        specs["img_fc_b"] = P("tp")
    return specs


def _quant_leaf_spec(leaf, sp):
    """Spec node for one possibly-quantized weight, derived from the spec the
    bf16 weight would have carried.

    - ``QTensor`` (int8): ``q`` keeps the weight's layout; the per-output-
      channel scale shards with the output axis.
    - ``Q4Tensor`` column-parallel: ``packed`` [K//2, N] and ``s`` [G, N]
      both shard on N.  Row-parallel Q4 is REPLICATED instead: packed row
      ``r`` holds original rows ``r`` and ``r + K//2`` (ops/quant.Q4Tensor),
      so a contiguous shard of packed rows covers two non-contiguous stripes
      of the contraction axis and cannot line up with the activations'
      contiguous K-sharding.  Replication is correct (GSPMD contracts a
      sharded lhs against a replicated rhs); the draft layer is ~10MB in
      int4, so the memory cost is noise next to the target.
    """
    if isinstance(leaf, QTensor):
        # scale is [out] for a 2-D weight, [L, out] for a scan-stacked one:
        # drop the contraction axis, keep any leading (layer/pp) axis
        return QTensor(q=sp, s=P(*sp[:-2], sp[-1]) if len(sp) else P())
    if isinstance(leaf, Q4Tensor):
        if len(sp) == 2 and sp[0] is None:
            return Q4Tensor(packed=sp, s=P(None, sp[1]))
        return Q4Tensor(packed=P(None, None), s=P(None, None))
    return sp


def quantized_draft_specs(cfg: DraftConfig, dparams: dict) -> dict:
    """PartitionSpecs for a ``quantize_draft_params()`` pytree (any mode —
    int8/int4/int4_head/auto), making the quantized draft composable with tp
    sharding.  Walks the actual params so QTensor/Q4Tensor leaves get
    field-wise specs; keys quantization adds beyond ``init_params`` get:

    - ``rank_head`` (quantized lm_head copy): vocab-sharded like the target's
      ``lm_head`` (logit columns split over tp).
    - ``fuse_we`` / ``fuse_wh`` (decode fuse folds, [D, D]): replicated —
      33MB bf16 at 7B, and their output feeds straight into the layer's
      column-parallel qkv contraction either way.
    """
    base = draft_param_specs(cfg)
    extra = {"rank_head": P(None, "tp"),
             "fuse_we": P(None, None), "fuse_wh": P(None, None)}
    specs = {}
    for key, val in dparams.items():
        if key == "layer":
            specs["layer"] = {
                k: _quant_leaf_spec(v, base["layer"][k])
                for k, v in val.items()
            }
        else:
            sp = base.get(key, extra.get(key))
            if sp is None:
                sp = P(*(None,) * getattr(val, "ndim", 0))
            specs[key] = _quant_leaf_spec(val, sp)
    return specs


def quantize_aware_specs(specs, params):
    """Overlay a bf16 spec pytree onto a possibly-quantized params pytree:
    wherever the params hold a QTensor/Q4Tensor leaf (ops/quant), the weight's
    spec expands to field-wise specs via ``_quant_leaf_spec``; plain leaves
    keep their spec.  Identity for an unquantized tree — ``shard_over`` runs
    every target through this so ``quantize_target_inplace`` composes with
    tp/pp meshes the same way the quantized draft does."""
    if isinstance(params, (QTensor, Q4Tensor)):
        return _quant_leaf_spec(params, specs)
    if isinstance(params, dict):
        return {k: quantize_aware_specs(specs[k], v) if k in specs
                else P(*(None,) * getattr(v, "ndim", 0))
                for k, v in params.items()}
    return specs


def mixtral_param_specs(cfg) -> dict:
    """Expert-parallel specs for models/mixtral.py: the expert dimension of the
    MoE weights shards over the same ``tp`` axis as the attention heads (the
    reference computes all experts densely on one GPU,
    modeling_mixtral_kv.py:488-571 — no EP).  Each shard evaluates its local
    experts in moe_block's stacked einsum; the final ``sed,se->sd`` weighted
    sum reduces over the sharded expert axis, so XLA inserts one psum — no
    all-to-all, correct for the dense top-k-as-weights formulation."""
    layers = {
        "input_norm": P(None, None),
        "post_norm": P(None, None),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "router": P(None, None, None),  # [L, D, E] — tiny; replicate
        "we_gate": P(None, "tp", None, None),  # [L, E, D, I] experts split
        "we_up": P(None, "tp", None, None),
        "we_down": P(None, "tp", None, None),
    }
    return {
        "embed": P("tp", None),
        "layers": layers,
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
    }


def llama_param_specs_pp(cfg: LlamaConfig) -> dict:
    """Layer-stage placement: shard the scan-stacked ``[L, ...]`` layer
    weights over the ``pp`` mesh axis, composing with tp on the inner axes.

    This is the TPU-native equivalent of the reference's inference model
    sharding — HF ``device_map="auto"`` spreading decoder layers across GPUs
    with per-device KV buffer groups (gen_spec_answer_sqa.py:155,
    kv_cache.py:91-127; SURVEY.md §2.6 "naive layer placement").  Each scan
    iteration's weights live on one stage; XLA moves only the ``[T, hidden]``
    activations between stages, which is noise next to the per-layer weight
    bytes.  Use when one chip cannot hold the target (e.g. 13B on 16GB):
    pp=2 halves per-chip weight HBM with zero weight traffic, unlike tp's
    per-matmul all-gathers."""
    specs = llama_param_specs(cfg)
    specs["layers"] = {
        k: P("pp", *tuple(s)[1:]) for k, s in specs["layers"].items()
    }
    return specs


def mixtral_param_specs_pp(cfg) -> dict:
    """Layer-stage placement for the MoE target (see llama_param_specs_pp);
    experts stay split over ``tp`` within each stage."""
    specs = mixtral_param_specs(cfg)
    specs["layers"] = {
        k: P("pp", *tuple(s)[1:]) for k, s in specs["layers"].items()
    }
    return specs


def kv_cache_specs(pp: bool = False, h_ax="tp", quantized: bool = False):
    """PartitionSpecs for ops/kv_cache.KVCache: KV heads split over ``tp`` —
    attention activations are already head-sharded under llama_param_specs
    (wq/wk/wv column-parallel), so the cache rows land on the same shard with
    no resharding; lengths replicate.  With ``pp=True`` the leading layer axis
    additionally splits over the ``pp`` stages, mirroring the reference's
    per-device KV buffer groups (kv_cache.py:91-127): each stage holds exactly
    its own layers' cache.  ``h_ax=None`` replicates the head axis (used by
    shard_cache when the head count doesn't divide tp)."""
    from ..ops.kv_cache import KVCache

    l_ax = "pp" if pp else None
    return KVCache(
        k=P(l_ax, h_ax, None, None),
        v=P(l_ax, h_ax, None, None),
        length=P(),
        real_length=P(),
        # int8-KV per-row scale tables shard exactly like their rows
        k_scale=P(l_ax, h_ax, None) if quantized else None,
        v_scale=P(l_ax, h_ax, None) if quantized else None,
    )


def shard_cache(mesh: Mesh, cache, pp: bool = False):
    """Device-put a KVCache with its heads sharded over the ``tp`` axis (and
    layers over ``pp`` when requested).  An axis that doesn't divide the mesh
    extent replicates instead (e.g. a 1-KV-head draft cache under tp=2, or a
    1-layer draft under pp) — GSPMD reshards around it.  Replicating a
    MULTI-head cache is almost always a misconfiguration (every chip holds
    the full multi-GB buffer), so that case warns."""
    tp = mesh.shape.get("tp", 1)
    pp_n = mesh.shape.get("pp", 1)
    pp_ok = pp and cache.k.shape[0] % pp_n == 0
    tp_ok = cache.k.shape[1] % tp == 0
    if not tp_ok and cache.k.shape[1] > 1:
        import warnings

        warnings.warn(
            f"KV cache with {cache.k.shape[1]} heads does not divide tp={tp}; "
            f"replicating the full cache on every chip (pick tp dividing the "
            f"KV head count to shard it)", stacklevel=2)
    if pp and not pp_ok and cache.k.shape[0] > 1:
        import warnings

        warnings.warn(
            f"KV cache with {cache.k.shape[0]} layers does not divide "
            f"pp={pp_n}; every stage will hold the full layer axis (pick pp "
            f"dividing the layer count to split it)", stacklevel=2)
    specs = kv_cache_specs(pp=pp_ok, h_ax="tp" if tp_ok else None,
                           quantized=cache.k_scale is not None)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, specs,
    )


def sp_shard_prefill(mesh: Mesh, inputs_embeds, position_ids=None):
    """Sequence-parallel prefill inputs: split the prompt's token axis over
    the ``sp`` mesh axis.

    The reference has no sequence/context parallelism (SURVEY.md §2.6, §5 —
    sequence length is bounded by the preallocated cache).  Here long-prompt
    prefill — the one phase whose cost scales with sequence length — shards
    its activations by position: committing the embeds (and the matching
    position_ids) to ``P("sp", None)`` makes GSPMD propagate the sequence
    sharding through the norms and row-wise matmuls and insert all-gathers
    only where causal attention contracts over the key axis (the
    all-gather-KV SP recipe; ICI-resident).  Decode rounds see a ~31-token
    tree and stay on tp — SP pays only where the sequence is long.

    Returns the resharded ``inputs_embeds`` (and ``position_ids`` if given,
    sharded on its trailing sequence axis — handles Qwen's [3, pad_len]
    M-RoPE ids)."""
    emb = jax.device_put(inputs_embeds, NamedSharding(mesh, P("sp", None)))
    if position_ids is None:
        return emb
    pspec = P(*(None,) * (position_ids.ndim - 1), "sp")
    return emb, jax.device_put(position_ids, NamedSharding(mesh, pspec))


def shard_train_batch(mesh: Mesh, batch):
    """Shard a train.step.TrainBatch over dp x sp: the batch axis over ``dp``
    (the reference's DDP data split) and the SEQUENCE axis of the dense
    [B, S, ...] leaves over ``sp`` — long-sequence draft training splits its
    activation memory per chip the same way sp_shard_prefill splits prefill.
    The integer PrefillPlan gather maps replicate over sp (tiny; the adaptor
    compression gathers across the whole sequence anyway, so GSPMD inserts
    the one all-gather those gathers need)."""
    seq = NamedSharding(mesh, P("dp", "sp", None))
    return batch._replace(
        hidden_states=jax.device_put(batch.hidden_states, seq),
        embeds=jax.device_put(batch.embeds, seq),
        target=jax.device_put(batch.target, seq),
        loss_mask=jax.device_put(
            batch.loss_mask, NamedSharding(mesh, P("dp", "sp"))),
        plans=jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P("dp", *(None,) * (a.ndim - 1)))),
            batch.plans,
        ),
    )


def apply_specs(mesh: Mesh, params: dict, specs: dict) -> dict:
    """Device-put a parameter pytree with the given PartitionSpecs.

    Quantized leaves (QTensor/Q4Tensor) pair with a same-type spec node from
    ``quantized_draft_specs`` and are placed field-wise (int payload and
    scales carry different ranks, so one sharding can't cover both)."""

    def _put(x, s):
        if isinstance(x, (QTensor, Q4Tensor)):
            return type(x)(*(jax.device_put(f, NamedSharding(mesh, fs))
                             for f, fs in zip(x, s)))
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(
        _put, params, specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
