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


def kv_cache_specs():
    """PartitionSpecs for ops/kv_cache.KVCache: KV heads split over ``tp`` —
    attention activations are already head-sharded under llama_param_specs
    (wq/wk/wv column-parallel), so the cache rows land on the same shard with
    no resharding; lengths replicate."""
    from ..ops.kv_cache import KVCache

    return KVCache(
        k=P(None, "tp", None, None),
        v=P(None, "tp", None, None),
        length=P(),
        real_length=P(),
    )


def shard_cache(mesh: Mesh, cache):
    """Device-put a KVCache with its heads sharded over the ``tp`` axis."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, kv_cache_specs(),
    )


def apply_specs(mesh: Mesh, params: dict, specs: dict) -> dict:
    """Device-put a parameter pytree with the given PartitionSpecs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
