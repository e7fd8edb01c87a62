"""Model / draft configuration dataclasses.

TPU-native replacement for the reference's HF-PretrainedConfig-based `EConfig`
(reference: vispec/model/configs.py:80-154) plus the target-model configs that the
reference inherits from HF `transformers`.  We use frozen dataclasses so configs are
hashable and can be passed as static args to `jax.jit`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class LlamaConfig:
    """Decoder-only transformer config (LLaMA / Vicuna / Qwen2 text backbones).

    Mirrors the knobs the reference target forks consume
    (vispec/model/modeling_llama_kv.py, modeling_qwen2_kv.py); `qkv_bias=True`
    selects the Qwen2 variant (reference modeling_qwen2_kv.py:482-488).
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    hidden_act: str = "silu"
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling_type: Optional[str] = None  # None | "linear" | "dynamic"
    rope_scaling_factor: float = 1.0
    qkv_bias: bool = False
    tie_word_embeddings: bool = False
    # M-RoPE section split for Qwen2.5-VL text backbones ((t, h, w) dims per head half)
    mrope_section: Optional[Tuple[int, int, int]] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads


@dataclass(frozen=True)
class DraftConfig:
    """ViSpec / EAGLE one-layer draft model config.

    Equivalent of the reference `EConfig` JSONs in vispec/train/*.json (all have
    num_hidden_layers=1; Qwen variants add qkv_bias, e.g.
    vispec/train/qwen2.5_vl_3B_config.json:27).
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 1
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    hidden_act: str = "silu"
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    qkv_bias: bool = False
    fc_bias: bool = True  # `bias` key of the draft config JSON (spec_model_ours.py:61-64)
    num_q: int = 2  # learned image-compression queries (cnets_ours.py:603-611)
    # False => EAGLE-2 baseline draft (reference cnets.py): no ImgAdaptor, no
    # img_fc — input fusion is fc([embed; target_hidden]) only.
    vision: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @classmethod
    def from_json(cls, path: str, num_q: int = 2) -> "DraftConfig":
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in fields}
        if "bias" in raw:
            kwargs["fc_bias"] = bool(raw["bias"])
        if raw.get("num_key_value_heads") is None:
            kwargs["num_key_value_heads"] = raw.get(
                "num_attention_heads", cls.num_attention_heads
            )
        kwargs["num_q"] = num_q
        return cls(**kwargs)


@dataclass(frozen=True)
class SpecConfig:
    """Speculative decoding hyper-parameters.

    Canonical values from the reference shell driver (exp.sh:10-14):
    depth=3, top_k=8, total_token=30, num_q=2.  `total_tokens` here is the number
    of verify-tree nodes *including* the sampled root — the reference stores
    `total_token - 1` internally (cnets_ours.py:733) and prepends the sample token
    (cnets_ours.py:1174); we keep the user-facing count and derive.
    """

    total_tokens: int = 30  # tree nodes incl. root => 29 drafted + 1 sampled
    depth: int = 3  # expansion steps after the root top-k
    top_k: int = 8  # beam width per expansion step
    # NOTE: the reference's `threshold` knob is intentionally absent: it is
    # dead code there (stored as log(threshold) at cnets_ours.py:735; its only
    # consumer is commented out at :990).  SpecModel.from_pretrained still
    # accepts the kwarg for call-site parity.

    @property
    def num_draft(self) -> int:
        """Drafted (non-root) node count = reference's internal total_tokens."""
        return self.total_tokens - 1

    @property
    def num_candidates(self) -> int:
        """Flat candidate pool size scored during beam expansion."""
        return self.top_k + self.top_k * self.top_k * self.depth
