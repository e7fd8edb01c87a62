"""User-facing speculative-decoding model — the reference `SpecModel` surface.

Mirrors vispec/model/spec_model_ours.py: `from_pretrained` dispatches on the HF
architecture string and loads target + draft weights (:109-177); `specgenerate`
runs vision prefill + the draft/verify loop and returns
(input_ids, new_token, idx[, acceptance_len][, decode_time]) (:247-582).

Host/device split (TPU-native): tokenization, prompt bucketing, anyres/image
planning are host integers; everything per-round is the two jitted graphs in
spec/loop.py.  Prompt lengths bucket to multiples of 128 to bound recompiles.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DraftConfig, LlamaConfig, SpecConfig
from ..models import draft as draft_mod
from ..models import llama, llava
from ..models import qwen2_5_vl as qwen_vl
from ..ops import kv_cache as kv
from . import loop as spec_loop


def _bucket(n: int, step: int = 128) -> int:
    return max(step, ((n + step - 1) // step) * step)


def _first(x):
    return x[0] if isinstance(x, list) else x


def _stub_draft_config(tcfg: LlamaConfig, num_q: int) -> DraftConfig:
    """Placeholder draft config for target-only loading (spec_model_path=None):
    sized so the unused draft cache stays tiny."""
    return DraftConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        intermediate_size=128, num_attention_heads=tcfg.num_attention_heads,
        num_key_value_heads=1, num_q=num_q,
    )


def _stub_draft_params(tparams: dict, dtype) -> dict:
    return {"embed": tparams["embed"], "layer": {},
            "fc_w": jnp.zeros((1,), dtype)}


@dataclass
class GenerationResult:
    sequences: np.ndarray  # [total_len] prompt + generated (reference input_ids)
    new_tokens: int
    rounds: int
    acceptance_lengths: List[int]
    decode_time: float


class ConversationSnapshot:
    """Post-generation KV snapshot of a finished (text-only) generation:
    committed target/draft cache rows, the per-committed-token verify hiddens,
    and the committed token ids.  A later ``specgenerate(...,
    continue_from=snap)`` whose prompt extends any committed prefix reuses the
    cached rows and only computes the suffix — turn k+1 of a multi-turn
    conversation skips re-prefilling the whole history (the reference
    re-prefills every turn, gen_spec_answer_vicuna.py:160-275)."""

    def __init__(self, t_k, t_v, d_k, d_v, hiddens, seq, prompt_len,
                 t_ks=None, t_vs=None):
        self.t_k, self.t_v, self.d_k, self.d_v = t_k, t_v, d_k, d_v
        self.t_ks, self.t_vs = t_ks, t_vs  # int8-KV per-row scales (or None)
        self.hiddens = hiddens  # [max_out, hidden] device
        self.seq = np.asarray(seq)  # committed ids (prompt + trimmed output)
        self.prompt_len = int(prompt_len)

    def cut_for(self, input_ids: np.ndarray) -> Optional[int]:
        """Longest reusable committed prefix of ``input_ids``, or None.

        Valid cuts start past the original prompt (boundary hiddens are only
        recorded for generated positions) and must leave >= 1 suffix token."""
        ids = np.asarray(input_ids)
        m = min(len(self.seq), len(ids) - 1)
        if m <= self.prompt_len:
            return None
        neq = np.nonzero(ids[:m] != self.seq[:m])[0]
        plen = int(neq[0]) if neq.size else m
        if plen <= self.prompt_len:
            return None
        return plen


class SpecModel:
    """Target + draft pair with preallocated KV runtime."""

    def __init__(
        self,
        tcfg: LlamaConfig,
        dcfg: DraftConfig,
        spec: SpecConfig,
        tparams: dict,
        dparams: dict,
        max_len: int = 2048,
        dtype=jnp.bfloat16,
        llava_cfg: Optional[llava.LlavaConfig] = None,
        vparams: Optional[dict] = None,
        eos_token_id: int = 2,
        image_token_index: Optional[int] = None,
        qwen_cfg: Optional[qwen_vl.QwenVisionConfig] = None,
        vision_start_token_id: int = 151652,
        video_token_index: Optional[int] = None,
        mparams: Optional[dict] = None,  # Medusa heads => medusa decode path
        min_pixels: int = 256 * 28 * 28,  # Qwen image budget — every reference
        max_pixels: int = 1280 * 28 * 28,  # prompt module sets these (mme_prompt.py:5-9)
        video_max_pixels: int = 768 * 28 * 28,  # per-frame video budget —
        # qwen_vl_utils VIDEO_MAX_PIXELS default; the reference's video prompts
        # override it per benchmark (mvbench_prompt.py:25: 360*420) and it must
        # match the tokenizer's video-token expansion like the image budgets do
        quantize_draft=False,  # False | True/"int8" | "int4"/"int4_head" | "mixed" | "auto"
        # | "auto" (per-matrix fastest of bf16/int8/int4, measured on-chip)
        quantize_kv: bool = False,  # int8 TARGET KV cache (per-row scales,
        # ops/kv_cache.quantize_rows): halves KV HBM + KV read bytes per round
        # — the long-context serving mode; outputs change (the cache is
        # quantized) but spec stays exactly lossless vs AR on the same cache
    ):
        self.quantize_draft = False
        self.quantize_target = False  # set by quantize_target_inplace
        self.quantize_kv = bool(quantize_kv)
        self.tcfg, self.dcfg, self.spec = tcfg, dcfg, spec
        self.tparams, self.dparams = tparams, dparams
        if quantize_draft:
            self.quantize_draft_inplace(
                "int8" if quantize_draft is True else quantize_draft)
        else:
            self._derive_fuse_mats()
        self.mparams = mparams
        self.llava_cfg, self.vparams = llava_cfg, vparams
        self.qwen_cfg = qwen_cfg
        self.vision_start_token_id = vision_start_token_id
        self.video_token_index = video_token_index
        self.min_pixels, self.max_pixels = min_pixels, max_pixels
        self.video_max_pixels = video_max_pixels
        if max_len % 128 != 0:
            raise ValueError(
                f"max_len must be a multiple of 128 (prompt buckets and the "
                f"Pallas KV blocks assume it); got {max_len}"
            )
        self.max_len = max_len
        self.dtype = dtype
        self.eos_token_id = eos_token_id
        self.image_token_index = image_token_index
        # device-side rounds per host sync (1 = sync every round)
        self.chunk_rounds = 8
        self.last_snapshot: Optional[ConversationSnapshot] = None  # set by
        # specgenerate(keep_hiddens=True)
        # single-request scratch caches are allocated LAZILY (properties
        # below): an engine/batched-only model never materializes them —
        # at 7B/1024 the idle target cache alone is ~0.55 GB, the margin
        # between fitting and OOM for serving at full weights
        self._target_cache: Optional[kv.KVCache] = None
        self._draft_cache: Optional[kv.KVCache] = None
        self._mesh = None  # set by shard_over()
        self._sp = False
        self._pp = False

    @property
    def target_cache(self) -> kv.KVCache:
        if self._target_cache is None:
            self._target_cache = kv.init_cache(
                self.tcfg.num_hidden_layers, self.tcfg.num_key_value_heads,
                self.max_len, self.tcfg.head_dim, self.dtype,
                quantized=self.quantize_kv,
            )
            if self._mesh is not None:  # shard_over() ran before first touch
                from ..parallel.sharding import shard_cache

                self._target_cache = shard_cache(
                    self._mesh, self._target_cache, pp=self._pp)
        return self._target_cache

    @target_cache.setter
    def target_cache(self, cache) -> None:
        self._target_cache = cache

    @property
    def draft_cache(self) -> kv.KVCache:
        if self._draft_cache is None:
            self._draft_cache = kv.init_cache(
                self.dcfg.num_hidden_layers, self.dcfg.num_key_value_heads,
                self.max_len, self.dcfg.head_dim, self.dtype,
            )
            if self._mesh is not None:
                from ..parallel.sharding import shard_cache

                self._draft_cache = shard_cache(self._mesh, self._draft_cache)
        return self._draft_cache

    @draft_cache.setter
    def draft_cache(self, cache) -> None:
        self._draft_cache = cache

    # ------------------------------------------------------------------
    def _derive_fuse_mats(self) -> None:
        """Precompute the request-independent decode fuse matrices into
        dparams (draft.fuse_weight_mats) so per-request state doesn't carry
        them (batched paths would stack B identical [D, D] copies)."""
        d = self.dparams
        if not d.get("layer") or getattr(d.get("fc_w"), "ndim", 0) != 2:
            return  # stub / medusa draft: no decode fuse path
        w_e, w_h = draft_mod.fuse_weight_mats(d, self.dcfg)
        self.dparams = dict(d)
        self.dparams["fuse_we"], self.dparams["fuse_wh"] = w_e, w_h

    def quantize_draft_inplace(self, mode: str = "int8") -> None:
        """Switch the draft to weight-only quantization (ops/quant.py):
        ``int8`` halves the ~2.7GB/round of draft-layer + ranking-head HBM
        traffic, ``int4`` halves it again (packed nibbles + Pallas in-VMEM
        unpack), ``int4_head`` mixes int4 ranking head with int8 layer, ``mixed`` applies
        the static per-matrix winners from the on-chip measurement table, and
        ``auto`` picks the measured-fastest of bf16/int8/int4 per matrix
        (no single representation wins everywhere — ops/quant._heuristic_repr).
        Greedy losslessness vs the target is preserved (verification stays
        exact bf16); only proposal quality (tau) can shift.  Composable with
        tp sharding via ``parallel.sharding.quantized_draft_specs`` (QTensor/
        Q4Tensor leaves get field-wise specs; tested token-identical at
        tp=2)."""
        from ..ops.quant import quantize_draft_params

        if not self.dparams.get("layer"):
            return
        base = {k: v for k, v in self.dparams.items()
                if k not in ("fuse_we", "fuse_wh")}
        self.dparams = quantize_draft_params(base, self.tparams["lm_head"],
                                             mode=mode)
        self.quantize_draft = mode
        self._derive_fuse_mats()

    def quantize_target_inplace(self, mode: str = "int8") -> None:
        """Weight-only int8 TARGET quantization (opt-in serving mode,
        ops/quant.quantize_target_params): halves the ~13.5GB/step the verify
        and AR loops stream at 7B — the structural byte floor of the decode
        round — for ~2x decode throughput and ~6.5GB of freed HBM (bigger
        serving batches).  Changes model outputs (the verifier itself is
        quantized; W8 is near-lossless in practice) but speculative decoding
        stays exactly lossless **relative to the quantized target**: spec
        output == AR output on the same weights, the same internal-consistency
        guarantee as the bf16 stack.  A draft quantized AFTER this call ranks
        with the target's own int8 head (no second lm_head copy).  Composable
        with tp/pp meshes (sharding.quantize_aware_specs) — call before
        ``shard_over``.  Not for the eval-parity path: BASELINE.md comparisons
        assume the reference's bf16-class verifier."""
        from ..ops.quant import quantize_target_params

        # vision towers stay bf16 (a ViT forward per REQUEST is noise next to
        # per-TOKEN decode bytes); embed stays bf16 too, so the shared
        # draft-embed alias is untouched.  inplace: at 7B the bf16 weights are
        # 13.5GB of a 16GB chip — a non-mutating copy keeps every bf16 matrix
        # alive (via self.tparams) until the method returns, OOMing next to
        # the 6.9GB of int8 copies; mutating frees each source as its int8
        # copy lands (the async OOM surfaces at the NEXT readback, far from
        # here — CLAUDE.md pitfall, hit on-chip at 7B/1024)
        quantize_target_params(self.tparams, mode=mode, inplace=True)
        self.quantize_target = mode

    # ------------------------------------------------------------------
    def shard_over(self, mesh, pp: bool = False, sp: bool = False) -> None:
        """Shard this model's weights and single-request KV caches over a
        ``parallel.mesh.make_mesh`` device mesh — the public-API entry to
        multi-chip inference (the reference's counterpart is HF
        ``device_map="auto"`` layer placement, gen_spec_answer_sqa.py:155).

        Default: tensor parallelism (attention heads / MLP columns over
        ``tp``, KV cache over heads).  ``pp=True`` adds layer-stage placement
        of the target — scan-stacked layer weights and the target cache shard
        by depth over ``pp``; use when one chip cannot hold the target.
        ``sp=True`` additionally shards each prompt prefill's token axis over
        the ``sp`` axis (long-prompt prefill; decode rounds stay on tp).

        The draft (quantized or not — quantized_draft_specs walks the actual
        pytree) shards over tp; the 1-layer draft never pp-shards.  Vision
        tower and medusa heads stay replicated.  Applies to the
        specgenerate/ar_generate path; batched/serving paths allocate their
        own caches and are out of scope here.  Token identity under tp/pp/sp
        meshes: tests/test_tp_inference.py."""
        from ..parallel.sharding import (
            apply_specs, llama_param_specs, llama_param_specs_pp,
            mixtral_param_specs, mixtral_param_specs_pp,
            quantize_aware_specs, quantized_draft_specs, shard_cache,
        )

        if "router" in self.tparams.get("layers", {}):
            tspecs = (mixtral_param_specs_pp(self.tcfg) if pp
                      else mixtral_param_specs(self.tcfg))
        else:
            tspecs = (llama_param_specs_pp(self.tcfg) if pp
                      else llama_param_specs(self.tcfg))
        # int8-target weights (quantize_target_inplace) expand each weight
        # spec to field-wise QTensor specs; identity on a bf16 target
        tspecs = quantize_aware_specs(tspecs, self.tparams)
        # a draft that omits its own embed aliases the target's (one buffer);
        # re-point at the SHARDED target embed so shard_over keeps the alias
        # instead of pinning the pre-shard replicated copy (or device_putting
        # the same source twice — device_put with an identical sharding is a
        # no-op, so the second apply_specs below reuses the buffer)
        embed_aliased = self.dparams.get("embed") is self.tparams.get("embed")
        self.tparams = apply_specs(mesh, self.tparams, tspecs)
        if embed_aliased:
            self.dparams = dict(self.dparams)
            self.dparams["embed"] = self.tparams["embed"]
        if self.dparams.get("layer"):
            self.dparams = apply_specs(
                mesh, self.dparams,
                quantized_draft_specs(self.dcfg, self.dparams))
        # shard only MATERIALIZED scratch caches: an engine/serving-only model
        # must never allocate them (the lazy getters apply self._mesh on
        # first touch) — at 7B the idle pair is the fit/OOM margin
        if self._target_cache is not None:
            self._target_cache = shard_cache(mesh, self._target_cache, pp=pp)
        if self._draft_cache is not None:
            self._draft_cache = shard_cache(mesh, self._draft_cache)
        self._mesh, self._sp, self._pp = mesh, sp, pp

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls,
        base_model_path: str,
        spec_model_path: str,
        total_token: int = 30,
        depth: int = 3,
        top_k: int = 8,
        threshold: float = 1.0,
        num_q: int = 2,
        max_len: int = 2048,
        dtype=jnp.bfloat16,
        method: str = "vispec",  # "vispec" | "eagle" | "medusa"
        min_pixels: int = 256 * 28 * 28,
        max_pixels: int = 1280 * 28 * 28,
        video_max_pixels: int = 768 * 28 * 28,
        quantize_draft=False,  # False | "int8"/True | "int4"/"int4_head" | "mixed" | "auto"
        quantize_kv: bool = False,  # int8 target KV cache (long-context serving)
        mesh=None,  # parallel.mesh.make_mesh: shard_over() the loaded model
        pp: bool = False,  # with mesh: layer-stage placement of the target
        sp: bool = False,  # with mesh: sequence-parallel prompt prefill
    ) -> "SpecModel":
        """Architecture dispatch + weight conversion (spec_model_ours.py:109-177;
        EAGLE/Medusa orchestrators spec_model.py / spec_model_medusa.py).

        ``mesh`` (+ ``pp``/``sp``) shards the loaded model via shard_over()
        before any autotuning — one-line multi-chip loading.

        Supported targets: LlamaForCausalLM, Qwen2ForCausalLM, MixtralForCausalLM,
        Llava(Next)ForConditionalGeneration, Qwen2_5_VLForConditionalGeneration.

        ``total_token=-1`` autotunes the verify-tree width by timing target
        forwards at candidate lengths (the reference's -1 path,
        spec_model_ours.py:179-202; see autotune_total_token).

        ``threshold`` is accepted for signature parity with the reference and
        is inert BY REFERENCE SEMANTICS: the reference stores log(threshold)
        (cnets_ours.py:735) but its only consumer is commented out
        (cnets_ours.py:990), so the parameter never affects decoding there
        either.  We keep the kwarg so reference call sites port unchanged.
        """
        del threshold  # inert in the reference too — see docstring
        from ..convert import hf as hf_convert

        with open(os.path.join(base_model_path, "config.json")) as f:
            hf_cfg = json.load(f)
        arch = hf_cfg["architectures"][0]
        autotune = total_token == -1
        if autotune:
            # placeholder sized at the largest autotune candidate so cache
            # slack is sufficient; replaced by autotune_total_token below
            total_token = 60
        spec_cfg = SpecConfig(total_tokens=total_token, depth=depth, top_k=top_k)

        llava_cfg = None
        vparams = None
        image_token_index = None
        if arch in ("LlavaForConditionalGeneration", "LlavaNextForConditionalGeneration"):
            text_cfg = hf_convert.llama_config_from_hf(hf_cfg["text_config"])
            # the reference forces 8192 positions on LLaVA (modeling_llava_next_kv.py:10-12)
            text_cfg = dataclass_replace(text_cfg, max_position_embeddings=8192)
            sd = hf_convert.load_state_dict(base_model_path)
            tparams = hf_convert.convert_llama(
                sd, text_cfg, dtype, prefix="language_model.model.",
                lm_head_key="language_model.lm_head.weight",
            )
            vcfg_raw = hf_cfg["vision_config"]
            vcfg = llava.clip_vit.ClipVisionConfig(
                hidden_size=vcfg_raw["hidden_size"],
                intermediate_size=vcfg_raw["intermediate_size"],
                num_hidden_layers=vcfg_raw["num_hidden_layers"],
                num_attention_heads=vcfg_raw["num_attention_heads"],
                image_size=vcfg_raw["image_size"],
                patch_size=vcfg_raw["patch_size"],
                feature_layer=hf_cfg.get("vision_feature_layer", -2),
            )
            pinpoints = tuple(
                tuple(p) for p in hf_cfg.get("image_grid_pinpoints", llava.DEFAULT_PINPOINTS)
            )
            llava_cfg = llava.LlavaConfig(
                text=text_cfg, vision=vcfg,
                image_token_index=hf_cfg.get("image_token_index", 32000),
                anyres=(arch == "LlavaNextForConditionalGeneration"),
                image_grid_pinpoints=pinpoints,
            )
            image_token_index = llava_cfg.image_token_index
            vparams = hf_convert.convert_clip_and_projector(sd, vcfg, dtype)
            tcfg = text_cfg
        elif arch in ("LlamaForCausalLM", "Qwen2ForCausalLM"):
            tcfg = hf_convert.llama_config_from_hf(hf_cfg)
            sd = hf_convert.load_state_dict(base_model_path)
            tparams = hf_convert.convert_llama(sd, tcfg, dtype)
        elif arch == "MixtralForCausalLM":
            # MoE target (reference modeling_mixtral_kv.py:1021)
            from ..models.mixtral import convert_mixtral

            tcfg = hf_convert.mixtral_config_from_hf(hf_cfg)
            sd = hf_convert.load_state_dict(base_model_path)
            tparams = convert_mixtral(sd, tcfg, dtype)
        elif arch == "Qwen2_5_VLForConditionalGeneration":
            model = cls._from_pretrained_qwen_vl(
                base_model_path, spec_model_path, hf_cfg, spec_cfg, num_q,
                max_len, dtype, min_pixels=min_pixels, max_pixels=max_pixels,
                video_max_pixels=video_max_pixels,
                quantize_draft=quantize_draft, quantize_kv=quantize_kv,
            )
            if mesh is not None:
                model.shard_over(mesh, pp=pp, sp=sp)
            if autotune:
                model.autotune_total_token()
            return model
        else:
            raise NotImplementedError(f"architecture {arch} not yet supported")

        if spec_model_path is None:
            # target-only mode (data generation / AR baselines without a
            # draft): stub draft params, specgenerate unavailable
            dcfg = _stub_draft_config(tcfg, num_q)
            model = cls(
                tcfg, dcfg, spec_cfg, tparams, _stub_draft_params(tparams, dtype),
                max_len=max_len, dtype=dtype, llava_cfg=llava_cfg,
                vparams=vparams, image_token_index=image_token_index,
                eos_token_id=_first(hf_cfg.get("eos_token_id", 2)),
            )
            if mesh is not None:
                model.shard_over(mesh, pp=pp, sp=sp)
            if autotune:
                model.autotune_total_token()
            return model

        dsd = hf_convert.load_state_dict(spec_model_path)
        mparams = None
        cfg_path = os.path.join(spec_model_path, "config.json")
        if os.path.exists(cfg_path):
            dcfg = DraftConfig.from_json(cfg_path, num_q=num_q)
        else:
            dcfg = DraftConfig(
                vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
                intermediate_size=tcfg.intermediate_size,
                num_attention_heads=tcfg.num_attention_heads,
                num_key_value_heads=tcfg.num_key_value_heads, num_q=num_q,
            )
        if method == "medusa":
            from ..models.medusa import convert_medusa

            mparams = convert_medusa(dsd, dtype)
            dparams = {"embed": tparams["embed"], "layer": {}, "fc_w": jnp.zeros((1,), dtype)}
        else:
            if method == "eagle":
                dcfg = dataclass_replace(dcfg, vision=False)
            dparams = hf_convert.convert_draft(
                dsd, dcfg, dtype, embed_fallback=tparams["embed"]
            )

        eos = hf_cfg.get("eos_token_id", 2)
        model = cls(
            tcfg, dcfg, spec_cfg, tparams, dparams, max_len=max_len, dtype=dtype,
            llava_cfg=llava_cfg, vparams=vparams,
            eos_token_id=eos[0] if isinstance(eos, list) else eos,
            image_token_index=image_token_index,
            mparams=mparams, quantize_draft=quantize_draft,
            quantize_kv=quantize_kv,
        )
        if mesh is not None:
            model.shard_over(mesh, pp=pp, sp=sp)
        if autotune:
            model.autotune_total_token()
        return model

    # ------------------------------------------------------------------
    @classmethod
    def _from_pretrained_qwen_vl(
        cls, base_model_path, spec_model_path, hf_cfg, spec_cfg, num_q,
        max_len, dtype, min_pixels: int = 256 * 28 * 28,
        max_pixels: int = 1280 * 28 * 28,
        video_max_pixels: int = 768 * 28 * 28, quantize_draft=False,
        quantize_kv: bool = False,
    ) -> "SpecModel":
        from ..convert import hf as hf_convert

        # the reference forces 4096 positions (modeling_qwen2_5_vl_kv.py:1758)
        text_raw = dict(hf_cfg)
        tcfg = hf_convert.llama_config_from_hf(text_raw)
        tcfg = dataclass_replace(tcfg, max_position_embeddings=4096, qkv_bias=True)
        sd = hf_convert.load_state_dict(base_model_path)
        tparams = hf_convert.convert_llama(sd, tcfg, dtype, prefix="model.")
        vraw = hf_cfg["vision_config"]
        qcfg = qwen_vl.QwenVisionConfig(
            hidden_size=vraw["hidden_size"],
            out_hidden_size=vraw.get("out_hidden_size", hf_cfg["hidden_size"]),
            intermediate_size=vraw["intermediate_size"],
            depth=vraw["depth"],
            num_heads=vraw["num_heads"],
            patch_size=vraw["patch_size"],
            temporal_patch_size=vraw["temporal_patch_size"],
            spatial_merge_size=vraw["spatial_merge_size"],
            window_size=vraw["window_size"],
            fullatt_block_indexes=tuple(vraw["fullatt_block_indexes"]),
            tokens_per_second=vraw.get("tokens_per_second", 2),
        )
        vparams = hf_convert.convert_qwen_vision(sd, qcfg, dtype)
        if spec_model_path is None:
            dcfg = _stub_draft_config(tcfg, num_q)
            dparams = _stub_draft_params(tparams, dtype)
        else:
            dcfg = DraftConfig.from_json(
                os.path.join(spec_model_path, "config.json"), num_q=num_q
            )
            dsd = hf_convert.load_state_dict(spec_model_path)
            dparams = hf_convert.convert_draft(
                dsd, dcfg, dtype, embed_fallback=tparams["embed"]
            )
        eos = hf_cfg.get("eos_token_id", 151645)
        return cls(
            tcfg, dcfg, spec_cfg, tparams, dparams, max_len=max_len, dtype=dtype,
            vparams=vparams, qwen_cfg=qcfg,
            eos_token_id=eos[0] if isinstance(eos, list) else eos,
            image_token_index=hf_cfg.get("image_token_id", 151655),
            video_token_index=hf_cfg.get("video_token_id", 151656),
            vision_start_token_id=hf_cfg.get("vision_start_token_id", 151652),
            min_pixels=min_pixels, max_pixels=max_pixels,
            video_max_pixels=video_max_pixels,
            quantize_draft=quantize_draft, quantize_kv=quantize_kv,
        )

    # ------------------------------------------------------------------
    def _cache_slack(self) -> int:
        """Rows of headroom the caches need beyond prompt+generated tokens:
        the verify tree block (target cache) and the draft's beam scratch
        (depth*top_k) plus the padded accepted-append block (depth+2)."""
        draft_scratch = self.spec.depth * self.spec.top_k + self.spec.depth + 2
        return max(self.spec.total_tokens, draft_scratch) + 10

    # ------------------------------------------------------------------
    def autotune_total_token(self, cans=(40, 48, 50, 56, 60),
                             weights=(1.0, 1.05, 1.07, 1.1, 1.13),
                             iters: int = 20) -> int:
        """Pick total_token by timing target forwards at candidate tree widths
        (the reference's total_token == -1 path, spec_model_ours.py:179-202):
        run ``iters`` forwards of each candidate width, divide by the expected
        acceptance uplift ``weights``, keep the argmin."""
        import time as _time

        from ..ops.attention import causal_mask

        times = []
        cache = kv.reset(self.target_cache)
        for length in cans:
            ids = jnp.asarray(
                np.random.default_rng(0).integers(
                    0, max(2, self.tcfg.vocab_size - 200), length
                ),
                jnp.int32,
            )
            embeds = llama.embed(self.tparams, ids)

            @jax.jit
            def fwd(embeds, cache):
                mask = causal_mask(embeds.shape[0], cache.max_len, 0)
                pos = jnp.arange(embeds.shape[0], dtype=jnp.int32)
                h, _ = spec_loop.target_forward(
                    self.tparams, self.tcfg, embeds, pos, cache, mask
                )
                return h

            # Force a SCALAR READBACK after each timed chain: through the axon
            # tunnel block_until_ready alone can return before device work
            # completes (CLAUDE.md measurement pitfalls — the 57 TB/s probe),
            # so a readback-free timer would pick total_token from noise.  The
            # device executes dispatches in order, so one trailing scalar read
            # fences the whole chain.
            float(fwd(embeds, cache)[0, 0])  # warmup + fence
            t0 = _time.perf_counter()
            for _ in range(iters):
                out = fwd(embeds, cache)
            float(out[0, 0])  # fence: forces the chain's completion
            times.append((_time.perf_counter() - t0) / weights[cans.index(length)])
        best = cans[times.index(min(times))]
        self.spec = dataclass_replace(self.spec, total_tokens=best)
        return best

    # ------------------------------------------------------------------
    def _seen_mask(self, sampling, input_ids):
        """[vocab+1] prompt-token mask when the repetition penalty is live
        (T>0 and penalty != 1 — the reference's prepare_logits_processor gate,
        utils.py:45-50); None otherwise so the hot path carries nothing."""
        if sampling.greedy or sampling.repetition_penalty == 1.0:
            return None
        from ..ops.sampling import seen_mask

        return jnp.asarray(seen_mask(self.tcfg.vocab_size, input_ids))

    # ------------------------------------------------------------------
    def count_image_tokens(self, image_size: Tuple[int, int]) -> int:
        """Number of <image> placeholder tokens one image of this size expands
        to — must agree with the vision path's feature count.  Mirrors what
        the HF processor's token expansion computes (the reference relies on
        the processor, e.g. ge_data_all_llava_pretrain_gen.py:136-137)."""
        oh, ow = image_size
        if self.llava_cfg is not None:
            if self.llava_cfg.anyres:
                return llava.plan_anyres(oh, ow, self.llava_cfg).n_tokens
            return self.llava_cfg.patches_per_side ** 2
        if self.qwen_cfg is not None:
            rh, rw = qwen_vl.smart_resize(
                oh, ow, min_pixels=self.min_pixels, max_pixels=self.max_pixels
            )
            q = self.qwen_cfg
            return (rh // q.patch_size) * (rw // q.patch_size) // q.merge_unit
        raise ValueError("not a vision model")

    # ------------------------------------------------------------------
    def _prompt_embeds(
        self,
        input_ids: np.ndarray,  # [L]
        pixel_values: Optional[jax.Array] = None,  # [H, W, 3] in [0,1]
        image_size: Optional[Tuple[int, int]] = None,
        pixel_values_videos: Optional[jax.Array] = None,  # [T, H, W, 3] (Qwen)
        second_per_grid_ts: float = 1.0,
    ) -> Tuple[jax.Array, Optional[np.ndarray], Optional[jax.Array], int]:
        """Token embeds with vision features scattered in; returns
        (embeds [L, D], image_mask [L] or None, position_ids or None,
        rope_delta)."""
        ids = jnp.asarray(input_ids, jnp.int32)
        embeds = llama.embed(self.tparams, ids)
        image_mask = None
        position_ids = None
        rope_delta = 0
        images, sizes = _as_image_list(pixel_values, image_size)
        if images and self.llava_cfg is not None:
            assert self.vparams is not None
            # multi-image prompts: encode each image, concatenate features in
            # prompt order (the reference iterates image features into the
            # scatter, spec_model_ours.py:311-378; the draft plan already
            # handles multiple spans via max_images)
            feats_parts = []
            for img, isz in zip(images, sizes):
                oh, ow = isz if isz is not None else img.shape[:2]
                if self.llava_cfg.anyres:
                    plan = llava.plan_anyres(oh, ow, self.llava_cfg)
                    tiles = llava.preprocess_anyres(img, plan, self.llava_cfg)
                else:
                    plan = None
                    size = self.llava_cfg.vision.image_size
                    tiles = llava.normalize(
                        llava.resize_image(img, size, size)
                    )[None]
                feats_parts.append(
                    llava.encode_image(self.vparams, self.llava_cfg, tiles, plan)
                )
            feats = (feats_parts[0] if len(feats_parts) == 1
                     else jnp.concatenate(feats_parts, axis=0))
            positions = np.nonzero(np.asarray(input_ids) == self.image_token_index)[0]
            if positions.size != feats.shape[0]:
                raise ValueError(
                    f"image token count {positions.size} != features {feats.shape[0]}"
                )
            embeds = llava.merge_image_embeds(
                embeds, feats, jnp.asarray(positions, jnp.int32)
            )
            image_mask = np.asarray(input_ids) == self.image_token_index
        elif self.qwen_cfg is not None:
            qcfg = self.qwen_cfg
            grids = []
            spgs = []
            if pixel_values_videos is not None:
                # video path (reference spec_model_ours.py:422-453): frames
                # resized uniformly, temporal patching in pairs, features merged
                # at video-token positions; the draft's special_image_mask is
                # the video mask (:453)
                t, oh, ow = pixel_values_videos.shape[:3]
                rh, rw = qwen_vl.smart_resize(
                    oh, ow, max_pixels=int(self.video_max_pixels)
                )
                frames = jax.image.resize(
                    pixel_values_videos, (t, rh, rw, 3), method="bicubic"
                )
                patches = qwen_vl.patchify_video(frames, qcfg)
                tt = (t + qcfg.temporal_patch_size - 1) // qcfg.temporal_patch_size
                grid = (tt, rh // qcfg.patch_size, rw // qcfg.patch_size)
                grids = [grid]
                spgs = [second_per_grid_ts]
                n_pat = patches.shape[0]
                pad_pat = _bucket(n_pat, 64)
                patches = jnp.pad(patches, ((0, pad_pat - n_pat), (0, 0)))
                vplan = qwen_vl.plan_vision(grids, qcfg, pad_pat)
                feats = qwen_vl.forward(self.vparams, qcfg, patches, vplan)
                feats = feats[: vplan.n_merged]
                positions = np.nonzero(
                    np.asarray(input_ids) == self.video_token_index
                )[0]
                if positions.size != vplan.n_merged:
                    raise ValueError(
                        f"video token count {positions.size} != merged "
                        f"features {vplan.n_merged}"
                    )
                embeds = llava.merge_image_embeds(
                    embeds, feats, jnp.asarray(positions, jnp.int32)
                )
                image_mask = np.asarray(input_ids) == self.video_token_index
            elif images:
                # pixel budgets must match the HF processor's so the tokenizer's
                # image-token expansion agrees with the device-side resize
                # (reference sets them in every prompt module, mme_prompt.py:5-9);
                # multiple images run as one ViT batch over a grid list
                # (plan_vision natively handles several grids)
                patches_parts = []
                for img, isz in zip(images, sizes):
                    oh, ow = isz if isz is not None else img.shape[:2]
                    rh, rw = qwen_vl.smart_resize(
                        oh, ow, min_pixels=self.min_pixels,
                        max_pixels=self.max_pixels,
                    )
                    resized = jax.image.resize(img, (rh, rw, 3), method="bicubic")
                    patches_parts.append(qwen_vl.patchify_image(resized, qcfg))
                    grids.append((1, rh // qcfg.patch_size, rw // qcfg.patch_size))
                patches = (patches_parts[0] if len(patches_parts) == 1
                           else jnp.concatenate(patches_parts, axis=0))
                n_pat = patches.shape[0]
                pad_pat = _bucket(n_pat, 64)
                patches = jnp.pad(patches, ((0, pad_pat - n_pat), (0, 0)))
                vplan = qwen_vl.plan_vision(grids, qcfg, pad_pat)
                feats = qwen_vl.forward(self.vparams, qcfg, patches, vplan)
                feats = feats[: vplan.n_merged]
                positions = np.nonzero(
                    np.asarray(input_ids) == self.image_token_index
                )[0]
                if positions.size != vplan.n_merged:
                    raise ValueError(
                        f"image token count {positions.size} != merged "
                        f"features {vplan.n_merged}"
                    )
                embeds = llava.merge_image_embeds(
                    embeds, feats, jnp.asarray(positions, jnp.int32)
                )
                image_mask = np.asarray(input_ids) == self.image_token_index
            pos_np, rope_delta = qwen_vl.get_rope_index_host(
                np.asarray(input_ids), grids, qcfg,
                self.image_token_index or -1, self.video_token_index or -2,
                self.vision_start_token_id,
                second_per_grid_ts=spgs if pixel_values_videos is not None else (),
            )
            position_ids = pos_np  # [3, L] numpy; padded by caller
        return embeds, image_mask, position_ids, rope_delta

    # ------------------------------------------------------------------
    def _padded_prompt(self, input_ids, pad_len, pixel_values=None,
                       image_size=None, pixel_values_videos=None,
                       second_per_grid_ts: float = 1.0):
        """Vision-merged embeds padded to ``pad_len`` with the M-RoPE position
        counter continued over the padding, plus the SHIFTED image mask
        (cnets_ours.py:880) and its span count.  One implementation shared by
        specgenerate, specgenerate_batch, and train.data_gen."""
        ids = np.asarray(input_ids, np.int64)
        l = int(ids.shape[0])
        embeds, image_mask, position_ids, rope_delta = self._prompt_embeds(
            ids, pixel_values, image_size, pixel_values_videos,
            second_per_grid_ts,
        )
        embeds = jnp.pad(embeds, ((0, pad_len - l), (0, 0)))
        if position_ids is not None:
            cont = position_ids[:, -1:] + 1 + np.arange(pad_len - l)[None, :]
            position_ids = jnp.asarray(
                np.concatenate([position_ids, cont], axis=1), jnp.int32
            )
        shifted = image_mask[1:] if image_mask is not None else None
        n_spans = 0
        if shifted is not None:
            m = np.asarray(shifted, bool)
            n_spans = int((m & ~np.concatenate([[False], m[:-1]])).sum())
        return embeds, image_mask, shifted, n_spans, position_ids, rope_delta

    # ------------------------------------------------------------------
    def specgenerate(
        self,
        input_ids: Sequence[int],
        temperature: float = 0.0,
        top_p: float = 0.0,
        top_k: int = 0,
        max_new_tokens: int = 512,
        pixel_values=None,
        image_size=None,
        pixel_values_videos=None,
        second_per_grid_ts: float = 1.0,
        seed: int = 0,
        log: bool = False,
        stop_token_id: Optional[int] = None,  # extra stop id (the reference's
        # is_llama3 <|eot_id|> path, spec_model_ours.py:268-269, 540-542)
        repetition_penalty: float = 1.0,  # utils.py:41-50 (active at T>0, as
        # the reference's prepare_logits_processor gate :45-50)
        keep_hiddens: bool = False,  # record a ConversationSnapshot into
        # self.last_snapshot after generation (text-only prompts)
        continue_from: Optional[ConversationSnapshot] = None,  # reuse a prior
        # generation's committed KV when this prompt extends it (multi-turn)
    ) -> GenerationResult:
        input_ids = np.asarray(input_ids, np.int64)
        l = int(input_ids.shape[0])
        if l == 0:
            raise ValueError("input_ids must be non-empty")
        pad_len = _bucket(l)
        if pad_len > self.max_len or l + self._cache_slack() > self.max_len:
            raise ValueError(
                f"prompt length {l} (bucketed {pad_len}) too long for "
                f"max_len={self.max_len} (need {self._cache_slack()} rows of "
                f"tree/scratch headroom)"
            )
        sampling = spec_loop.SamplingParams(temperature, top_p, int(top_k),
                                            float(repetition_penalty))
        seen = self._seen_mask(sampling, input_ids)
        if seen is not None and self.mparams is not None:
            raise NotImplementedError(
                "repetition_penalty is not supported with the medusa drafter")

        from ..models.medusa import NUM_HEADS

        pad_block = max(self.spec.depth + 2, NUM_HEADS + 1)
        max_out = min(self.max_len, max_new_tokens + 2 * pad_block)
        text_only = pixel_values is None and pixel_values_videos is None
        snapshots_on = keep_hiddens and text_only and self.mparams is None

        state = None
        if (continue_from is not None and text_only and self.mparams is None):
            plen = continue_from.cut_for(input_ids)
            # the suffix block is written at row plen — guard the same
            # prefix+suffix+slack budget ServingEngine enforces, else XLA's
            # clamped dynamic_update_slice would silently overwrite committed
            # prefix KV near a full cache; an oversized suffix falls back to
            # the full prefill (whose own length check raises cleanly)
            if plen is not None and (
                    plen + _bucket(l - plen, 128) + self._cache_slack()
                    <= self.max_len):
                state = self._prefill_from_snapshot(
                    continue_from, input_ids, plen, sampling, seed, max_out,
                    seen=seen, keep_hiddens=snapshots_on,
                )
        if state is None:
            embeds, _, shifted_mask, n_spans, position_ids, rope_delta = \
                self._padded_prompt(input_ids, pad_len, pixel_values, image_size,
                                    pixel_values_videos, second_per_grid_ts)
            if self._sp:
                from ..parallel.sharding import sp_shard_prefill

                if position_ids is None:
                    embeds = sp_shard_prefill(self._mesh, embeds)
                else:
                    embeds, position_ids = sp_shard_prefill(
                        self._mesh, embeds, position_ids)
            # bucket the image-span count (the reference draft handles arbitrarily
            # many spans, cnets_ours.py:896-956); 4-step buckets bound recompiles
            max_images = max(4, -(-n_spans // 4) * 4)
            plan, max_span = draft_mod.make_prefill_plan(
                shifted_mask, l, self.dcfg.num_q, pad_len,
                max_images=max_images, max_span=_bucket(1, 64),
            )
            max_span = _bucket(max_span, 64)

            target_cache = kv.reset(self.target_cache)
            draft_cache = kv.reset(self.draft_cache)

            if self.mparams is not None:
                state = spec_loop.medusa_prefill(
                    self.tparams, self.mparams, self.tcfg, self.spec, sampling,
                    embeds, jnp.asarray(l, jnp.int32), target_cache,
                    jax.random.PRNGKey(seed), max_out,
                )
            else:
                state = spec_loop.spec_prefill_donated(
                    self.tparams, self.dparams, self.tcfg, self.dcfg, self.spec, plan,
                    sampling, embeds, target_cache, draft_cache,
                    jax.random.PRNGKey(seed), max_out, max_span,
                    position_ids=position_ids,
                    rope_delta=jnp.asarray(rope_delta, jnp.int32),
                    seen=seen,
                    keep_hiddens=snapshots_on,
                )
        # cap rounds so the cache cannot overflow
        budget = min(max_new_tokens, self.max_len - l - self._cache_slack())
        t0 = time.perf_counter()
        accept_lengths: List[int] = []
        rounds = 0
        eos = jnp.asarray(self.eos_token_id, jnp.int32)
        cap = jnp.asarray(budget, jnp.int32)
        def one_round(state):
            if self.mparams is not None:
                return spec_loop.medusa_decode_round(
                    self.tparams, self.mparams, self.tcfg, self.spec,
                    sampling, state, eos, cap,
                )
            return spec_loop.decode_round(
                self.tparams, self.dparams, self.tcfg, self.dcfg, self.spec,
                sampling, state, eos, cap,
            )

        if self.chunk_rounds > 1:
            # Pipelined decoding: dispatch a chunk of rounds asynchronously,
            # stack their device-side counters, and read the PREVIOUS batch's
            # counters while the current batch executes — the host↔TPU read
            # round-trip (~25 ms over the tunnel) fully overlaps execution
            # instead of serializing after every round.  The in-graph done
            # latch (decode_round caps new_token) makes the dispatch
            # lookahead safe.
            #
            # Adaptive tail: chunks start at ``chunk_rounds`` but shrink as
            # the running tokens-per-round estimate says generation is about
            # to finish — a latched (done) round still executes a FULL ~20 ms
            # verify by design (latch_done only freezes cursors), so blindly
            # dispatching whole chunks wastes up to 2·chunk_rounds verifies
            # per request; at τ≈3 that was ~60% of a 96-token generation.
            # Each live round commits ≥ 1 token, so ``budget + 1`` dispatched
            # rounds is also a hard upper bound (the +1 latch detector).
            prev = 0
            pending = None
            stop = False
            dispatched = 0

            def process(vals) -> bool:
                nonlocal prev, rounds
                for c in np.asarray(vals):
                    if int(c) == prev:  # latched round => generation done
                        return True
                    accept_lengths.append(int(c) - prev - 1)
                    prev = int(c)
                    rounds += 1
                return False

            while not stop:
                remaining = budget - prev
                if remaining <= 0 and pending is None:
                    break
                in_flight = dispatched - rounds
                toks_per_round = (prev / rounds) if rounds else 1.0
                est = -(-max(remaining, 0) // max(int(toks_per_round), 1))
                n = min(self.chunk_rounds, est + 1 - in_flight,
                        budget + 1 - dispatched)
                if n <= 0:
                    if pending is None:
                        break
                    stop = process(pending)
                    pending = None
                    continue
                counters = []
                for _ in range(n):
                    state = one_round(state)
                    # .copy(): the next round DONATES state, deleting the
                    # buffer this counter aliases
                    counters.append(state.new_token.copy())
                dispatched += n
                batch_dev = jnp.stack(counters)
                if pending is not None:
                    stop = process(pending)
                pending = batch_dev
                if not stop and stop_token_id is not None:
                    # rare path (extra stop ids): requires a synced read
                    out_now = np.asarray(state.output)[: int(state.out_len)]
                    if (out_now == stop_token_id).any():
                        break
            if pending is not None and not stop:
                process(pending)
        else:
            while True:
                prev = int(state.new_token)
                state = one_round(state)
                rounds += 1
                accept_lengths.append(int(state.new_token) - prev - 1)
                if bool(state.done) or rounds >= budget:
                    break
                if stop_token_id is not None:
                    out_now = np.asarray(state.output)[: int(state.out_len)]
                    if (out_now == stop_token_id).any():
                        break
        decode_time = time.perf_counter() - t0

        out_len = int(state.out_len)
        out = np.asarray(state.output)[:out_len]
        # trim at EOS (the reference stops the loop but keeps the full round's
        # tokens in input_ids; we match by keeping tokens up to and incl. EOS)
        stops = (out == self.eos_token_id)
        if stop_token_id is not None:
            stops |= out == stop_token_id
        eos_pos = np.nonzero(stops)[0]
        if eos_pos.size:
            out = out[: eos_pos[0] + 1]
        seq = np.concatenate([input_ids, out])
        if snapshots_on and state.hiddens is not None:
            # slice out the committed rows NOW: the caches below are donated
            # to the next call's prefill, but slices are fresh buffers
            pad = _bucket(l + int(out.shape[0]))
            tc, dc = state.target_cache, state.draft_cache
            self.last_snapshot = ConversationSnapshot(
                t_k=tc.k[:, :, :pad], t_v=tc.v[:, :, :pad],
                d_k=dc.k[:, :, :pad], d_v=dc.v[:, :, :pad],
                hiddens=state.hiddens, seq=seq, prompt_len=l,
                t_ks=None if tc.k_scale is None else tc.k_scale[:, :, :pad],
                t_vs=None if tc.v_scale is None else tc.v_scale[:, :, :pad],
            )
        # persist caches for reuse (buffer reuse across calls)
        self.target_cache = kv.reset(state.target_cache)
        self.draft_cache = kv.reset(state.draft_cache)
        return GenerationResult(
            sequences=seq,
            new_tokens=int(out.shape[0]),
            rounds=rounds,
            acceptance_lengths=accept_lengths,
            decode_time=decode_time,
        )

    # ------------------------------------------------------------------
    def _prefill_from_snapshot(self, snap: ConversationSnapshot, input_ids,
                               plen: int, sampling, seed: int, max_out: int,
                               seen=None, keep_hiddens: bool = False):
        """Continuation prefill from a post-generation ConversationSnapshot:
        seed the caches with the committed rows [0, plen) and run only the
        suffix through the target (spec_loop.spec_prefill_continue).  ``seen``
        (repetition-penalty mask, built from the FULL conversation ids) rides
        along so prefix caching composes with the penalty."""
        ids = np.asarray(input_ids, np.int64)
        suffix = ids[plen:]
        pad_s = _bucket(len(suffix), 128)
        s_embeds = llama.embed(self.tparams, jnp.asarray(suffix, jnp.int32))
        s_embeds = jnp.pad(s_embeds, ((0, pad_s - len(suffix)), (0, 0)))
        psnap = spec_loop.PrefixSnapshot(
            t_k=snap.t_k, t_v=snap.t_v, d_k=snap.d_k, d_v=snap.d_v,
            prefix_len=jnp.asarray(plen, jnp.int32),
            boundary_hidden=snap.hiddens[plen - 1 - snap.prompt_len],
            t_ks=snap.t_ks, t_vs=snap.t_vs,
        )
        return spec_loop.spec_prefill_continue_donated(
            self.tparams, self.dparams, self.tcfg, self.dcfg, self.spec,
            sampling, psnap, s_embeds, jnp.asarray(len(suffix), jnp.int32),
            kv.reset(self.target_cache), kv.reset(self.draft_cache),
            jax.random.PRNGKey(seed), max_out, seen=seen,
            keep_hiddens=keep_hiddens,
        )

    # ------------------------------------------------------------------
    def specgenerate_batch(
        self,
        requests: Sequence[dict],
        temperature: float = 0.0,
        max_new_tokens: int = 256,
        seed: int = 0,
        top_p: float = 0.0,
        top_k: int = 0,
    ) -> List[GenerationResult]:
        """Batched multi-request decoding (beyond the reference's bs=1 design,
        utils.py:541): each request dict carries ``input_ids`` and optionally
        ``pixel_values`` / ``image_size``.  Vision requests run the same
        tower/merge path as specgenerate; all requests share one pad bucket so
        the whole batch hits one compiled prefill + one batched round graph.
        Finished requests are frozen in place until the batch drains."""
        from . import batch as batch_mod

        sampling = spec_loop.SamplingParams(temperature, top_p, int(top_k))
        slack = self._cache_slack()
        lens = [len(np.asarray(r["input_ids"])) for r in requests]
        pad = _bucket(max(lens))
        if pad > self.max_len or max(lens) + slack > self.max_len:
            raise ValueError(f"longest prompt {max(lens)} too long for "
                             f"max_len={self.max_len} (slack {slack})")

        prepared = []
        spans = []
        for r in requests:
            ids = np.asarray(r["input_ids"], np.int64)
            embeds, _, shifted, n_spans, position_ids, rope_delta = \
                self._padded_prompt(
                    ids, pad, r.get("pixel_values"), r.get("image_size"),
                    r.get("pixel_values_videos"),
                    r.get("second_per_grid_ts", 1.0),
                )
            spans.append(n_spans)
            prepared.append(dict(ids=ids, embeds=embeds, shifted=shifted,
                                 position_ids=position_ids,
                                 rope_delta=jnp.asarray(rope_delta, jnp.int32)))

        if self.mparams is not None:
            # medusa: no draft transformer, no prefill plan — heads run on
            # the target's hidden (spec_loop.medusa_prefill)
            reqs = [dict(embeds=p["embeds"], real_len=len(p["ids"]))
                    for p in prepared]
        else:
            # shared plan buckets across the batch -> one compiled graph
            max_images = max(4, -(-max(spans) // 4) * 4)
            reqs = []
            max_span_req = 64
            plans = []
            for p in prepared:
                plan, ms = draft_mod.make_prefill_plan(
                    p["shifted"], len(p["ids"]), self.dcfg.num_q, pad,
                    max_images=max_images, max_span=_bucket(1, 64),
                )
                plans.append(plan)
                max_span_req = max(max_span_req, _bucket(ms, 64))
            for p, plan in zip(prepared, plans):
                if max_span_req > 64:  # re-plan at the shared span bucket
                    plan, _ = draft_mod.make_prefill_plan(
                        p["shifted"], len(p["ids"]), self.dcfg.num_q, pad,
                        max_images=max_images, max_span=max_span_req,
                    )
                reqs.append(dict(embeds=p["embeds"], real_len=len(p["ids"]),
                                 plan=plan, max_span=max_span_req,
                                 position_ids=p["position_ids"],
                                 rope_delta=p["rope_delta"]))

        from ..models.medusa import NUM_HEADS

        pad_block = max(self.spec.depth + 2, NUM_HEADS + 1)
        max_out = min(self.max_len, max_new_tokens + 2 * pad_block)
        if not hasattr(self, "_batch_pool"):
            self._batch_pool = []
        states = batch_mod.batched_prefill(
            self.tparams, self.dparams, self.tcfg, self.dcfg, self.spec,
            sampling, reqs, self.max_len, max_out, self.dtype, seed,
            cache_pool=self._batch_pool, mparams=self.mparams,
            quantize_kv=self.quantize_kv,
        )
        # decode_time excludes prefill — same semantics as specgenerate
        t0 = time.perf_counter()
        budget = min(max_new_tokens, self.max_len - max(lens) - slack)
        states, accepts = batch_mod.drain_batch(
            self.tparams, self.dparams, self.tcfg, self.dcfg, self.spec,
            sampling, states, budget, self.eos_token_id, self.chunk_rounds,
            mparams=self.mparams,
        )
        decode_time = time.perf_counter() - t0

        results = []
        for b, r in enumerate(requests):
            out_len = int(states.out_len[b])
            toks = np.asarray(states.output[b])[:out_len]
            epos = np.nonzero(toks == self.eos_token_id)[0]
            if epos.size:
                toks = toks[: epos[0] + 1]
            toks = toks[:max_new_tokens]
            results.append(GenerationResult(
                sequences=np.concatenate(
                    [np.asarray(r["input_ids"], np.int64), toks]),
                new_tokens=int(toks.shape[0]),
                rounds=len(accepts[b]),
                acceptance_lengths=accepts[b],
                decode_time=decode_time,
            ))
        return results

    # ------------------------------------------------------------------
    def serving_engine(self, batch_size: int, **kw):
        """Continuous-batching engine over this model (spec/serving.py):
        fixed decode slots, queued requests admitted as slots free up."""
        from .serving import ServingEngine

        return ServingEngine(self, batch_size, **kw)

    # ------------------------------------------------------------------
    def ar_generate(
        self,
        input_ids: Sequence[int],
        temperature: float = 0.0,
        top_p: float = 0.0,
        top_k: int = 0,
        max_new_tokens: int = 512,
        pixel_values=None,
        image_size=None,
        pixel_values_videos=None,
        second_per_grid_ts: float = 1.0,
        seed: int = 0,
        repetition_penalty: float = 1.0,
    ) -> GenerationResult:
        """Plain AR baseline over the same runtime (gen_baseline_answer_*.py)."""
        input_ids = np.asarray(input_ids, np.int64)
        l = int(input_ids.shape[0])
        if l == 0:
            raise ValueError("input_ids must be non-empty")
        pad_len = _bucket(l)
        if pad_len > self.max_len or l + 2 > self.max_len:
            raise ValueError(
                f"prompt length {l} (bucketed {pad_len}) too long for "
                f"max_len={self.max_len}"
            )
        sampling = spec_loop.SamplingParams(temperature, top_p, int(top_k),
                                            float(repetition_penalty))
        seen = self._seen_mask(sampling, input_ids)
        embeds, _, position_ids, rope_delta = self._prompt_embeds(
            input_ids, pixel_values, image_size, pixel_values_videos,
            second_per_grid_ts,
        )
        embeds = jnp.pad(embeds, ((0, pad_len - l), (0, 0)))
        if position_ids is not None:
            cont = position_ids[:, -1:] + 1 + np.arange(pad_len - l)[None, :]
            position_ids = jnp.asarray(
                np.concatenate([position_ids, cont], axis=1), jnp.int32
            )
        if self._sp:
            from ..parallel.sharding import sp_shard_prefill

            if position_ids is None:
                embeds = sp_shard_prefill(self._mesh, embeds)
            else:
                embeds, position_ids = sp_shard_prefill(
                    self._mesh, embeds, position_ids)
        cache = kv.reset(self.target_cache)
        key = jax.random.PRNGKey(seed)
        tok, cache, key, seen = spec_loop.ar_prefill_donated(
            self.tparams, self.tcfg, sampling, embeds,
            jnp.asarray(l, jnp.int32), cache, key, position_ids=position_ids,
            seen=seen,
        )
        t0 = time.perf_counter()
        out = [int(tok)]
        chunk = self.chunk_rounds  # read-batch size (host sync ~25 ms RTT)
        # headroom for one lookahead batch of steps past eos/budget
        budget = min(max_new_tokens, self.max_len - l - 2 * chunk - 2)
        if budget <= 0:
            # near-context-limit prompt: shrink the pipeline to 1-step batches
            # instead of silently emitting only the prefill token
            chunk = 1
            budget = min(max_new_tokens, self.max_len - l - 4)
        delta = jnp.asarray(rope_delta, jnp.int32)
        # Pipelined AR baseline: dispatch ``chunk`` solo steps asynchronously
        # (dispatch ~1 ms each overlaps the ~20 ms execution), stack the
        # device tokens, and read the PREVIOUS batch while this one executes.
        # Each step emits exactly one token, so total dispatches are capped
        # at the step budget — blindly dispatching whole lookahead chunks
        # past it wasted up to 2·chunk full ~20 ms forwards per generation
        # (eos early-exit still over-runs by the in-flight chunk; that part
        # is the price of pipelining).
        pending = None
        stop = out[-1] == self.eos_token_id
        dispatched = 0

        def process(vals) -> bool:
            for t in np.asarray(vals):
                out.append(int(t))
                if int(t) == self.eos_token_id or len(out) >= budget:
                    return True
            return False

        while not stop:
            n = min(chunk, (budget - 1) - dispatched)
            if n <= 0:
                if pending is None:
                    break
                stop = process(pending)
                pending = None
                continue
            toks = []
            for _ in range(n):
                tok, cache, key, seen = spec_loop.ar_step(
                    self.tparams, self.tcfg, sampling, tok, cache, key,
                    rope_delta=delta, seen=seen,
                )
                toks.append(tok)
            dispatched += n
            batch_dev = jnp.stack(toks)
            if pending is not None:
                stop = process(pending)
            pending = batch_dev
        if pending is not None and not stop:
            process(pending)
        out = out[:max_new_tokens]
        decode_time = time.perf_counter() - t0
        self.target_cache = kv.reset(cache)
        return GenerationResult(
            sequences=np.concatenate([input_ids, np.asarray(out, np.int64)]),
            new_tokens=len(out),
            rounds=len(out),
            acceptance_lengths=[],
            decode_time=decode_time,
        )


def dataclass_replace(obj, **kwargs):
    import dataclasses

    return dataclasses.replace(obj, **kwargs)


def _as_image_list(pixel_values, image_size):
    """Normalize single-image / list-of-images inputs to parallel lists
    (multi-image prompts, reference spec_model_ours.py:311-378)."""
    if pixel_values is None:
        return [], []
    if isinstance(pixel_values, (list, tuple)):
        if image_size is None:
            sizes = [None] * len(pixel_values)
        elif isinstance(image_size, (list, tuple)) and (
            not image_size or isinstance(image_size[0], (list, tuple))
        ):
            sizes = list(image_size)
        else:
            raise ValueError("image_size must be a list of (h, w) when "
                             "pixel_values is a list")
        if len(sizes) != len(pixel_values):
            raise ValueError("len(image_size) != len(pixel_values)")
        return list(pixel_values), sizes
    return [pixel_values], [image_size]
