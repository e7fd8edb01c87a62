"""Training-data generation: target-model continuations with hidden-state capture.

Reference layer L5 (SURVEY.md §2.5): ge_data_all_{llava,qwen}_pretrain_gen.py run
``bigmodel.generate(output_hidden_states=True)`` on image prompts (with a
"Please answer with at least 1000 words." suffix to elicit long outputs,
ge_data_all_llava_pretrain_gen.py:80-85), concatenate per-step last-layer
hiddens, and save {inputs_embeds, hidden_state, loss_mask, image_mask} per
sample (:141-166).  The anti-shortcut property — the draft trains on text the
*target generated*, never ground truth — lives here.

TPU-native: one jitted prefill + a jitted AR step that also returns the last
hidden state; samples stream to .npz shards (the torch .ckpt equivalent).
Process-level sharding replaces the reference's per-GPU subprocess fan-out
(allocation_*.py): run N processes with disjoint [start, end) ranges.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import LlamaConfig
from ..models import llama
from ..ops import kv_cache as kv
from ..ops.attention import causal_mask


@functools.partial(jax.jit, static_argnames=("tcfg",))
def _prefill_with_hidden(tparams, tcfg: LlamaConfig, embeds, real_len, cache,
                         position_ids=None):
    pad_len = embeds.shape[0]
    pos = jnp.arange(pad_len, dtype=jnp.int32) if position_ids is None else position_ids
    mask = causal_mask(pad_len, cache.max_len, 0)
    # seq_len: the dynamic-NTK stretch must use the REAL prompt length, same
    # as the inference prefills — otherwise the saved hidden-state training
    # targets use a different theta than the model produces at inference
    hidden, cache = llama.forward_hidden(tparams, tcfg, embeds, pos, cache,
                                         mask, seq_len=real_len)
    cache = kv.advance(cache, real_len)
    logits = llama.lm_head(tparams, jnp.take(hidden, real_len - 1, axis=0))
    return hidden, jnp.argmax(logits).astype(jnp.int32), cache


@functools.partial(jax.jit, static_argnames=("tcfg",), donate_argnames=("cache",))
def _step_with_hidden(tparams, tcfg: LlamaConfig, token, cache, rope_delta=None):
    embeds = llama.embed(tparams, token[None])
    cols = jnp.arange(cache.max_len, dtype=jnp.int32)
    mask = (cols <= cache.length)[None, :]
    pos = cache.length[None]
    if rope_delta is not None:
        pos = pos + jnp.asarray(rope_delta, jnp.int32)
    if tcfg.mrope_section is not None:
        # Qwen M-RoPE decode: 1-D counter + rope_delta broadcast over the 3
        # streams (reference utils.py:398-402)
        pos = jnp.broadcast_to(pos[None], (3, 1))
    hidden, cache = llama.forward_hidden(
        tparams, tcfg, embeds, pos, cache, mask, seq_len=cache.length + 1
    )
    cache = kv.advance(cache, 1)
    logits = llama.lm_head(tparams, hidden[0])
    return hidden[0], jnp.argmax(logits).astype(jnp.int32), cache


@functools.partial(
    jax.jit, static_argnames=("tcfg", "chunk"), donate_argnames=("cache",)
)
def _scan_steps_with_hidden(tparams, tcfg: LlamaConfig, token, cache, chunk: int,
                            rope_delta):
    """``chunk`` greedy AR steps as one dispatched ``lax.scan``.

    Per step the scan stacks the step's INPUT token, that token's embedding,
    and the hidden state the step produced — exactly the per-token record the
    reference's ``generate(..., output_hidden_states=True)`` loop accumulates
    (ge_data_all_llava_pretrain_gen.py:141-153) — so the host only reads
    results, never participates in the generation chain."""

    def body(carry, _):
        token, cache = carry
        embeds = llama.embed(tparams, token[None])
        cols = jnp.arange(cache.max_len, dtype=jnp.int32)
        mask = (cols <= cache.length)[None, :]
        pos = cache.length[None] + rope_delta
        if tcfg.mrope_section is not None:
            pos = jnp.broadcast_to(pos[None], (3, 1))
        hidden, cache = llama.forward_hidden(
            tparams, tcfg, embeds, pos, cache, mask, seq_len=cache.length + 1
        )
        cache = kv.advance(cache, 1)
        logits = llama.lm_head(tparams, hidden[0])
        nxt = jnp.argmax(logits).astype(jnp.int32)
        return (nxt, cache), (token, embeds[0], hidden[0])

    (token, cache), (in_toks, in_embeds, hiddens) = jax.lax.scan(
        body, (token, cache), None, length=chunk
    )
    return token, cache, in_toks, in_embeds, hiddens


def generate_sample(
    tparams: dict,
    tcfg: LlamaConfig,
    prompt_embeds: jax.Array,  # [pad_len, D] (vision-merged, padded)
    prompt_len: int,
    image_mask: Optional[np.ndarray],
    cache: kv.KVCache,
    max_new_tokens: int = 512,
    eos_token_id: int = 2,
    position_ids: Optional[jax.Array] = None,  # [pad_len] or [3, pad_len]
    rope_delta: int = 0,
    chunk: int = 16,
    pipelined: bool = True,
) -> Tuple[Dict[str, np.ndarray], kv.KVCache]:
    """One training sample: prompt + greedy continuation with hiddens.

    Pipelined (default): the token loop is dispatched as ``lax.scan`` chunks;
    the host reads only each chunk's small token vector — ONE batch behind the
    chunk in flight, so the ~25 ms tunnel readback overlaps device execution
    (the ``ar_generate`` pattern, spec_model.py) — and the large
    hidden/embedding stacks stay on device until one final batched
    ``jax.device_get``.  ``pipelined=False`` keeps the per-token synced loop as
    the bit-identity oracle (tests/test_training.py).

    Returns arrays shaped like the reference .ckpt records:
      input_ids   [S]  (generated portion only has real ids; prompt ids must be
                        merged by the caller if needed)
      hidden_state[S, D] — last-layer hidden per position
      inputs_embeds[S, D]
      loss_mask   [S] — 1 on generated continuation (pretrain_gen semantics)
      image_mask  [S]
    """
    cache = kv.reset(cache)
    hidden_prefix, token, cache = _prefill_with_hidden(
        tparams, tcfg, prompt_embeds, jnp.asarray(prompt_len, jnp.int32), cache,
        position_ids=position_ids,
    )
    delta = jnp.asarray(rope_delta, jnp.int32)

    if not pipelined:
        hiddens = [np.asarray(hidden_prefix[:prompt_len])]
        embeds = [np.asarray(prompt_embeds[:prompt_len])]
        gen_ids = []
        for _ in range(max_new_tokens):
            tid = int(token)
            gen_ids.append(tid)
            if tid == eos_token_id:
                break
            h, token, cache = _step_with_hidden(tparams, tcfg, token, cache,
                                                rope_delta=delta)
            hiddens.append(np.asarray(h)[None])
            embeds.append(np.asarray(llama.embed(tparams, jnp.asarray([tid])))[:1])
        hidden_state = np.concatenate(hiddens, axis=0)
        inputs_embeds = np.concatenate(embeds, axis=0)
        gen_np = np.asarray(gen_ids, np.int32)
    else:
        # pipeline dispatches up to one chunk past the budget — shrink the
        # chunk if the cache can't hold that overshoot
        avail = int(cache.max_len) - prompt_len
        if max_new_tokens > avail - 2:
            max_new_tokens = max(0, avail - 2)
        while chunk > 1 and max_new_tokens + 2 * chunk > avail:
            chunk //= 2

        stream: list = []  # host copies of each chunk's input-token vector
        big: list = []  # (embeds_dev, hiddens_dev) per chunk, left on device
        total = 0
        eos_idx: Optional[int] = None

        def process(tok_np) -> bool:
            nonlocal total, eos_idx
            stream.append(tok_np)
            if eos_idx is None:
                hit = np.nonzero(tok_np == eos_token_id)[0]
                if hit.size:
                    eos_idx = total + int(hit[0])
            total += len(tok_np)
            return eos_idx is not None or total >= max_new_tokens

        pending = None
        done = max_new_tokens <= 0
        while not done:
            token, cache, toks, embs, hids = _scan_steps_with_hidden(
                tparams, tcfg, token, cache, chunk, delta
            )
            big.append((embs, hids))
            if pending is not None:
                done = process(pending)
            if not done:
                pending = toks

        if eos_idx is not None and eos_idx < max_new_tokens:
            n_exec = eos_idx
        else:
            n_exec = min(total, max_new_tokens)
        n_chunks = -(-n_exec // chunk) if n_exec else 0
        prefix_h, prefix_e, embs_np, hids_np = jax.device_get((
            hidden_prefix[:prompt_len], prompt_embeds[:prompt_len],
            [b[0] for b in big[:n_chunks]], [b[1] for b in big[:n_chunks]],
        ))
        hidden_state = np.concatenate(
            [prefix_h] + hids_np, axis=0
        )[: prompt_len + n_exec] if n_chunks else prefix_h
        inputs_embeds = np.concatenate(
            [prefix_e] + embs_np, axis=0
        )[: prompt_len + n_exec] if n_chunks else prefix_e
        gen_np = (np.concatenate(stream) if stream
                  else np.zeros(0, np.int32))[:n_exec].astype(np.int32)

    s = hidden_state.shape[0]
    loss_mask = np.zeros(s, np.float32)
    loss_mask[prompt_len:] = 1.0
    img = np.zeros(s, bool)
    if image_mask is not None:
        img[: len(image_mask)] = image_mask[:s]
    sample = {
        "input_ids": np.concatenate(
            [np.zeros(prompt_len, np.int32), gen_np[: s - prompt_len]]
        ),
        "hidden_state": hidden_state,
        "inputs_embeds": inputs_embeds,
        "loss_mask": loss_mask,
        "image_mask": img,
    }
    return sample, cache


def generate_vlm_sample(
    model,  # spec.spec_model.SpecModel (target-only load is enough)
    input_ids: np.ndarray,  # [L] with <image> placeholders already expanded
    pixel_values=None,  # [H, W, 3] floats in [0,1]
    image_size=None,
    pixel_values_videos=None,
    second_per_grid_ts: float = 1.0,
    max_new_tokens: int = 512,
    chunk: int = 16,
    pipelined: bool = True,
) -> Dict[str, np.ndarray]:
    """Image-conditioned training sample: pixels run through the real vision
    path (tower + projector + merge), the target generates the continuation,
    and the saved ``image_mask`` marks the true image-token span.

    Reference: ge_data_all_llava_pretrain_gen.py:106-166 — images through the
    processor (:136-137), ``bigmodel.generate(output_hidden_states=True)``
    (:141-153), image_mask from <image> ids (:155-166).  Vision merge reuses
    SpecModel._prompt_embeds (the same code path inference uses).
    """
    ids = np.asarray(input_ids, np.int64)
    l = int(ids.shape[0])
    pad_len = max(128, ((l + 127) // 128) * 128)
    # shared prompt prep (vision merge + pad + M-RoPE continuation)
    embeds, image_mask, _, _, position_ids, rope_delta = model._padded_prompt(
        ids, pad_len, pixel_values, image_size, pixel_values_videos,
        second_per_grid_ts,
    )

    budget = min(max_new_tokens, model.target_cache.max_len - l - 2)
    sample, cache = generate_sample(
        model.tparams, model.tcfg, embeds, l,
        image_mask, kv.reset(model.target_cache),
        max_new_tokens=budget, eos_token_id=model.eos_token_id,
        position_ids=position_ids, rope_delta=rope_delta,
        chunk=chunk, pipelined=pipelined,
    )
    model.target_cache = kv.reset(cache)
    s = sample["hidden_state"].shape[0]
    merged_ids = sample["input_ids"].copy()
    merged_ids[:l] = ids[:s][: min(l, s)]
    sample["input_ids"] = merged_ids
    return sample


def save_sample(outdir: str, index: int, sample: Dict[str, np.ndarray]) -> str:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, f"data_{index}.npz")
    np.savez_compressed(path, **sample)
    return path


def load_sample(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
