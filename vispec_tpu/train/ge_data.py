"""Training-data generation CLI — the reference's allocation_* + ge_data_all_*
pair (SURVEY.md §2.5) as one entry point with process-level sharding.

  python -m vispec_tpu.train.ge_data --basepath <target ckpt> \
      --dataset sharegpt --data-file ShareGPT.json --outdir data/stage1 \
      --start 0 --end 10000 --shard-id 0 --num-shards 8

- sharegpt (stage-1): vicuna-template conversations; the target forward's
  hidden states are captured per token; loss mask covers assistant turns
  (ge_data_all_llava_shargpt.py:85-116).
- pretrain_gen (stage-2): LLaVA-Pretrain blip_laion image prompts with the
  "Please answer with at least 1000 words." suffix; the IMAGE runs through the
  real vision path (tower + projector + merge — the reference pushes pixels
  through the processor + VLM, ge_data_all_llava_pretrain_gen.py:136-153), the
  target *generates* the continuation (anti-shortcut: the draft never trains
  on ground-truth text — :80-85, README.md:15), and the saved ``image_mask``
  marks the true image-token span (:155-166).

Sharding: each process handles indices [start + shard_id :: num_shards] — the
reference's per-GPU subprocess fan-out (allocation_llava_pretrain_gen.py:34-93)
without the os.system machinery.
"""

from __future__ import annotations

import argparse
import json
import os

VICUNA_SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's "
    "questions."
)
LONG_ANSWER_SUFFIX = "Please answer with at least 1000 words."


def _enable_compile_cache():
    """Persistent XLA compile cache for TPU runs (1-CPU host: 7B compiles take
    minutes; see CLAUDE.md).  CPU AOT results are machine-specific -> skipped."""
    import os

    if os.environ.get("JAX_PLATFORMS", "") in ("cpu",):
        return
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_sharegpt_sample(tokenizer, conv: dict, max_len: int):
    """Vicuna-template render + assistant-turn loss mask
    (ge_data_all_llava_shargpt.py:44-116 semantics)."""
    import numpy as np

    text = VICUNA_SYSTEM
    spans = []  # (start_char, end_char) of assistant outputs
    for turn in conv.get("conversations", []):
        role = turn.get("from")
        msg = turn.get("value", "")
        if role == "human":
            text += f" USER: {msg} ASSISTANT:"
        else:
            start = len(text) + 1
            text += f" {msg}</s>"
            spans.append((start, len(text)))
    enc = tokenizer(text, return_offsets_mapping=True, truncation=True,
                    max_length=max_len)
    ids = np.asarray(enc["input_ids"], np.int32)
    offsets = enc["offset_mapping"]
    mask = np.zeros(len(ids), np.float32)
    for i, (a, b) in enumerate(offsets):
        if any(s <= a < e for s, e in spans):
            mask[i] = 1.0
    return ids, mask


def build_pretrain_ids(tokenizer, model, prompt: str, image_size, max_len: int):
    """Tokenize the image prompt and expand the single <image> placeholder to
    the model's true image-token count for this image size.

    The reference delegates expansion to the HF processor
    (ge_data_all_llava_pretrain_gen.py:136-137); here the count comes from
    SpecModel.count_image_tokens so it agrees with the device-side vision path
    by construction.  Returns int32 ids with the image span in place.
    """
    import numpy as np

    prompt = prompt.replace("<image>", "").strip()
    text = f"{VICUNA_SYSTEM} USER: <IMG>\n{prompt} {LONG_ANSWER_SUFFIX} ASSISTANT:"
    pre, post = text.split("<IMG>")
    ids_pre = tokenizer(pre)["input_ids"]
    # tokenize the tail without re-adding BOS
    ids_post = tokenizer(post, add_special_tokens=False)["input_ids"]
    n_img = model.count_image_tokens(image_size)
    if len(ids_pre) + n_img > max_len:
        # a [:max_len] crop would slice THROUGH the image span, making the
        # placeholder count disagree with the vision feature count and
        # crashing _prompt_embeds; the caller skips such samples
        return None
    # crop only the text tail — the image span stays intact
    ids = (list(ids_pre) + [model.image_token_index] * n_img
           + list(ids_post))[:max_len]
    return np.asarray(ids, np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--basepath", required=True)
    p.add_argument("--dataset", choices=["sharegpt", "pretrain_gen"], required=True)
    p.add_argument("--data-file", required=True)
    p.add_argument("--image-root", default=None)
    p.add_argument("--outdir", required=True)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=10**9)
    p.add_argument("--shard-id", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    # tp-shard the generating target over N chips (13B+ generators; the
    # reference's answer was device_map="auto", allocation_*.py GPU groups)
    p.add_argument("--tp", type=int, default=1)
    args = p.parse_args()
    _enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np
    from transformers import AutoTokenizer

    from ..models import llama
    from ..spec.spec_model import SpecModel, _bucket
    from .data_gen import generate_sample, generate_vlm_sample, save_sample

    from ..parallel.mesh import mesh_from_args

    mesh = mesh_from_args(tp=args.tp)

    max_len = _bucket(args.max_len + args.max_new_tokens + 128)
    # target-only load: full arch dispatch incl. the vision tower, no draft
    model = SpecModel.from_pretrained(
        args.basepath, None, max_len=max_len, dtype=jnp.bfloat16, mesh=mesh
    )
    tokenizer = AutoTokenizer.from_pretrained(args.basepath, use_fast=True)

    with open(args.data_file) as f:
        data = json.load(f)
    indices = list(range(args.start, min(args.end, len(data))))[args.shard_id::args.num_shards]
    print(f"[ge_data] shard {args.shard_id}/{args.num_shards}: {len(indices)} samples")

    eos = tokenizer.eos_token_id or 2
    from ..ops import kv_cache as kv

    for idx in indices:
        item = data[idx]
        if args.dataset == "sharegpt":
            ids, mask = build_sharegpt_sample(tokenizer, item, args.max_len)
            if mask.sum() == 0:
                continue
            embeds = llama.embed(model.tparams, jnp.asarray(ids))
            pad = ((len(ids) + 127) // 128) * 128
            embeds = jnp.pad(embeds, ((0, pad - len(ids)), (0, 0)))
            # teacher-forced forward only (no generation): capture hiddens
            sample, cache = generate_sample(
                model.tparams, model.tcfg, embeds, len(ids), None,
                kv.reset(model.target_cache), max_new_tokens=1, eos_token_id=eos,
            )
            model.target_cache = kv.reset(cache)
            sample["input_ids"] = ids
            sample["loss_mask"] = np.concatenate(
                [mask, np.zeros(sample["loss_mask"].shape[0] - len(mask), np.float32)]
            )[: sample["loss_mask"].shape[0]]
        else:  # pretrain_gen: image through the vision path, target generates
            prompt = item.get("conversations", [{}])[0].get("value", "")
            pixel_values = None
            image_size = None
            if args.image_root and item.get("image"):
                from PIL import Image

                img = Image.open(
                    os.path.join(args.image_root, item["image"])
                ).convert("RGB")
                pixel_values = jnp.asarray(
                    np.asarray(img, np.float32) / 255.0
                )
                image_size = pixel_values.shape[:2]
                ids = build_pretrain_ids(
                    tokenizer, model, prompt, image_size, args.max_len
                )
                if ids is None:  # image span wouldn't fit max_len intact
                    print(f"[ge_data] skip {idx}: image span exceeds "
                          f"--max-len {args.max_len}")
                    continue
            else:
                text = (f"{VICUNA_SYSTEM} USER: "
                        f"{prompt.replace('<image>', '').strip()} "
                        f"{LONG_ANSWER_SUFFIX} ASSISTANT:")
                ids = np.asarray(tokenizer(text, truncation=True,
                                           max_length=args.max_len)["input_ids"],
                                 np.int32)
            sample = generate_vlm_sample(
                model, ids, pixel_values=pixel_values, image_size=image_size,
                max_new_tokens=args.max_new_tokens,
            )
        save_sample(args.outdir, idx, sample)
    print("[ge_data] done")


if __name__ == "__main__":
    main()
