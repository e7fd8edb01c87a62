"""On-chip eval-harness artifact (VERDICT r4 item 5): the full
load -> prefill -> spec -> JSONL -> aggregate path on real hardware.

The L3 harness (evaluation/gen_answer.py + harness.py + speed.py) mirrors the
reference's gen_spec_answer_* skeleton (gen_spec_answer_sqa.py:203-339) and
was fixture-tested on CPU only; its per-question wall-clock discipline had
never met the tunnel's D2H queue-drain pitfall (CLAUDE.md).  This drive:

1. fabricates a REAL-GEOMETRY Vicuna-7B target checkpoint dir (fp16
   safetensors + config.json + a WordLevel fast tokenizer) and a matching
   ViSpec draft checkpoint — `SpecModel.from_pretrained` exercises the same
   ingestion path a real JLKang/ViSpec-* download would;
2. runs gen_answer over a committed mt-bench-style fixture (vicuna bench)
   for spec + baseline (+ --method eagle), int8 target + int8 KV (the 7B
   serving config), writing per-question JSONL records with wall_time
   INCLUDING prefill — the reference's metric;
3. aggregates with speed.py and prints the report.

Artifacts land in artifacts/eval_harness/ (committed).  Random weights mean
gibberish text and fixture-level tau (~1); the artifact is the systems proof,
speedups are still reported at the reference's tau elsewhere.

Run (on the chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/drive_eval_harness.py
CPU smoke:
    ... drive_eval_harness.py --tiny --platform cpu
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GEOM_7B = dict(vocab_size=32000, hidden_size=4096, intermediate_size=11008,
               num_hidden_layers=32, num_attention_heads=32,
               num_key_value_heads=32)
GEOM_TINY = dict(vocab_size=32000, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=2, num_attention_heads=4,
                 num_key_value_heads=4)

WORDS = ["write", "a", "story", "about", "robots", "explain", "why", "the",
         "sky", "is", "blue", "to", "child", "make", "it", "shorter",
         "now", "as", "poem", "what", "are", "three", "uses", "of", "tpu"]


def write_target_ckpt(d, g, seed=0):
    """Vicuna-7B-geometry LlamaForCausalLM checkpoint: fp16 safetensors in HF
    names (convert/hf.py casts to the load dtype).  Each tensor generates and
    frees independently, so peak host RAM is one tensor, not 13.5 GB."""
    import safetensors.numpy as st

    rng = np.random.default_rng(seed)
    h, i, v = g["hidden_size"], g["intermediate_size"], g["vocab_size"]
    hkv = g["num_key_value_heads"] * (h // g["num_attention_heads"])

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02
                ).astype(np.float16)

    os.makedirs(d, exist_ok=True)
    sd = {"model.embed_tokens.weight": w(v, h),
          "model.norm.weight": np.ones(h, np.float16),
          "lm_head.weight": w(v, h)}
    for li in range(g["num_hidden_layers"]):
        p = f"model.layers.{li}."
        sd.update({
            p + "input_layernorm.weight": np.ones(h, np.float16),
            p + "post_attention_layernorm.weight": np.ones(h, np.float16),
            p + "self_attn.q_proj.weight": w(h, h),
            p + "self_attn.k_proj.weight": w(hkv, h),
            p + "self_attn.v_proj.weight": w(hkv, h),
            p + "self_attn.o_proj.weight": w(h, h),
            p + "mlp.gate_proj.weight": w(i, h),
            p + "mlp.up_proj.weight": w(i, h),
            p + "mlp.down_proj.weight": w(h, i),
        })
    st.save_file(sd, os.path.join(d, "model.safetensors"))
    del sd
    cfg = dict(architectures=["LlamaForCausalLM"], max_position_embeddings=4096,
               rms_norm_eps=1e-5, rope_theta=10000.0, **g)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


def write_draft_ckpt(d, g, seed=1):
    import safetensors.numpy as st

    rng = np.random.default_rng(seed)
    h, i, v = g["hidden_size"], g["intermediate_size"], g["vocab_size"]
    heads = g["num_attention_heads"]
    hkv = g["num_key_value_heads"] * (h // heads)

    def w(*shape):
        return (rng.standard_normal(shape, dtype=np.float32) * 0.02
                ).astype(np.float16)

    os.makedirs(d, exist_ok=True)
    sd = {
        "embed_tokens.weight": w(v, h),
        "fc.weight": w(h, 2 * h), "fc.bias": np.zeros(h, np.float16),
        "img_fc.weight": w(h, 2 * h), "img_fc.bias": np.zeros(h, np.float16),
        "imadpt.q": w(2, heads, h // heads),
        "imadpt.k_proj.weight": w(h, h),
        "imadpt.v_proj.weight": w(h, h),
        "imadpt.o_proj.weight": w(h, h),
        "layers.0.post_attention_layernorm.weight": np.ones(h, np.float16),
        "layers.0.self_attn.q_proj.weight": w(h, h),
        "layers.0.self_attn.k_proj.weight": w(hkv, h),
        "layers.0.self_attn.v_proj.weight": w(hkv, h),
        "layers.0.self_attn.o_proj.weight": w(h, h),
        "layers.0.mlp.gate_proj.weight": w(i, h),
        "layers.0.mlp.up_proj.weight": w(i, h),
        "layers.0.mlp.down_proj.weight": w(h, i),
    }
    st.save_file(sd, os.path.join(d, "model.safetensors"))
    cfg = dict(g, num_hidden_layers=1, max_position_embeddings=4096,
               rms_norm_eps=1e-5, rope_theta=10000.0, num_q=2)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)


def write_tokenizer(d):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<unk>": 0, "<s>": 1, "<pad>": 2, "</s>": 5}
    vocab.update({w: 6 + i for i, w in enumerate(WORDS)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "</s>", "unk_token": "<unk>",
                   "bos_token": "<s>"}, f)


def write_questions(data_root, n=3):
    qs = [
        {"question_id": 81, "category": "writing",
         "turns": ["write a story about robots", "make it shorter"]},
        {"question_id": 82, "category": "stem",
         "turns": ["explain why the sky is blue to a child",
                   "now as a poem"]},
        {"question_id": 83, "category": "stem",
         "turns": ["what are three uses of a tpu", "make it shorter"]},
    ][:n]
    bench_dir = os.path.join(data_root, "mt_bench")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "question.jsonl"), "w") as f:
        for q in qs:
            f.write(json.dumps(q) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true", help="tiny-geometry smoke")
    p.add_argument("--platform", default=None)
    p.add_argument("--ckpt-root", default=os.path.join(ROOT, ".eval_ckpt"))
    p.add_argument("--out-dir",
                   default=os.path.join(ROOT, "artifacts", "eval_harness"))
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--keep-ckpt", action="store_true")
    p.add_argument("--legs", default="spec,baseline,eagle",
                   help="comma list; a leg not listed reuses its existing "
                        "JSONL (resume an interrupted on-chip run)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    g = GEOM_TINY if args.tiny else GEOM_7B
    tdir = os.path.join(args.ckpt_root, "target")
    ddir = os.path.join(args.ckpt_root, "draft")
    if not os.path.exists(os.path.join(tdir, "model.safetensors")):
        t0 = time.perf_counter()
        write_target_ckpt(tdir, g)
        write_draft_ckpt(ddir, g)
        write_tokenizer(tdir)
        print(f"fabricated ckpts in {time.perf_counter() - t0:.0f}s "
              f"({'tiny' if args.tiny else '7B fp16'})", flush=True)
    data_root = os.path.join(args.ckpt_root, "data")
    write_questions(data_root)
    os.makedirs(args.out_dir, exist_ok=True)

    from vispec_tpu.evaluation import gen_answer, speed

    legs = set(args.legs.split(","))

    def run(tag, extra):
        out = os.path.join(args.out_dir, f"{tag}.jsonl")
        if tag not in legs:
            assert os.path.exists(out), f"--legs skipped {tag} but {out} absent"
            print(f"{tag}: reusing {out}", flush=True)
            return out
        if os.path.exists(out):
            os.unlink(out)
        argv = ["gen_answer", "--bench", "vicuna", "--model", tdir,
                "--spec-model", ddir, "--data-root", data_root,
                "--answer-file", out, "--max-len", "2048",
                "--max-new-tokens", str(args.max_new_tokens),
                "--model-id", f"fabricated-{'tiny' if args.tiny else '7b'}",
                ] + extra
        if not args.tiny:  # the 7B serving config
            argv += ["--quantize-target", "--quantize-kv",
                     "--quantize-draft", "int8"]
        else:
            argv += ["--total-token", "12", "--depth", "3", "--top-k", "4"]
        old = sys.argv
        sys.argv = argv
        t0 = time.perf_counter()
        try:
            gen_answer.main()
        finally:
            sys.argv = old
        print(f"{tag}: {time.perf_counter() - t0:.0f}s", flush=True)
        return out

    spec_f = run("spec", [])
    base_f = run("baseline", ["--baseline"])
    eagle_f = run("eagle", ["--method", "eagle"])

    report = speed.speedup_report(spec_f, base_f)
    report_e = speed.speedup_report(eagle_f, base_f)
    summary = {
        "geometry": "tiny" if args.tiny else
                    "7B fp16 ckpt, int8 target + int8 KV + int8 draft",
        "questions": report["n_spec"],
        "vispec": report, "eagle": report_e,
        "note": "fabricated random weights: draft and target argmaxes are "
                "independent so recorded tau~0 (1 bonus token/round) and "
                "speedup<1 by construction -- a spec round costs more than an "
                "AR step when nothing is accepted; gibberish text. wall_time "
                "includes full-prompt prefill per turn (reference "
                "gen_spec_answer metric). The artifact proves the "
                "load->prefill->spec->JSONL->aggregate path on hardware.",
    }
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"metric": "eval_harness_speedup_fixture_tau",
                      "value": round(report["speedup"], 3), "unit": "x",
                      "detail": summary}), flush=True)
    if not args.keep_ckpt and not args.tiny:
        shutil.rmtree(args.ckpt_root, ignore_errors=True)


if __name__ == "__main__":
    main()
