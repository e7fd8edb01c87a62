"""End-to-end drive of the unified eval CLI (evaluation/gen_answer.py):
fabricated target+draft checkpoints + a fabricated fast tokenizer + an
mt_bench fixture -> spec answers AND baseline answers as JSONL.  Covers the
one entry point the harness/benchmark unit tests don't execute: main()'s
model load, tokenizer fallback, question iteration, and record writing."""

import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("safetensors.numpy")

from tests.test_from_pretrained import write_draft_ckpt, write_llama_ckpt


def _write_tokenizer(d):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = ["write", "a", "story", "about", "robots", "make", "it",
             "shorter", "the", "user", "assistant"]
    vocab = {"<unk>": 0, "<s>": 1, "<pad>": 2, "<mask>": 3, "<cls>": 4,
             "</s>": 5}
    vocab.update({w: 6 + i for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "</s>", "unk_token": "<unk>",
                   "bos_token": "<s>"}, f)


def test_gen_answer_cli_vicuna(tmp_path, monkeypatch):
    tdir, ddir = str(tmp_path / "t"), str(tmp_path / "d")
    write_llama_ckpt(tdir)
    write_draft_ckpt(ddir)
    _write_tokenizer(tdir)

    bench_dir = tmp_path / "data" / "mt_bench"
    bench_dir.mkdir(parents=True)
    with open(bench_dir / "question.jsonl", "w") as f:
        f.write(json.dumps({"question_id": 81, "category": "writing",
                            "turns": ["write a story about robots",
                                      "make it shorter"]}) + "\n")

    from vispec_tpu.evaluation import gen_answer

    def run(extra):
        argv = ["gen_answer", "--bench", "vicuna", "--model", tdir,
                "--spec-model", ddir, "--data-root", str(tmp_path / "data"),
                "--total-token", "12", "--depth", "3", "--top-k", "4",
                "--max-len", "512", "--max-new-tokens", "12"] + extra
        monkeypatch.setattr(sys, "argv", argv)
        gen_answer.main()

    spec_file = str(tmp_path / "out" / "spec.jsonl")
    run(["--answer-file", spec_file])
    base_file = str(tmp_path / "out" / "base.jsonl")
    run(["--answer-file", base_file, "--baseline"])

    for path, is_spec in ((spec_file, True), (base_file, False)):
        recs = [json.loads(l) for l in open(path) if l.strip()]
        assert len(recs) == 1
        r = recs[0]
        assert r["question_id"] == 81
        assert len(r["turns"]) == 2  # multi-turn conversation carried
        assert len(r["new_tokens"]) == 2 and len(r["wall_time"]) == 2
        if is_spec:
            assert "acceptance_length" in r

    # the aggregator consumes the two files (speed.py layout)
    from vispec_tpu.evaluation import speed

    report = speed.speedup_report(spec_file, base_file)
    assert np.isfinite(report["speedup"]) and report["speedup"] > 0
    assert report["n_spec"] == report["n_baseline"] == 1

    # --tp 2: the CLI's mesh knob loads the model sharded; answers must
    # match the unsharded spec run text for text
    tp_file = str(tmp_path / "out" / "spec_tp2.jsonl")
    run(["--answer-file", tp_file, "--tp", "2"])
    ref = [json.loads(l) for l in open(spec_file) if l.strip()][0]
    got = [json.loads(l) for l in open(tp_file) if l.strip()][0]
    assert got["turns"] == ref["turns"]

    # serving quant modes through the CLI (int8 target + int8 KV, with a tp=2
    # mesh so the quantize-then-shard ordering is exercised): answers may
    # differ from bf16 (quantized verifier/cache) but the run must complete
    # with the same record shape
    q_file = str(tmp_path / "out" / "spec_quant.jsonl")
    run(["--answer-file", q_file, "--quantize-target", "--quantize-kv",
         "--tp", "2"])
    q = [json.loads(l) for l in open(q_file) if l.strip()][0]
    assert len(q["turns"]) == 2 and "acceptance_length" in q
