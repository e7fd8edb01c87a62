"""End-to-end drive of the data-generation CLI (train/ge_data.py): fabricated
target checkpoint + tokenizer + ShareGPT-style conversations -> data_*.npz,
including the --tp 2 mesh path (previously only exercised on-chip)."""

import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("safetensors.numpy")

from tests.test_from_pretrained import write_llama_ckpt
from tests.test_gen_answer_cli import _write_tokenizer


def _run(tmp_path, monkeypatch, extra):
    tdir = str(tmp_path / "t")
    write_llama_ckpt(tdir)
    _write_tokenizer(tdir)

    conv = {"conversations": [
        {"from": "human", "value": "write a story about robots"},
        {"from": "gpt", "value": "the robots make a story"},
        {"from": "human", "value": "make it shorter"},
        {"from": "gpt", "value": "robots story"},
    ]}
    data_file = str(tmp_path / "sharegpt.json")
    with open(data_file, "w") as f:
        json.dump([conv, conv, conv], f)

    outdir = str(tmp_path / ("out_" + "_".join(extra) if extra else "out"))
    from vispec_tpu.train import ge_data

    monkeypatch.setattr(sys, "argv", [
        "ge_data", "--basepath", tdir, "--dataset", "sharegpt",
        "--data-file", data_file, "--outdir", outdir,
        "--max-len", "64", "--max-new-tokens", "16",
        "--shard-id", "0", "--num-shards", "2",
    ] + extra)
    ge_data.main()
    files = sorted(f for f in os.listdir(outdir) if f.endswith(".npz"))
    # shard 0 of 2 over 3 conversations -> indices 0 and 2
    assert len(files) == 2
    z = np.load(os.path.join(outdir, files[0]))
    assert {"input_ids", "hidden_state", "loss_mask"} <= set(z.keys())
    assert z["loss_mask"].sum() > 0  # assistant turns masked in
    assert z["hidden_state"].shape[-1] > 0
    return outdir


def test_ge_data_cli_sharegpt(tmp_path, monkeypatch):
    _run(tmp_path, monkeypatch, [])


def test_ge_data_cli_sharegpt_tp2(tmp_path, monkeypatch):
    """--tp 2: the tp-sharded generating target (mesh_from_args path) writes
    the same files; values must match the unsharded run."""
    ref = _run(tmp_path, monkeypatch, [])
    out = _run(tmp_path, monkeypatch, ["--tp", "2"])
    for f in sorted(os.listdir(ref)):
        a, b = np.load(os.path.join(ref, f)), np.load(os.path.join(out, f))
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["loss_mask"], b["loss_mask"])
        # hiddens: bf16 (npz stores it as a void dtype — view it back) under
        # a different GSPMD partitioning -> allow ulp-level drift (same
        # caveat as the TPU token-identity tests)
        import ml_dtypes

        ah = a["hidden_state"].view(ml_dtypes.bfloat16).astype(np.float32)
        bh = b["hidden_state"].view(ml_dtypes.bfloat16).astype(np.float32)
        np.testing.assert_allclose(ah, bh, atol=5e-2, rtol=5e-2)
