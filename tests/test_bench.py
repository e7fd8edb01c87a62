"""Smoke-test the bench harness (the driver's scoring path) on a tiny model.

bench.run_bench is otherwise only exercised on the real chip; a refactor that
breaks a quant mode, the T=1 legs, or the result-field contract would
otherwise surface as a silent 0.0 headline at round end.
"""

import json
import os
import subprocess
import sys

import bench


def test_run_bench_tiny_contract(monkeypatch):
    monkeypatch.setattr(bench, "N_TOKENS", 8)
    monkeypatch.setattr(bench, "REPEATS", 1)
    cfg = dict(num_hidden_layers=2, hidden_size=64, intermediate_size=128,
               num_attention_heads=4, num_key_value_heads=4, vocab_size=256,
               max_len=512, label="tiny")
    t0_snapshots = []
    res = bench.run_bench(cfg, on_t0=t0_snapshots.append)
    # the headline callback fired after every T=0 mode and BEFORE the T=1
    # legs, then again after T=1 and before the method legs (that ordering is
    # what lets the parent salvage a timed-out child)
    assert len(t0_snapshots) == 2
    assert "speedup_at_ref_tau_int8" in t0_snapshots[0]
    assert "ratio_T1" not in t0_snapshots[0]
    assert "ratio_T1" in t0_snapshots[1]
    assert "ratio_medusa" not in t0_snapshots[1]
    # tau accounting: speedup counts the committed bonus token (tau + 1)
    assert abs(res["speedup_at_ref_tau"] * res["ratio"]
               - (bench.REF_TAU + 1.0)) < 1e-6
    # three-method legs (the reference's headline comparison artifact)
    assert "methods_error" not in res, res.get("methods_error")
    assert res["ratio_eagle"] > 0 and res["ratio_medusa"] > 0
    assert res["ratio_eagle_int8"] > 0
    assert res["speedup_at_ref_tau_eagle"] > 0
    assert res["speedup_at_ref_tau_eagle_int8"] > 0
    assert res["speedup_at_ref_tau_medusa"] > 0
    for key in ("t_ar_ms", "t_round_ms", "ttft_ms", "ratio",
                "speedup_at_ref_tau",
                "ratio_int8", "ratio_int4", "ratio_mixed", "ratio_auto",
                "speedup_at_ref_tau_int8", "auto_choices"):
        assert key in res, key
        if key.startswith(("t_", "ratio", "speedup")):
            assert res[key] > 0, (key, res[key])
    # the T=1 legs are non-fatal but must have RUN here (no chip flakiness
    # on CPU): both ratios present and positive, no error recorded
    assert "T1_error" not in res, res.get("T1_error")
    assert res["ratio_T1"] > 0 and res["ratio_T1_int8"] > 0
    assert res["speedup_at_ref_tau_T1"] > 0
    assert set(res["auto_choices"]) == {
        "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "rank_head"}
    assert all(v in ("bf16", "int8", "int4")
               for v in res["auto_choices"].values())


def test_tree_sweep_depth_model():
    """sweep_tree_t1's truncated-geometric depth factor: identity at the
    default depth, anchored so tau(depth=3) == the reference's tau_T1, and
    strictly decreasing as the tree gets shallower."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from sweep_tree_t1 import REF_TAU_T1, depth_factor

    assert abs(depth_factor(3) - 1.0) < 1e-9
    f2, f1 = depth_factor(2), depth_factor(1)
    assert 0 < f1 < f2 < 1.0
    # anchored: reconstructing tau(3) from the solved p reproduces 2.09
    assert abs(REF_TAU_T1 * depth_factor(3) - 2.09) < 1e-6
    # depth=2 loses the 4th chain level: at p~0.757 that is ~16% of tau
    assert 0.78 < f2 < 0.90


def test_bench_qwen_tiny_contract():
    """bench_qwen --tiny (subprocess: it mutates bench globals and pins the
    cpu platform): the Qwen2.5-VL bench path — windowed ViT prefill, M-RoPE
    rope_delta decode, GQA, qkv_bias, TTFT, all three method legs — traces
    end-to-end and emits the one-JSON-line contract."""
    out = subprocess.run(
        [sys.executable, "scripts/bench_qwen.py", "--model", "3b", "--tiny",
         "--skip-t1"],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.abspath(bench.__file__)))
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["metric"] == "qwen3b_spec_speedup_at_ref_tau_T0"
    d = res["detail"]
    assert d["gqa"] == "4q/1kv" and d["qkv_bias"] and d["mrope"]
    assert d["image"] is not None and d["prompt_len"] > 16
    for key in ("ttft_ms", "t_ar_ms", "t_round_ms", "ratio",
                "t_round_int8draft_ms", "ratio_int8draft",
                "speedup_at_ref_tau_int8", "t_round_eagle_int8_ms",
                "ratio_eagle", "t_round_medusa_ms", "ratio_medusa"):
        assert d.get(key, 0) > 0, (key, d.get(key))
    # tau+1 accounting on the headline
    assert abs(res["value"] * d["ratio_int8draft"] - (d["ref_tau"] + 1)) < 1e-2
