"""On-chip bench: int8 TARGET quantization (the opt-in serving mode).

Measures, at 7B scale on one TPU v5e:
  - AR step and spec round on the int8 target (bf16 draft and int8 draft),
  - absolute decode throughput at the reference's tau=2.98
    (tau + 1 = 3.98 committed tokens per round — see bench.py's accounting),
  - optionally (--engine) continuous-batching engine throughput at batch
    sizes that only FIT because int8 weights free ~6.5GB of HBM.

Unlike bench.py (whose headline keeps the reference's bf16-class verifier for
parity), this mode changes model outputs — the verifier itself is int8 — so
the numbers here are the serving story, not the BASELINE.md comparison.
Spec remains exactly lossless vs AR on the same int8 weights (driven in
scripts/drive_spec.py).

Usage:  PYTHONPATH=. python scripts/bench_target_quant.py [--config 0]
        [--engine --sizes 1,2,4]     # engine legs: use --config 1 (7B@1024)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)).rsplit(
    "/scripts", 1)[0])

import bench  # reuses build()/CONFIGS/_time_spec and the compile cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0,
                    help="bench.CONFIGS index (0 = 7B@2048)")
    ap.add_argument("--engine", action="store_true",
                    help="also run continuous-batching engine throughput")
    ap.add_argument("--sizes", default="1,2,4")
    ap.add_argument("--max-new", type=int, default=60)
    ap.add_argument("--requests-factor", type=int, default=2,
                    help="requests = factor * batch size")
    ap.add_argument("--kv", action="store_true",
                    help="also quantize the KV cache to int8 (quantize_kv)")
    ap.add_argument("--max-len", type=int, default=0,
                    help="override the config's max_len (e.g. 4096 — the "
                    "context capacity int8 target+KV unlocks on one v5e)")
    args = ap.parse_args()

    cfg_d = dict(bench.CONFIGS[args.config])
    if args.max_len:
        cfg_d["max_len"] = args.max_len
        cfg_d["label"] = cfg_d["label"].split("@")[0] + f"@{args.max_len}"
    print(f"building {cfg_d['label']} (kv={'int8' if args.kv else 'bf16'})"
          " ...", flush=True)
    model = bench.build(cfg_d, quantize_kv=args.kv)
    t0 = time.perf_counter()
    model.quantize_target_inplace("int8")
    print(f"target quantized in {time.perf_counter() - t0:.1f}s", flush=True)
    prompt = np.random.default_rng(0).integers(
        10, cfg_d["vocab_size"] - 10, 120).tolist()

    t_round = bench._time_spec(model, prompt)

    model.ar_generate(prompt, max_new_tokens=8)
    t_ar = 1e9
    for _ in range(bench.REPEATS):
        res = model.ar_generate(prompt, max_new_tokens=bench.N_TOKENS)
        t_ar = min(t_ar, res.decode_time / max(res.new_tokens - 1, 1))

    model.quantize_draft_inplace("int8")
    t_round_q8 = bench._time_spec(model, prompt)

    out = {
        "metric": "int8_target_decode_toks_per_s_at_ref_tau",
        "value": round((bench.REF_TAU + 1.0) / t_round_q8, 1),
        "unit": "tok/s",
        "detail": {
            "model": cfg_d["label"],
            "kv": "int8" if args.kv else "bf16",
            "t_ar_ms": round(t_ar * 1e3, 3),
            "t_round_ms": round(t_round * 1e3, 3),
            "t_round_int8draft_ms": round(t_round_q8 * 1e3, 3),
            "ratio": round(t_round / t_ar, 4),
            "ratio_int8draft": round(t_round_q8 / t_ar, 4),
            "ar_toks_per_s": round(1.0 / t_ar, 1),
            "spec_toks_per_s_at_ref_tau": round(
                (bench.REF_TAU + 1.0) / t_round, 1),
            "spec_toks_per_s_at_ref_tau_int8draft": round(
                (bench.REF_TAU + 1.0) / t_round_q8, 1),
        },
    }

    if args.engine:
        eng_detail = {}
        rng = np.random.default_rng(1)
        for b in [int(s) for s in args.sizes.split(",")]:
            eng = model.serving_engine(batch_size=b,
                                       max_new_tokens=args.max_new)
            n_req = args.requests_factor * b
            prompts = [rng.integers(10, cfg_d["vocab_size"] - 10,
                                    100).tolist() for _ in range(n_req)]
            eng.run_all(prompts[:b])  # warm the batched graphs
            t0 = time.perf_counter()
            outs = eng.run_all(prompts)
            wall = time.perf_counter() - t0
            toks = int(sum(len(o) for o in outs))
            eng_detail[f"B={b}"] = {
                "toks_per_s": round(toks / wall, 1),
                "requests": n_req, "tokens": toks,
                "wall_s": round(wall, 2),
                "admissions": eng.stats["admissions"],
                "admit_dispatch_s": round(eng.stats["admit_dispatch_s"], 3),
            }
            print(json.dumps({f"engine_B{b}": eng_detail[f"B={b}"]}),
                  flush=True)
        out["detail"]["engine"] = eng_detail

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
