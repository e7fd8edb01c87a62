"""T=1 tree-shape sweep: is the τ≈3-tuned tree oversized at τ_T1≈2.09?

The default draft tree (depth=3, top_k=8, total_token=30 — the reference's
exp.sh settings, tuned where τ≈3) spends draft+glue milliseconds proposing
nodes that a lower-τ operating point (the reference's T=1 row: τ=2.09,
README.md:196-198) rarely accepts.  This sweep measures, for each candidate
shape (depth ∈ {2,3} × total_token ∈ {16,24,30}):

  1. **τ scaling** (labeled ESTIMATE — no trained 7B checkpoints offline):
     - depth: truncated-geometric chain model anchored at the reference's
       operating point.  If each next draft token survives with constant
       probability p, τ(D) = Σ_{k=1..D} p^k with D = depth+1 levels (the
       beam expands ``depth`` levels after the root top-k); solving
       τ(4) = 2.09 gives p ≈ 0.757, hence τ(depth=2) = 1.76.
     - total_token: the trained toy fixture's (tests/data/tau_fixture.npz,
       sharpened target) relative τ under T=1 sampling — rank-limiting the
       tree from 30 to 24/16 nodes cost the toy ~9-10% of its accepted
       drafts; applied multiplicatively.
  2. **round time** (chip, 7B@2048 random weights, int8 draft — the headline
     mode): t_round(shape) at T=1 through specgenerate, t_ar once.

and reports speedup(shape) = (est_τ(shape) + 1) / (t_round/t_ar)
(τ+1 committed tokens per round — see bench.py's accounting note).

Run (on the chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_tree_t1.py
Prints one JSON line with every row + the best pick.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [(3, 30), (3, 24), (3, 16), (2, 30), (2, 24), (2, 16)]
REF_TAU_T1 = 2.09  # LLaVA-1.6-7B T=1 (reference README.md:196-198)
REF_SPEEDUP_T1 = 2.14


def toy_taus() -> dict:
    """CPU phase: τ of the trained toy fixture at each tree shape, T=1."""
    import jax
    import jax.numpy as jnp

    from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
    from vispec_tpu.spec.spec_model import SpecModel

    z = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "tau_fixture.npz"))

    def params(side):
        pre = side + "/"
        out = {}
        for k in z.files:
            if not k.startswith(pre):
                continue
            cur, parts = out, k[len(pre):].split("/")
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = jnp.asarray(z[k])
        return out

    # fixture geometry (tests/test_e2e_tau.py's T/D; the npz stores params)
    tcfg = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=512)
    dcfg = DraftConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=512)
    tparams, dparams = params("t"), params("d")
    # Sharpen the target's logits: the RAW toy target is near-uniform
    # (p_argmax ~2%), so sampled τ sits at the ~0 floor at ANY temperature
    # and carries no shape signal.  Scaling lm_head by 8 gives the target a
    # real-LLM-like confident distribution (the test suite's
    # sharpened-target anchor, tests/test_e2e_tau.py) so T=1 acceptance has
    # dynamic range across tree shapes.
    tparams = dict(tparams, lm_head=tparams["lm_head"] * 8.0)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(5, tcfg.vocab_size - 5, 12).tolist()
               for _ in range(6)]
    out = {}
    for depth, total in SHAPES:
        spec = SpecConfig(total_tokens=total, depth=depth, top_k=8)
        m = SpecModel(tcfg, dcfg, spec, tparams, dparams, max_len=256,
                      dtype=jnp.float32, eos_token_id=10 ** 6)
        taus = []
        for i, p in enumerate(prompts):
            r = m.specgenerate(p, max_new_tokens=48, temperature=1.0,
                               seed=i)
            taus.extend(r.acceptance_lengths)
        out[f"{depth},{total}"] = float(np.mean(taus))
    return out


def depth_factor(depth: int, base_depth: int = 3) -> float:
    """Truncated-geometric chain model: relative τ of a ``depth``-level beam
    vs the default, anchored so τ(base_depth) = REF_TAU_T1.  Solves for the
    per-step survival probability p by bisection."""
    def tau(p, d):
        return sum(p ** k for k in range(1, d + 2))  # depth+1 levels

    lo, hi = 0.0, 1.0
    for _ in range(60):
        mid = (lo + hi) / 2
        if tau(mid, base_depth) < REF_TAU_T1:
            lo = mid
        else:
            hi = mid
    p = (lo + hi) / 2
    return tau(p, depth) / tau(p, base_depth)


def chip_sweep(taus: dict) -> dict:
    import jax
    import jax.numpy as jnp

    import bench
    from vispec_tpu.configs import SpecConfig
    from vispec_tpu.spec.spec_model import SpecModel

    cfg_d = bench.CONFIGS[0]  # 7B@2048 (the headline config)
    model = bench.build(cfg_d)
    prompt = np.random.default_rng(0).integers(
        10, cfg_d["vocab_size"] - 10, 120).tolist()
    model.quantize_draft_inplace("int8")

    # AR at T=1 (ar_generate end-to-end, same methodology as bench.py)
    model.ar_generate(prompt, max_new_tokens=8, temperature=1.0)
    t_ar = 1e9
    for _ in range(bench.REPEATS):
        res = model.ar_generate(prompt, max_new_tokens=bench.N_TOKENS,
                                temperature=1.0)
        t_ar = min(t_ar, res.decode_time / max(res.new_tokens - 1, 1))
    base_tau = taus["3,30"]
    rows = []
    for depth, total in SHAPES:
        spec = SpecConfig(total_tokens=total, depth=depth, top_k=8)
        m = SpecModel(model.tcfg, model.dcfg, spec, model.tparams,
                      model.dparams, max_len=cfg_d["max_len"],
                      dtype=model.dtype, eos_token_id=10 ** 6)
        t_round = bench._time_spec(m, prompt, temperature=1.0)
        m._target_cache = m._draft_cache = None
        # τ estimate: geometric depth truncation × toy total_token factor
        f_depth = depth_factor(depth)
        f_total = taus[f"3,{total}"] / base_tau  # total effect at base depth
        est_tau = REF_TAU_T1 * f_depth * f_total
        ratio = t_round / t_ar
        speedup = (est_tau + 1.0) / ratio
        rows.append(dict(depth=depth, total_token=total,
                         t_round_ms=round(t_round * 1e3, 3),
                         ratio=round(ratio, 4),
                         tau_toy=round(taus[f"{depth},{total}"], 3),
                         depth_factor=round(f_depth, 4),
                         total_factor=round(f_total, 4),
                         est_tau_T1=round(est_tau, 3),
                         speedup_at_ref_tau_T1=round(speedup, 3)))
    best = max(rows, key=lambda r: r["speedup_at_ref_tau_T1"])
    return dict(
        metric="tree_sweep_T1_best_speedup",
        value=best["speedup_at_ref_tau_T1"],
        unit="x",
        vs_baseline=round(best["speedup_at_ref_tau_T1"] / REF_SPEEDUP_T1, 3),
        detail=dict(
            t_ar_ms=round(t_ar * 1e3, 3), mode="int8 draft, T=1, 7B@2048",
            tau_scaling="ESTIMATE: truncated-geometric depth model anchored "
                        "at the reference's tau_T1=2.09 x toy-fixture "
                        "(tests/data/tau_fixture.npz) total_token factor — "
                        "round times are measured on-chip, taus are not",
            best=best, rows=rows,
        ),
    )


def main():
    if "--toy" in sys.argv:
        print(json.dumps(toy_taus()))
        return
    # CPU τ phase in a subprocess (the site hook pins the axon backend at
    # interpreter startup — env must be set before python starts)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = ("/root/repo:" + env.get("PYTHONPATH", "")).rstrip(":")
    r = subprocess.run([sys.executable, os.path.abspath(__file__), "--toy"],
                       capture_output=True, text=True, timeout=3000, env=env)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise SystemExit("toy tau phase failed")
    taus = json.loads(r.stdout.strip().splitlines()[-1])
    res = chip_sweep(taus)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
