"""Per-fusion TPU profile of the speculative decode round vs the AR step.

Builds the bench 7B@2048 model (random weights), traces one chunk of decode
rounds and one chunk of AR steps with jax.profiler, then parses the xplane
proto directly (the tensorboard plugin's native converter is broken in this
image — see CLAUDE.md) and prints the top fusions grouped per dispatch.

Usage:  python scripts/profile_round.py [7B@2048|7B@1024|1B@1024] [T] [quant]
                                        [method] [batch]
        T       sampling temperature for both paths (default 0.0 = greedy)
        quant   draft quant mode (int8/int4/mixed/auto; default bf16)
        method  drafter (vispec default / eagle / medusa)
        batch   >1 profiles the BATCHED serving engine instead (int8
                target+KV+draft — the SCALING.md serving config; shows the
                batch-grid Mosaic kernel and any vmap-induced relayouts)
"""

import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import glob
import collections

import numpy as np
import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench


def parse_xplane(logdir):
    """Return {plane_name: [(event_name, total_us, count)]} from newest trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane under {logdir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    out = {}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = collections.defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name][0] += ev.duration_ps / 1e6  # ps -> us
                agg[name][1] += 1
        out[plane.name] = sorted(
            ((k, v[0], v[1]) for k, v in agg.items()), key=lambda t: -t[1]
        )
    return out


def show(title, table, top=40):
    print(f"\n==== {title} ====")
    total = sum(us for _, us, _ in table)
    print(f"{'us_total':>10} {'count':>6} {'us_each':>9}  name   (plane total {total:.0f}us)")
    for name, us, n in table[:top]:
        print(f"{us:10.1f} {n:6d} {us / max(n, 1):9.2f}  {name[:110]}")


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "7B@2048"
    temperature = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    quant = sys.argv[3] if len(sys.argv) > 3 else ""
    method = sys.argv[4] if len(sys.argv) > 4 else "vispec"
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    cfg = next(c for c in bench.CONFIGS if c["label"] == label)
    if batch > 1:
        import time

        model = bench.build(cfg, quantize_kv=True)
        model.quantize_target_inplace("int8")
        model.quantize_draft_inplace("int8")
        rng = np.random.default_rng(0)
        prompts = [rng.integers(10, cfg["vocab_size"] - 10, 100).tolist()
                   for _ in range(batch)]
        eng = model.serving_engine(batch_size=batch, max_new_tokens=48)
        eng.run_all(prompts)  # warm every graph
        logdir = "/tmp/vispec_prof_batch"
        t0 = time.perf_counter()
        with jax.profiler.trace(logdir):
            outs = eng.run_all(prompts)
        wall = time.perf_counter() - t0
        toks = sum(len(o) for o in outs)
        print(f"batched engine B={batch} {label}: {toks} toks in {wall:.2f}s "
              f"=> {toks / wall:.1f} tok/s (profiler-inflated; see CLAUDE.md)")
        for plane, table in parse_xplane(logdir).items():
            show(f"BATCH{batch} {plane}", table)
        return
    model = bench.build(cfg)
    if method == "medusa":
        from vispec_tpu.models import medusa as medusa_mod
        from vispec_tpu.spec.spec_model import SpecModel

        mparams = medusa_mod.init_params(model.tcfg.hidden_size,
                                         jax.random.PRNGKey(8), model.dtype)
        model = SpecModel(model.tcfg, model.dcfg, model.spec, model.tparams,
                          model.dparams, max_len=cfg["max_len"],
                          dtype=model.dtype, eos_token_id=10**6,
                          mparams=mparams)
    elif method == "eagle":
        from vispec_tpu.configs import DraftConfig
        from vispec_tpu.models import draft as draft_mod
        from vispec_tpu.spec.spec_model import SpecModel

        dcfg_e = DraftConfig(
            vocab_size=model.tcfg.vocab_size,
            hidden_size=model.tcfg.hidden_size,
            intermediate_size=model.tcfg.intermediate_size,
            num_attention_heads=model.tcfg.num_attention_heads,
            num_key_value_heads=model.tcfg.num_key_value_heads,
            max_position_embeddings=cfg["max_len"], vision=False,
        )
        dparams_e = draft_mod.init_params(dcfg_e, jax.random.PRNGKey(7),
                                          model.dtype)
        dparams_e["embed"] = model.tparams["embed"]
        model = SpecModel(model.tcfg, dcfg_e, model.spec, model.tparams,
                          dparams_e, max_len=cfg["max_len"],
                          dtype=model.dtype, eos_token_id=10**6)
    if quant:
        model.quantize_draft_inplace(quant)
    prompt = np.random.default_rng(0).integers(10, cfg["vocab_size"] - 10, 120).tolist()

    # compile + warm everything
    model.specgenerate(prompt, max_new_tokens=8, temperature=temperature)
    model.ar_generate(prompt, max_new_tokens=8, temperature=temperature)

    logdir = "/tmp/vispec_prof_spec"
    with jax.profiler.trace(logdir):
        res = model.specgenerate(prompt, max_new_tokens=64,
                                 temperature=temperature)
    print(f"spec: {res.rounds} rounds, decode_time {res.decode_time * 1e3:.1f}ms "
          f"=> {res.decode_time / max(res.rounds, 1) * 1e3:.2f}ms/round")
    for plane, table in parse_xplane(logdir).items():
        show(f"SPEC {plane}", table)

    logdir = "/tmp/vispec_prof_ar"
    with jax.profiler.trace(logdir):
        res = model.ar_generate(prompt, max_new_tokens=64,
                                temperature=temperature)
    print(f"\nar: {res.new_tokens} tokens, decode_time {res.decode_time * 1e3:.1f}ms "
          f"=> {res.decode_time / max(res.new_tokens - 1, 1) * 1e3:.2f}ms/step")
    for plane, table in parse_xplane(logdir).items():
        show(f"AR {plane}", table)


if __name__ == "__main__":
    main()
