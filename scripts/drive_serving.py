"""Drive the continuous-batching engine end-to-end on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import numpy as np
from _tiny_model import tiny_model

print("devices:", jax.devices())
model, *_ = tiny_model()
rng = np.random.default_rng(7)
prompts = [rng.integers(5, 500, rng.integers(10, 40)).tolist() for _ in range(6)]
eng = model.serving_engine(batch_size=2, max_new_tokens=20, chunk_rounds=4)
t0 = time.perf_counter()
outs = eng.run_all(prompts)
dt = time.perf_counter() - t0
total = sum(len(o) for o in outs)
print(f"served 6 requests on 2 slots: {total} tokens in {dt:.1f}s, "
      f"prefills={eng._n_prefills}")
ok = 0
for p, o in zip(prompts, outs):
    ref = model.specgenerate(p, max_new_tokens=20)
    ref_new = list(ref.sequences[len(p):])
    n = min(len(o), len(ref_new))
    ok += list(o[:n]) == ref_new[:n]
print(f"outputs matching single-request specgenerate: {ok}/6")
assert ok >= 5  # bf16 argmax-tie caveat

# B=1 engine: the unit batch takes the squeezed no-vmap path in
# batch.batched_decode_rounds_chunk (vmap's degenerate [1, s, D] dots force
# 3 GB of stacked-weight relayout copies at 7B — a compile OOM) and must
# still match single-request decoding on-chip.
eng1 = model.serving_engine(batch_size=1, max_new_tokens=20, chunk_rounds=4)
outs1 = eng1.run_all(prompts[:3])
ok1 = 0
for p, o in zip(prompts[:3], outs1):
    ref = model.specgenerate(p, max_new_tokens=20)
    ref_new = list(ref.sequences[len(p):])
    n = min(len(o), len(ref_new))
    ok1 += list(o[:n]) == ref_new[:n]
print(f"B=1 engine outputs matching specgenerate: {ok1}/3")
assert ok1 >= 2

# Medusa engine: no draft transformer — the engine dispatches
# batched_medusa_rounds_chunk and admissions run medusa_prefill.
import jax.numpy as jnp
from vispec_tpu.configs import SpecConfig
from vispec_tpu.models import medusa as medusa_mod
from vispec_tpu.spec.spec_model import SpecModel

_, tcfg, dcfg, tparams, dparams = tiny_model()
k = jax.random.PRNGKey(9)
mparams = medusa_mod.init_params(tcfg.hidden_size, k, jnp.bfloat16)
mparams = jax.tree.map(
    lambda x: x + 0.01 * jax.random.normal(k, x.shape, x.dtype), mparams)
mmodel = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=12, depth=3, top_k=4),
                   tparams, dict(dparams), max_len=512, dtype=jnp.bfloat16,
                   eos_token_id=10**6, mparams=mparams)
m_prompts = prompts[:3]
m_refs = [mmodel.specgenerate(p, max_new_tokens=12) for p in m_prompts]
eng_m = mmodel.serving_engine(batch_size=2, max_new_tokens=12, chunk_rounds=4)
outs_m = eng_m.run_all(m_prompts)
okm = 0
for p, ref, o in zip(m_prompts, m_refs, outs_m):
    ref_new = list(ref.sequences[len(p):])
    n = min(len(o), len(ref_new))
    okm += list(o[:n]) == ref_new[:n]
print(f"medusa engine outputs matching medusa specgenerate: {okm}/3")
assert okm >= 2

# Sampling graph on-chip: top_k=1 at T>0 one-hots the warped target, so the
# engine's SAMPLING decode graph must reproduce the greedy outputs.
eng_s = model.serving_engine(batch_size=2, max_new_tokens=20,
                             temperature=0.7, top_k=1, chunk_rounds=4)
outs_s = eng_s.run_all(prompts[:4])
oks = 0
for p_, g, o in zip(prompts[:4], outs[:4], outs_s):
    n = min(len(o), len(g))
    oks += list(o[:n]) == list(g[:n])
print(f"T>0 top_k=1 engine outputs matching greedy: {oks}/4")
assert oks >= 3

# Per-request sampling on-chip: ONE engine (one compiled graph) serves a
# mixed batch — a greedy slot next to a T=0.7/top_k=1 slot — and each must
# match its single-config reference (top_k=1 one-hots the warped target, so
# both rows reproduce the greedy outputs).
eng_pr = model.serving_engine(batch_size=2, max_new_tokens=20, top_k=1,
                              chunk_rounds=4, per_request_sampling=True)
outs_pr = eng_pr.run_all([
    {"input_ids": prompts[0]},                      # greedy slot (defaults)
    {"input_ids": prompts[1], "temperature": 0.7},  # sampled slot
])
okp = 0
for g, o in zip(outs[:2], outs_pr):
    n = min(len(o), len(g))
    okp += list(o[:n]) == list(g[:n])
print(f"per-request mixed-sampling engine outputs matching greedy: {okp}/2")
assert okp >= 2

# Per-request TOP_K on-chip: ctor top_k=4 is the static max-k sort bucket;
# each request's k rides SpecState.samp[3] as a traced scalar.  A T=1 slot
# with k=1 (top-1 == argmax through monotonic warps) and a greedy slot with
# the default k share one graph and must both reproduce the greedy outputs.
eng_k4 = model.serving_engine(batch_size=2, max_new_tokens=20, top_k=4,
                              chunk_rounds=4, per_request_sampling=True)
outs_k4 = eng_k4.run_all([
    {"input_ids": prompts[0]},                      # greedy, default k=4
    {"input_ids": prompts[1], "temperature": 1.0, "top_k": 1},
])
okk4 = 0
for g, o in zip(outs[:2], outs_k4):
    n = min(len(o), len(g))
    okk4 += list(o[:n]) == list(g[:n])
print(f"per-request traced top_k engine outputs matching greedy: {okk4}/2")
assert okk4 >= 2

# Batched Mosaic attention on-chip: head_dim must be 128 to exercise the
# batch-grid kernel (pallas_attention._build_call batched=True; the default
# tiny model's head_dim=32 falls back to XLA).  int8 KV so the quantized
# scale DMAs run too; outputs must match single-request specgenerate (which
# uses the SINGLE-request kernel graph).
model_k, *_ = tiny_model(hidden=512, quantize_kv=True)
k_prompts = prompts[:4]
k_refs = [model_k.specgenerate(p, max_new_tokens=16) for p in k_prompts]
eng_k = model_k.serving_engine(batch_size=2, max_new_tokens=16,
                               chunk_rounds=4)
outs_k = eng_k.run_all(k_prompts)
okk = 0
for p, ref, o in zip(k_prompts, k_refs, outs_k):
    ref_new = list(ref.sequences[len(p):])
    n = min(len(o), len(ref_new))
    okk += list(o[:n]) == ref_new[:n]
print(f"batched int8-KV kernel engine outputs matching specgenerate: {okk}/4")
assert okk >= 3

# Online API on-chip (the live-server path examples/serve_http.py wraps):
# submit 2, decode a couple of chunks, submit 4 more MID-FLIGHT, drain.
eng_o = model.serving_engine(batch_size=2, max_new_tokens=20, chunk_rounds=4)
rids = [eng_o.submit(p) for p in prompts[:2]]
eng_o.step()
rids += [eng_o.submit(p) for p in prompts[2:6]]
while eng_o.pending():
    eng_o.step()
oko = 0
for p_, g, rid in zip(prompts[:6], outs[:6], rids):
    o = eng_o.results[rid]
    n = min(len(o), len(g))
    oko += list(o[:n]) == list(g[:n])
print(f"online submit/step mid-flight outputs matching run_all: {oko}/6 "
      f"(admissions={eng_o.stats['admissions']})")
assert oko >= 5 and eng_o.stats["admissions"] >= 4
print("SERVING DRIVE OK")
