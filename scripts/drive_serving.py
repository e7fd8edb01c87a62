"""Drive the continuous-batching engine end-to-end on the real chip."""
import sys, time
sys.path.insert(0, __file__.rsplit("/scripts", 1)[0])
import jax, jax.numpy as jnp
import numpy as np
from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.spec.spec_model import SpecModel

print("devices:", jax.devices())
T = LlamaConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=512)
D = DraftConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
tparams = llama.init_params(T, k1, jnp.bfloat16)
dparams = draft_mod.init_params(D, k2, jnp.bfloat16)
dparams["embed"] = tparams["embed"]
model = SpecModel(T, D, SpecConfig(total_tokens=12, depth=3, top_k=4),
                  tparams, dparams, max_len=512, dtype=jnp.bfloat16,
                  eos_token_id=10**6)
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
print("SERVING DRIVE OK")
