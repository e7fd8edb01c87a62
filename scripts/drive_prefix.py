"""Drive prefix-cached serving on the real chip."""
import sys, time
sys.path.insert(0, __file__.rsplit("/scripts", 1)[0])
import jax, jax.numpy as jnp
import numpy as np
from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.spec.spec_model import SpecModel

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
rng = np.random.default_rng(9)
prefix = rng.integers(5, 500, 30).tolist()
prompts = [prefix + rng.integers(5, 500, 12).tolist() for _ in range(4)]
eng = model.serving_engine(batch_size=2, max_new_tokens=16, chunk_rounds=4,
                           pad_bucket=128, prefix_ids=prefix, suffix_bucket=64)
outs = eng.run_all(prompts)
ok = 0
for p, o in zip(prompts, outs):
    ref = model.specgenerate(p, max_new_tokens=16)
    ref_new = list(ref.sequences[len(p):])
    n = min(len(o), len(ref_new))
    ok += list(o[:n]) == ref_new[:n]
print(f"prefix-cached serving: {ok}/4 match full-prompt specgenerate")
assert ok >= 3
print("PREFIX DRIVE OK")
