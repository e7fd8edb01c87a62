"""Drive prefix-cached serving on the real chip."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
from _tiny_model import tiny_model

model, *_ = tiny_model()
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
