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

# post-generation ConversationSnapshot: turn-2 continuation from turn-1's
# committed KV must equal the full re-prefill path (multi-turn eval reuse)
p1 = rng.integers(5, 500, 24).tolist()
r1 = model.specgenerate(p1, max_new_tokens=12, keep_hiddens=True)
snap = model.last_snapshot
assert snap is not None
p2 = list(r1.sequences) + rng.integers(5, 500, 10).tolist()
full = model.specgenerate(p2, max_new_tokens=12)
cont = model.specgenerate(p2, max_new_tokens=12, continue_from=snap)
n = min(full.new_tokens, cont.new_tokens)
match = sum(a == b for a, b in
            zip(full.sequences[: len(p2) + n], cont.sequences[: len(p2) + n]))
print(f"conversation snapshot: {match}/{len(p2) + n} tokens match full prefill")
assert match >= len(p2) + n - 2  # argmax-tie caveat
print("PREFIX DRIVE OK")
