"""Drive the stage-2 trainer CLI end-to-end: fabricated target ckpt + npz data
-> python -m vispec_tpu.train.main_mtp (prefetching data_iterator) -> ckpt."""
import sys, os, subprocess, glob, json
sys.path.insert(0, __file__.rsplit("/scripts", 1)[0])
sys.path.insert(0, __file__.rsplit("/scripts", 1)[0] + "/tests")
import numpy as np, jax
# cpu by default: the tiny-geometry CLI e2e is host-bound and the real-chip
# training numbers live in scripts/bench_train.py (real geometry, fenced
# device leg).  DRIVE_TRAIN_PLATFORM=axon runs this same e2e on the chip.
jax.config.update("jax_platforms",
                  os.environ.get("DRIVE_TRAIN_PLATFORM", "cpu"))
import jax.numpy as jnp
from test_from_pretrained import write_llama_ckpt, V
from vispec_tpu.configs import LlamaConfig
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.train import data_gen

base = "/tmp/drive_train/ckpt"
write_llama_ckpt(base)
cfg = json.load(open(os.path.join(base, "config.json")))
T = LlamaConfig(vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
                intermediate_size=cfg["intermediate_size"],
                num_hidden_layers=cfg["num_hidden_layers"],
                num_attention_heads=cfg["num_attention_heads"],
                num_key_value_heads=cfg["num_key_value_heads"],
                max_position_embeddings=512)
tparams = llama.init_params(T, jax.random.PRNGKey(0), jnp.float32)
cache = kv.init_cache(T.num_hidden_layers, T.num_key_value_heads, 256,
                      T.head_dim, jnp.float32)
rng = np.random.default_rng(0)
os.makedirs("/tmp/drive_train/data2", exist_ok=True)
for i in range(6):
    ids = rng.integers(1, V - 5, 16)
    embeds = jnp.pad(llama.embed(tparams, jnp.asarray(ids)), ((0, 48), (0, 0)))
    s, cache = data_gen.generate_sample(tparams, T, embeds, 16, None, cache,
                                        max_new_tokens=24, eos_token_id=10**6)
    data_gen.save_sample("/tmp/drive_train/data2", i, s)
dcfg = {"vocab_size": V, "hidden_size": cfg["hidden_size"],
        "intermediate_size": cfg["intermediate_size"],
        "num_attention_heads": cfg["num_attention_heads"],
        "num_key_value_heads": cfg["num_key_value_heads"],
        "num_hidden_layers": 1, "max_position_embeddings": 512}
json.dump(dcfg, open("/tmp/drive_train/dcfg.json", "w"))
# NOTE: no JAX_PLATFORMS=cpu — the site hook pins the axon TPU backend anyway
# (see __graft_entry__), and the env var would only disable the compile cache
env = dict(os.environ,
           PYTHONPATH=__file__.rsplit("/scripts", 1)[0] + ":"
           + os.environ.get("PYTHONPATH", ""))
r2 = subprocess.run([sys.executable, "-m", "vispec_tpu.train.main_mtp",
                     "--basepath", base,
                     "--configpath", "/tmp/drive_train/dcfg.json",
                     "--tmpdir", "/tmp/drive_train/data2",
                     "--cpdir", "/tmp/drive_train/cp",
                     "--bs", "2", "--max-len", "64", "--num-epochs", "1",
                     "--use-ours"],
                    env=env, capture_output=True, text=True,
                    timeout=int(os.environ.get("DRIVE_TRAIN_TIMEOUT", 1100)))
print("main_mtp rc:", r2.returncode)
print("\n".join((r2.stdout + r2.stderr).strip().splitlines()[-4:]))
assert r2.returncode == 0 and glob.glob("/tmp/drive_train/cp/state_*"), "no ckpt"
print("TRAIN DRIVE OK")
