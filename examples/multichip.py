"""Multi-chip speculative decoding: mesh recipes for every sharding the
framework supports, runnable on virtual devices (no TPU pod needed):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py

Recipes (pick by model size / prompt length — size-1 axes are free):

  fits on one chip             -> no mesh (fastest: zero collectives)
  weights too big for one chip -> pp=2 layer-stage placement (zero weight
                                  traffic; the reference's device_map="auto")
                                  or tp=2 (splits every matmul; adds
                                  per-layer all-gathers but also splits the
                                  bandwidth-bound verify reads)
  very long prompts            -> sp=N sequence-parallel prefill
  training                     -> dp x tp (+ sp for long sequences)

With real checkpoints replace the random weights with
SpecModel.from_pretrained(..., mesh=make_mesh(tp=2), pp=..., sp=...).
"""

import sys

sys.path.insert(0, __file__.rsplit("/examples", 1)[0])

import jax

try:  # demo default: virtual CPU devices.  Unconditional: site hooks that
    # import jax at interpreter startup (axon) ignore env vars set later,
    # so JAX_PLATFORMS=cpu in the environment is NOT enough — only the
    # live config update moves the backend.
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.parallel.mesh import make_mesh
from vispec_tpu.spec.spec_model import SpecModel

TCFG = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, max_position_embeddings=512)
DCFG = DraftConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                   num_attention_heads=4, num_key_value_heads=2,
                   max_position_embeddings=512)


def build():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    return SpecModel(TCFG, DCFG, SpecConfig(total_tokens=12, depth=3, top_k=4),
                     tparams, dparams, max_len=512, dtype=jnp.float32,
                     eos_token_id=0)


def main():
    n = len(jax.devices())
    assert n >= 4, ("run with XLA_FLAGS="
                    "--xla_force_host_platform_device_count=8")
    prompt = list(range(30, 60))

    ref = build().specgenerate(prompt, max_new_tokens=24)
    print(f"single-device   : {ref.new_tokens} tokens")

    # -- tensor parallel: heads/MLP columns split, KV cache over heads --
    model = build()
    model.shard_over(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    out = model.specgenerate(prompt, max_new_tokens=24)
    assert out.sequences[:40].tolist() == ref.sequences[:40].tolist()
    print(f"tp=2            : {out.new_tokens} tokens (token-identical)")

    # -- layer-stage placement + sequence-parallel prefill --
    model = build()
    model.shard_over(make_mesh(dp=1, pp=2, sp=2, devices=jax.devices()[:4]),
                     pp=True, sp=True)
    out = model.specgenerate(prompt, max_new_tokens=24)
    assert out.sequences[:40].tolist() == ref.sequences[:40].tolist()
    print(f"pp=2 x sp=2     : {out.new_tokens} tokens (token-identical)")

    # -- int8 draft composes with tp --
    model = build()
    model.quantize_draft_inplace("int8")
    model.shard_over(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    out = model.specgenerate(prompt, max_new_tokens=24)
    print(f"int8 draft tp=2 : {out.new_tokens} tokens")

    print("multichip demo OK")


if __name__ == "__main__":
    main()
