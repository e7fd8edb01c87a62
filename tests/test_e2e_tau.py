"""Full-pipeline proof: generate data from a tiny target, train the draft for a
few epochs, and verify speculative decoding achieves real acceptance (tau > 1).

An untrained draft gets tau == 1.0 (no proposals accepted); this exercises
data_gen -> trainer -> spec loop producing genuine speedup-by-acceptance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.spec.spec_model import SpecModel
from vispec_tpu.train import data_gen, trainer
from vispec_tpu.train.step import make_optimizer, train_step

T = LlamaConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512)
D = DraftConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512)


def test_trained_draft_gets_accepted(tmp_path):
    tparams = llama.init_params(T, jax.random.PRNGKey(0), jnp.float32)
    cache = kv.init_cache(2, 2, 256, 16, jnp.float32)
    rng = np.random.default_rng(0)
    for i in range(12):
        ids = rng.integers(1, 90, 16)
        embeds = llama.embed(tparams, jnp.asarray(ids))
        embeds = jnp.pad(embeds, ((0, 64 - len(ids)), (0, 0)))
        sample, cache = data_gen.generate_sample(
            tparams, T, embeds, len(ids), None, cache,
            max_new_tokens=48, eos_token_id=999,
        )
        data_gen.save_sample(str(tmp_path), i, sample)

    cfg = trainer.TrainConfig(lr=3e-3, bs=2, max_len=64, mtp_steps=1,
                              warmup_steps=5, total_steps=4000, max_images=1,
                              max_span_bucket=8, noise_std=0.05)
    dparams = draft_mod.init_params(D, jax.random.PRNGKey(1), jnp.float32)
    # NOTE: train_step donates dparams — sharing the target's embed buffer
    # would invalidate tparams["embed"]; copy it.
    dparams["embed"] = tparams["embed"] + 0
    head_w = tparams["lm_head"].astype(jnp.float32)
    opt = make_optimizer(cfg.lr, cfg.warmup_steps, cfg.total_steps, cfg.grad_clip)
    ost = opt.init(dparams)
    for epoch in range(30):
        for batch, _ in trainer.data_iterator(str(tmp_path), cfg, D, seed=epoch):
            dparams, ost, metrics = train_step(
                dparams, ost, D, head_w, batch, opt, mtp_steps=1, max_span=8,
            )

    model = SpecModel(T, D, SpecConfig(total_tokens=16, depth=3, top_k=4),
                      tparams, dparams, max_len=512, dtype=jnp.float32,
                      eos_token_id=999)
    taus = []
    for s in range(4):
        prompt = rng.integers(1, 90, 16).tolist()
        r = model.specgenerate(prompt, max_new_tokens=40)
        taus.extend(a + 1 for a in r.acceptance_lengths)
        # losslessness under a trained draft too
        ar = model.ar_generate(prompt, max_new_tokens=40)
        n = min(r.new_tokens, ar.new_tokens, 40)
        assert r.sequences[: 16 + n].tolist() == ar.sequences[: 16 + n].tolist()
    # 30-epoch toy training reliably clears ~1.5; 1.35 leaves training-noise
    # margin.  The deterministic floor lives in test_tau_regression_fixture
    # (stored 60-epoch checkpoint, tau 2.04).
    assert np.mean(taus) >= 1.35, f"trained draft tau too low: {np.mean(taus)}"


def _fixture_params(z, side):
    out = {}
    for key in z.files:
        if not key.startswith(side + "/"):
            continue
        parts = key[2:].split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(z[key])
    return out


def test_tau_regression_fixture():
    """Deterministic proposal-quality floor: a stored trained toy checkpoint
    (scripts/make_tau_fixture.py) must reproduce its recorded greedy tau.
    The statistical pipeline test above proves training works; this one
    catches quality regressions in the draft/beam/acceptance path without
    training noise (VERDICT r2 next #10)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "tau_fixture.npz")
    z = np.load(path)
    tparams = _fixture_params(z, "t")
    dparams = _fixture_params(z, "d")
    recorded = float(z["__tau__"])
    assert recorded >= 1.5, f"fixture itself is weak: {recorded}"

    model = SpecModel(T, D, SpecConfig(total_tokens=16, depth=3, top_k=4),
                      tparams, dparams, max_len=512, dtype=jnp.float32,
                      eos_token_id=999)
    taus = []
    for s in range(6):
        prompt = np.random.default_rng(100 + s).integers(1, 90, 16).tolist()
        r = model.specgenerate(prompt, max_new_tokens=40)
        taus.extend(a + 1 for a in r.acceptance_lengths)
        ar = model.ar_generate(prompt, max_new_tokens=40)
        n = min(r.new_tokens, ar.new_tokens, 40)
        assert r.sequences[: 16 + n].tolist() == ar.sequences[: 16 + n].tolist()
    tau = float(np.mean(taus))
    # deterministic up to argmax ties / platform float detail: small margin
    assert tau >= recorded - 0.15, (tau, recorded)


def test_quantized_draft_losslessness_and_tau(tmp_path):
    """int8 draft mode (ops/quant.py): greedy output still equals AR exactly
    (the verify pass keeps exact weights), and a trained draft's acceptance
    survives weight-only int8 (tau within noise of the bf16 draft)."""
    tparams = llama.init_params(T, jax.random.PRNGKey(0), jnp.float32)
    cache = kv.init_cache(2, 2, 256, 16, jnp.float32)
    rng = np.random.default_rng(0)
    for i in range(8):
        ids = rng.integers(1, 90, 16)
        embeds = llama.embed(tparams, jnp.asarray(ids))
        embeds = jnp.pad(embeds, ((0, 64 - len(ids)), (0, 0)))
        sample, cache = data_gen.generate_sample(
            tparams, T, embeds, len(ids), None, cache,
            max_new_tokens=48, eos_token_id=999,
        )
        data_gen.save_sample(str(tmp_path), i, sample)

    cfg = trainer.TrainConfig(lr=3e-3, bs=2, max_len=64, mtp_steps=1,
                              warmup_steps=5, total_steps=4000, max_images=1,
                              max_span_bucket=8, noise_std=0.05)
    dparams = draft_mod.init_params(D, jax.random.PRNGKey(1), jnp.float32)
    dparams["embed"] = tparams["embed"] + 0
    head_w = tparams["lm_head"].astype(jnp.float32)
    opt = make_optimizer(cfg.lr, cfg.warmup_steps, cfg.total_steps, cfg.grad_clip)
    ost = opt.init(dparams)
    for epoch in range(20):
        for batch, _ in trainer.data_iterator(str(tmp_path), cfg, D, seed=epoch):
            dparams, ost, metrics = train_step(
                dparams, ost, D, head_w, batch, opt, mtp_steps=1, max_span=8,
            )

    spec = SpecConfig(total_tokens=16, depth=3, top_k=4)

    def run(quantize):
        model = SpecModel(T, D, spec, tparams, dict(dparams), max_len=512,
                          dtype=jnp.float32, eos_token_id=999,
                          quantize_draft=quantize)
        taus = []
        for s in range(4):
            prompt = np.random.default_rng(100 + s).integers(1, 90, 16).tolist()
            r = model.specgenerate(prompt, max_new_tokens=32)
            taus.extend(a + 1 for a in r.acceptance_lengths)
            ar = model.ar_generate(prompt, max_new_tokens=32)
            n = min(r.new_tokens, ar.new_tokens, 32)
            assert r.sequences[: 16 + n].tolist() == ar.sequences[: 16 + n].tolist()
        return float(np.mean(taus))

    tau_bf16 = run(False)
    tau_int8 = run(True)
    # int8 proposals must stay useful: within 15% of the exact draft's tau
    assert tau_int8 >= 1.1, f"int8 draft tau collapsed: {tau_int8}"
    assert tau_int8 >= 0.85 * tau_bf16, (tau_bf16, tau_int8)
    # int4 (packed, per-group-128): losslessness enforced inside run();
    # tau may cost a few % more than int8 but must not collapse
    tau_int4 = run("int4")
    tau_i4head = run("int4_head")
    tau_mixed = run("mixed")  # static per-matrix winners table
    tau_auto = run("auto")  # per-matrix mixed bf16/int8/int4
    assert tau_int4 >= 1.1, f"int4 draft tau collapsed: {tau_int4}"
    assert tau_int4 >= 0.80 * tau_bf16, (tau_bf16, tau_int4)
    assert tau_i4head >= 0.85 * tau_bf16, (tau_bf16, tau_i4head)
    assert tau_mixed >= 0.85 * tau_bf16, (tau_bf16, tau_mixed)
    assert tau_auto >= 0.85 * tau_bf16, (tau_bf16, tau_auto)
    print(f"tau bf16={tau_bf16:.3f} int8={tau_int8:.3f} "
          f"int4={tau_int4:.3f} int4_head={tau_i4head:.3f} "
          f"mixed={tau_mixed:.3f} auto={tau_auto:.3f}")


def test_tau_fixture_sampling_T1():
    """Sampling-path acceptance on the trained fixture, two anchors:

    1. top_k=1 at T=1 one-hots the warped target, so the single-request
       sampling graph must reproduce the greedy OUTPUT exactly (same
       invariant as the batched/engine variants).
    2. Rejection acceptance follows the warped target's candidate mass: the
       raw toy target is near-uniform (p_argmax ~2%, tau ~1.02 at any T —
       mathematically expected, NOT a machinery failure), so sharpen it by
       scaling lm_head (order-preserving); at T=0.5 the sharpened target
       must accept sampled proposals at a real rate, and more than at T=1.
       This anchors bench.py's ratio_T1 claim: acceptance responds to the
       target distribution exactly as the reference's T=1 results block
       assumes."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "tau_fixture.npz")
    z = np.load(path)
    tparams = _fixture_params(z, "t")
    dparams = _fixture_params(z, "d")

    model = SpecModel(T, D, SpecConfig(total_tokens=16, depth=3, top_k=4),
                      tparams, dparams, max_len=512, dtype=jnp.float32,
                      eos_token_id=999)
    prompt = np.random.default_rng(200).integers(1, 90, 16).tolist()
    greedy = model.specgenerate(prompt, max_new_tokens=30)
    onehot = model.specgenerate(prompt, max_new_tokens=30, temperature=1.0,
                                top_k=1, seed=3)
    n = min(greedy.new_tokens, onehot.new_tokens)
    assert n >= 10
    assert onehot.sequences[: 16 + n].tolist() == \
        greedy.sequences[: 16 + n].tolist()

    sharp = dict(tparams)
    sharp["lm_head"] = tparams["lm_head"] * 8.0
    model_s = SpecModel(T, D, SpecConfig(total_tokens=16, depth=3, top_k=4),
                        sharp, dparams, max_len=512, dtype=jnp.float32,
                        eos_token_id=999)

    def mean_tau(temperature):
        taus = []
        for s_ in range(6):
            p_ = np.random.default_rng(200 + s_).integers(1, 90, 16).tolist()
            r = model_s.specgenerate(p_, max_new_tokens=40,
                                     temperature=temperature, seed=s_)
            taus.extend(a + 1 for a in r.acceptance_lengths)
        return float(np.mean(taus))

    tau_t05, tau_t1 = mean_tau(0.5), mean_tau(1.0)
    # measured on this fixture: ~1.32 at T=0.5, ~1.07 at T=1
    assert tau_t05 >= 1.15, f"sharp-target T=0.5 tau collapsed: {tau_t05}"
    assert tau_t05 > tau_t1, (tau_t05, tau_t1)
