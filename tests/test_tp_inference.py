"""Tensor-parallel inference: the decode round under a tp=2 GSPMD mesh must
produce the same tokens as single-device execution (the reference's answer to
model sharding was device_map layer placement — SURVEY.md §2.6; ours is
pjit-partitioned matmuls over a mesh axis)."""

import functools
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vispec_tpu.configs import DraftConfig, LlamaConfig, SpecConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.models import llama
from vispec_tpu.ops import kv_cache as kv
from vispec_tpu.parallel.mesh import make_mesh
from vispec_tpu.parallel.sharding import (
    apply_specs, draft_param_specs, llama_param_specs, shard_cache,
)
from vispec_tpu.spec import loop as spec_loop

TCFG = LlamaConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
)
DCFG = DraftConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
)
SPEC = SpecConfig(total_tokens=12, depth=3, top_k=4)


def run_rounds(tparams, dparams, target_cache, draft_cache, n=10, tcfg=TCFG,
               sp_mesh=None, dcfg=DCFG):
    sampling = spec_loop.SamplingParams()
    prompt = list(range(40, 70))
    embeds = llama.embed(tparams, jnp.asarray(prompt, jnp.int32))
    embeds = jnp.pad(embeds, ((0, 128 - len(prompt)), (0, 0)))
    if sp_mesh is not None:
        from vispec_tpu.parallel.sharding import sp_shard_prefill

        embeds = sp_shard_prefill(sp_mesh, embeds)
    plan, ms = draft_mod.make_prefill_plan(None, len(prompt), dcfg.num_q, 128)
    state = spec_loop.spec_prefill(
        tparams, dparams, tcfg, dcfg, SPEC, plan, sampling, embeds,
        target_cache, draft_cache, jax.random.PRNGKey(0), 200, ms,
    )
    big = jnp.asarray(10**6, jnp.int32)
    for _ in range(n):
        state = spec_loop.decode_round(
            tparams, dparams, tcfg, dcfg, SPEC, sampling, state, big, big,
        )
    return np.asarray(state.output)[: int(state.out_len)]


def test_tp2_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest forces 8 virtual cpu devices"
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    tc = kv.init_cache(2, 2, 256, 16, jnp.float32)
    dc = kv.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, dparams, tc, dc)

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with mesh:
        tp_t = apply_specs(mesh, tparams, llama_param_specs(TCFG))
        tp_d = apply_specs(mesh, dparams, draft_param_specs(DCFG))
        # KV caches sharded over the tp axis by KV heads — the head-sharded
        # attention activations land on the same shard with no resharding
        tc2 = shard_cache(mesh, kv.init_cache(2, 2, 256, 16, jnp.float32))
        dc2 = shard_cache(mesh, kv.init_cache(1, 2, 256, 16, jnp.float32))
        out = run_rounds(tp_t, tp_d, tc2, dc2)

    n = min(len(ref), len(out))
    assert n >= 8
    np.testing.assert_array_equal(out[:n], ref[:n])


def test_mixtral_ep2_matches_single_device():
    """Expert-parallel Mixtral: MoE experts + attention heads sharded over
    tp=2 must decode token-identically (mixtral_param_specs; the reference has
    no EP — modeling_mixtral_kv.py:488-571 loops experts on one device)."""
    from vispec_tpu.models import mixtral
    from vispec_tpu.parallel.sharding import mixtral_param_specs

    mcfg = mixtral.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, num_local_experts=4,
        num_experts_per_tok=2,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    tparams = mixtral.init_params(mcfg, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    tc = kv.init_cache(2, 2, 256, 16, jnp.float32)
    dc = kv.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, dparams, tc, dc, n=6, tcfg=mcfg)

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with mesh:
        tp_t = apply_specs(mesh, tparams, mixtral_param_specs(mcfg))
        tp_d = apply_specs(mesh, dparams, draft_param_specs(DCFG))
        tc2 = shard_cache(mesh, kv.init_cache(2, 2, 256, 16, jnp.float32))
        dc2 = shard_cache(mesh, kv.init_cache(1, 2, 256, 16, jnp.float32))
        out = run_rounds(tp_t, tp_d, tc2, dc2, n=6, tcfg=mcfg)

    n = min(len(ref), len(out))
    assert n >= 6
    np.testing.assert_array_equal(out[:n], ref[:n])


def test_sp2_prefill_matches_single_device():
    """Sequence-parallel prefill: committing the prompt embeds to
    P("sp", None) (sharding.sp_shard_prefill) shards the prefill's token axis
    over two devices; GSPMD propagates the sequence sharding and the decode
    must stay token-identical.  The reference has no sequence/context
    parallelism at all (SURVEY.md §2.6, §5)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    tc = kv.init_cache(2, 2, 256, 16, jnp.float32)
    dc = kv.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, dparams, tc, dc)

    mesh = make_mesh(dp=1, sp=2, devices=jax.devices()[:2])
    with mesh:
        sp_t = apply_specs(mesh, tparams, llama_param_specs(TCFG))
        sp_d = apply_specs(mesh, dparams, draft_param_specs(DCFG))
        tc2 = shard_cache(mesh, kv.init_cache(2, 2, 256, 16, jnp.float32))
        dc2 = shard_cache(mesh, kv.init_cache(1, 2, 256, 16, jnp.float32))
        out = run_rounds(sp_t, sp_d, tc2, dc2, sp_mesh=mesh)

    n = min(len(ref), len(out))
    assert n >= 8
    np.testing.assert_array_equal(out[:n], ref[:n])


def test_pp2_layer_placement_matches_single_device():
    """Layer-stage placement (llama_param_specs_pp): the scan-stacked layer
    weights and the target KV cache shard by depth over pp=2 — the TPU
    equivalent of the reference's device_map="auto" layer spread with
    per-device KV buffer groups (kv_cache.py:91-127).  The 1-layer draft
    stays replicated over pp.  Also composes pp=2 x tp=2 on 4 devices."""
    from vispec_tpu.parallel.sharding import llama_param_specs_pp

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    tc = kv.init_cache(2, 2, 256, 16, jnp.float32)
    dc = kv.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, dparams, tc, dc)

    for pp, tp in ((2, 1), (2, 2)):
        mesh = make_mesh(dp=1, pp=pp, tp=tp, devices=jax.devices()[: pp * tp])
        with mesh:
            pp_t = apply_specs(mesh, tparams, llama_param_specs_pp(TCFG))
            pp_d = apply_specs(mesh, dparams, draft_param_specs(DCFG))
            tc2 = shard_cache(mesh, kv.init_cache(2, 2, 256, 16, jnp.float32),
                              pp=True)
            dc2 = shard_cache(mesh, kv.init_cache(1, 2, 256, 16, jnp.float32))
            out = run_rounds(pp_t, pp_d, tc2, dc2)

        n = min(len(ref), len(out))
        assert n >= 8, f"pp={pp} tp={tp}"
        np.testing.assert_array_equal(out[:n], ref[:n])


def test_mixtral_pp2_matches_single_device():
    """Layer-stage placement of the MoE target (mixtral_param_specs_pp):
    experts stay tp-split within each pp stage; pp=2 x tp=2 must decode
    token-identically."""
    from vispec_tpu.models import mixtral
    from vispec_tpu.parallel.sharding import mixtral_param_specs_pp

    mcfg = mixtral.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, num_local_experts=4,
        num_experts_per_tok=2,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    tparams = mixtral.init_params(mcfg, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    tc = kv.init_cache(2, 2, 256, 16, jnp.float32)
    dc = kv.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, dparams, tc, dc, n=6, tcfg=mcfg)

    mesh = make_mesh(dp=1, pp=2, tp=2, devices=jax.devices()[:4])
    with mesh:
        pp_t = apply_specs(mesh, tparams, mixtral_param_specs_pp(mcfg))
        pp_d = apply_specs(mesh, dparams, draft_param_specs(DCFG))
        tc2 = shard_cache(mesh, kv.init_cache(2, 2, 256, 16, jnp.float32),
                          pp=True)
        dc2 = shard_cache(mesh, kv.init_cache(1, 2, 256, 16, jnp.float32))
        out = run_rounds(pp_t, pp_d, tc2, dc2, n=6, tcfg=mcfg)

    n = min(len(ref), len(out))
    assert n >= 6
    np.testing.assert_array_equal(out[:n], ref[:n])


def test_shard_over_api():
    """SpecModel.shard_over — the public-API multi-chip entry: tp, pp(+sp),
    and quantized-draft tp shardings must all generate token-identically to
    the unsharded model through specgenerate/ar_generate (including the
    fuse_we/fuse_wh keys _derive_fuse_mats adds, which raw draft_param_specs
    doesn't know about)."""
    from vispec_tpu.spec.spec_model import SpecModel

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    def build():
        return SpecModel(TCFG, DCFG, SPEC, tparams, dparams, max_len=512,
                         dtype=jnp.float32, eos_token_id=0)

    prompt = list(range(30, 60))
    ref = build().specgenerate(prompt, max_new_tokens=16)
    assert ref.new_tokens >= 8

    # (a) tensor parallel
    model = build()
    model.shard_over(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    out = model.specgenerate(prompt, max_new_tokens=16)
    n = min(ref.new_tokens, out.new_tokens)
    np.testing.assert_array_equal(out.sequences[: len(prompt) + n],
                                  ref.sequences[: len(prompt) + n])

    # (b) layer-stage placement composed with sequence-parallel prefill
    model = build()
    model.shard_over(make_mesh(dp=1, pp=2, sp=2, devices=jax.devices()[:4]),
                     pp=True, sp=True)
    out = model.specgenerate(prompt, max_new_tokens=16)
    n = min(ref.new_tokens, out.new_tokens)
    np.testing.assert_array_equal(out.sequences[: len(prompt) + n],
                                  ref.sequences[: len(prompt) + n])
    ar = model.ar_generate(prompt, max_new_tokens=16)
    n = min(ref.new_tokens, ar.new_tokens)
    np.testing.assert_array_equal(ar.sequences[: len(prompt) + n],
                                  ref.sequences[: len(prompt) + n])

    # (c) int8 draft + tp through the API (exercises quantized_draft_specs
    # with the fuse folds present)
    model = build()
    model.quantize_draft_inplace("int8")
    qref = model.specgenerate(prompt, max_new_tokens=16)
    model.shard_over(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    qout = model.specgenerate(prompt, max_new_tokens=16)
    n = min(qref.new_tokens, qout.new_tokens)
    assert n >= 8
    np.testing.assert_array_equal(qout.sequences[: len(prompt) + n],
                                  qref.sequences[: len(prompt) + n])


def test_batched_tp_matches_unsharded():
    """The batched path (spec/batch.generate_batch — vmapped decode rounds
    with params closed over) composes with tp sharding: GSPMD propagates the
    head/column shardings through the vmapped graph and the outputs must be
    token-identical to the unsharded batch."""
    from vispec_tpu.spec.batch import generate_batch

    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    prompts = [list(range(30, 60)), list(range(50, 75)), list(range(5, 45))]

    ref = generate_batch(tparams, dparams, TCFG, DCFG, SPEC, prompts,
                         max_new_tokens=16, max_len=256, eos_id=0,
                         dtype=jnp.float32)

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with mesh:
        out = generate_batch(
            apply_specs(mesh, tparams, llama_param_specs(TCFG)),
            apply_specs(mesh, dparams, draft_param_specs(DCFG)),
            TCFG, DCFG, SPEC, prompts,
            max_new_tokens=16, max_len=256, eos_id=0, dtype=jnp.float32)

    for r, o in zip(ref, out):
        n = min(len(r), len(o))
        assert n >= 8
        np.testing.assert_array_equal(o[:n], r[:n])


def test_train_step_dp_sp_matches_unsharded():
    """Sequence-parallel TRAINING: a dp=2 x sp=2 mesh with the batch's
    sequence axis sharded (sharding.shard_train_batch) must produce the same
    loss and updated params as the unsharded step (float tolerance — the
    gradient psum reorders reductions)."""
    import numpy as onp

    from vispec_tpu.parallel.sharding import shard_train_batch
    from vispec_tpu.train.step import TrainBatch, make_optimizer, train_step

    dcfg = DraftConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, num_q=2,
    )
    b, s, d = 2, 16, dcfg.hidden_size
    key = jax.random.PRNGKey(0)
    image_mask = onp.zeros(s, bool)
    image_mask[4:10] = True
    plan, max_span = draft_mod.make_prefill_plan(
        image_mask, s, dcfg.num_q, s, max_images=1, max_span=8)
    plans = jax.tree.map(lambda a: jnp.broadcast_to(a, (b,) + a.shape), plan)
    batch = TrainBatch(
        hidden_states=jax.random.normal(key, (b, s, d), jnp.float32),
        embeds=jax.random.normal(jax.random.PRNGKey(1), (b, s, d), jnp.float32),
        target=jax.random.normal(jax.random.PRNGKey(2), (b, s, d), jnp.float32),
        loss_mask=jnp.ones((b, s), jnp.float32),
        plans=plans,
    )
    optimizer = make_optimizer()

    def step(sharded_mesh=None):
        dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(3), jnp.float32)
        head_w = jax.random.normal(jax.random.PRNGKey(4),
                                   (d, dcfg.vocab_size), jnp.float32) * 0.02
        opt_state = optimizer.init(dparams)
        bat = batch
        if sharded_mesh is not None:
            from vispec_tpu.parallel.sharding import draft_param_specs

            with sharded_mesh:
                dparams = apply_specs(sharded_mesh, dparams,
                                      draft_param_specs(dcfg))
                bat = shard_train_batch(sharded_mesh, batch)
                return train_step(dparams, opt_state, dcfg, head_w, bat,
                                  optimizer, mtp_steps=1, max_span=max_span)
        return train_step(dparams, opt_state, dcfg, head_w, bat, optimizer,
                          mtp_steps=1, max_span=max_span)

    ref_params, _, ref_metrics = step()
    mesh = make_mesh(dp=2, sp=2, devices=jax.devices()[:4])
    sp_params, _, sp_metrics = step(mesh)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for k in ("fc_w", "img_fc_w"):
        np.testing.assert_allclose(np.asarray(sp_params[k]),
                                   np.asarray(ref_params[k]),
                                   rtol=1e-4, atol=1e-6)


def subprocess_isolated_param(fn):
    """Fresh-interpreter isolation (test_vlm_ingestion.subprocess_isolated
    rationale: XLA CPU's compiler deterministically SEGFAULTS when fresh
    sharded/vmapped graphs compile late in a long suite process; solo runs
    always pass).  This variant builds the pytest node id from the single
    parametrize value so each param runs exactly once."""

    @functools.wraps(fn)
    def wrapper(**kwargs):
        if os.environ.get("VISPEC_SUBTEST") == "1":
            return fn(**kwargs)
        node = fn.__name__
        if kwargs:
            node += "[" + "-".join(str(v) for v in kwargs.values()) + "]"
        env = {**os.environ, "VISPEC_SUBTEST": "1"}
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x",
             f"{os.path.abspath(__file__)}::{node}"],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-1000:])

    return wrapper


@pytest.mark.parametrize("mode", ["int8", "int4"])
@subprocess_isolated_param
def test_tp2_quantized_draft_matches_single_device(mode):
    """Quantized draft modes compose with tp sharding: quantized_draft_specs
    gives QTensor/Q4Tensor leaves field-wise specs (scales follow the output
    axis; row-parallel int4 replicates — see _quant_leaf_spec), and the tp=2
    decode must be token-identical to the same quantized draft on one
    device."""
    from vispec_tpu.ops.quant import quantize_draft_params
    from vispec_tpu.parallel.sharding import quantized_draft_specs

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    qparams = quantize_draft_params(dparams, tparams["lm_head"], mode=mode)

    tc = kv.init_cache(2, 2, 256, 16, jnp.float32)
    dc = kv.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, qparams, tc, dc)

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with mesh:
        tp_t = apply_specs(mesh, tparams, llama_param_specs(TCFG))
        tp_d = apply_specs(mesh, qparams, quantized_draft_specs(DCFG, qparams))
        tc2 = shard_cache(mesh, kv.init_cache(2, 2, 256, 16, jnp.float32))
        dc2 = shard_cache(mesh, kv.init_cache(1, 2, 256, 16, jnp.float32))
        out = run_rounds(tp_t, tp_d, tc2, dc2)

    n = min(len(ref), len(out))
    assert n >= 8
    np.testing.assert_array_equal(out[:n], ref[:n])


def test_shard_over_lazy_caches_and_embed_alias():
    """shard_over must NOT materialize the lazy single-request scratch caches
    (an engine/serving-only 7B model depends on them never existing — the
    idle pair is the fit/OOM margin), and must keep the draft's embed alias
    pointing at the SHARDED target embed rather than pinning the pre-shard
    replicated copy."""
    from vispec_tpu.spec.spec_model import SpecModel

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    model = SpecModel(TCFG, DCFG, SPEC, tparams, dparams, max_len=512,
                      dtype=jnp.float32, eos_token_id=0)
    assert model._target_cache is None and model._draft_cache is None

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    model.shard_over(mesh)
    # still lazy after sharding
    assert model._target_cache is None and model._draft_cache is None
    # one shared (sharded) embed buffer, not two copies / a stale full one
    assert model.dparams["embed"] is model.tparams["embed"]
    # first touch materializes WITH the mesh sharding applied
    cache = model.target_cache
    assert len(cache.k.sharding.device_set) == 2
    out = model.specgenerate(list(range(30, 60)), max_new_tokens=8)
    assert out.new_tokens >= 4


def test_mesh_specs_cover_text_only_draft():
    """The trainer's mesh path shards via quantized_draft_specs, which walks
    the ACTUAL params pytree — a vision=False (EAGLE/text-only) draft with no
    adaptor/img_fc keys must pair cleanly (the static draft_param_specs dict
    would raise a tree-structure mismatch)."""
    import dataclasses

    from vispec_tpu.parallel.sharding import quantized_draft_specs

    cfg = dataclasses.replace(DCFG, vision=False)
    dparams = draft_mod.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    assert "adaptor" not in dparams and "img_fc_w" not in dparams
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    sharded = apply_specs(mesh, dparams, quantized_draft_specs(cfg, dparams))
    assert jax.tree.structure(sharded) == jax.tree.structure(dparams)


def test_shard_cache_warns_on_multihead_nondividing():
    """A multi-head cache whose head count doesn't divide tp replicates (so
    execution stays correct) but must WARN — silent full replication of a
    target cache is a misconfiguration; the 1-head draft cache stays quiet."""
    import warnings

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        shard_cache(mesh, kv.init_cache(2, 3, 256, 16, jnp.float32))
    assert any("does not divide tp" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        shard_cache(mesh, kv.init_cache(1, 1, 256, 16, jnp.float32))
    assert not w


def test_mesh_from_args_contract():
    """The one shared CLI mesh helper: None when all axes are 1, validation
    of the dp/sp-shardable quantities, and a real mesh otherwise."""
    import pytest

    from vispec_tpu.parallel.mesh import mesh_from_args

    assert mesh_from_args() is None
    mesh = mesh_from_args(tp=2, bs=4, max_len=64)
    assert mesh is not None and mesh.shape["tp"] == 2
    with pytest.raises(ValueError, match="--dp"):
        mesh_from_args(dp=2, bs=3)
    with pytest.raises(ValueError, match="--sp"):
        mesh_from_args(sp=2, max_len=65)


def test_shard_cache_warns_on_multilayer_nondividing_pp():
    """pp replication of a multi-layer cache is the same every-chip-holds-
    everything misconfiguration as the tp case and must warn too; the 1-layer
    draft cache stays quiet."""
    import warnings

    mesh = make_mesh(dp=1, pp=2, devices=jax.devices()[:2])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        shard_cache(mesh, kv.init_cache(3, 2, 64, 16, jnp.float32), pp=True)
    assert any("does not divide pp" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        shard_cache(mesh, kv.init_cache(1, 2, 64, 16, jnp.float32), pp=True)
    assert not w


def _vision_isolated(fn):
    from tests.test_vlm_ingestion import subprocess_isolated

    return subprocess_isolated(fn)


@_vision_isolated
def test_tp2_vision_request_matches_single_device(tmp_path):
    """A VISION request under tensor parallelism: the vision tower/projector
    (vparams — untouched by shard_over, tiny next to the backbone) composes
    with tp-sharded text weights and caches, token-identically to the
    unsharded model.  Subprocess-isolated: fresh vmapped-vision compiles late
    in a shared worker hit this jax build's XLA:CPU segfault (see
    test_vlm_ingestion.subprocess_isolated)."""
    from tests.test_vlm_ingestion import _image, _vision_prompt
    from tests.vlm_fixtures import write_llava_ckpt, write_vision_draft_ckpt
    from vispec_tpu.spec.spec_model import SpecModel

    tdir, ddir = str(tmp_path / "t"), str(tmp_path / "d")
    write_llava_ckpt(tdir, anyres=True)
    write_vision_draft_ckpt(ddir)

    ref_model = SpecModel.from_pretrained(
        tdir, ddir, total_token=12, depth=3, top_k=4, max_len=512,
        dtype=jnp.float32)
    img = _image(40, 40)
    ids, _ = _vision_prompt(ref_model, (40, 40))
    ref = ref_model.specgenerate(ids, max_new_tokens=10, pixel_values=img,
                                 image_size=(40, 40))

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    tp_model = SpecModel.from_pretrained(
        tdir, ddir, total_token=12, depth=3, top_k=4, max_len=512,
        dtype=jnp.float32, mesh=mesh)
    out = tp_model.specgenerate(ids, max_new_tokens=10, pixel_values=img,
                                image_size=(40, 40))
    n = min(ref.new_tokens, out.new_tokens)
    assert n >= 5
    np.testing.assert_array_equal(
        out.sequences[: len(ids) + n], ref.sequences[: len(ids) + n])


def test_tp2_medusa_matches_single_device():
    """Medusa drafting under tensor parallelism: the heads (mparams — small,
    untouched by shard_over like vparams) compose with tp-sharded target
    weights and caches token-identically."""
    from vispec_tpu.models import medusa as medusa_mod
    from vispec_tpu.spec.spec_model import SpecModel

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    mparams = medusa_mod.init_params(TCFG.hidden_size, k3, jnp.float32)
    mparams = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(k3, x.shape, x.dtype), mparams)

    def build():
        return SpecModel(TCFG, DCFG, SPEC, dict(tparams), dict(dparams),
                         max_len=512, dtype=jnp.float32, eos_token_id=10**6,
                         mparams=jax.tree.map(lambda x: x, mparams))

    prompt = list(range(30, 60))
    ref_model = build()
    ref = ref_model.specgenerate(prompt, max_new_tokens=12)

    tp_model = build()
    tp_model.shard_over(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    out = tp_model.specgenerate(prompt, max_new_tokens=12)
    n = min(ref.new_tokens, out.new_tokens)
    assert n >= 6
    np.testing.assert_array_equal(
        out.sequences[: len(prompt) + n], ref.sequences[: len(prompt) + n])


def test_tp2_qkv_bias_matches_single_device():
    """Qwen2-style qkv_bias target + draft under tp=2: the column-parallel
    bias vectors (bq/bk/bv split with their heads, sharding.py) must stay
    token-identical to single-device execution."""
    import dataclasses

    tcfg = dataclasses.replace(TCFG, qkv_bias=True)
    dcfg = dataclasses.replace(DCFG, qkv_bias=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    tparams = llama.init_params(tcfg, k1, jnp.float32)
    dparams = draft_mod.init_params(dcfg, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]
    assert "bq" in tparams["layers"]  # bias actually present

    tc = kv.init_cache(2, 2, 256, 16, jnp.float32)
    dc = kv.init_cache(1, 2, 256, 16, jnp.float32)
    ref = run_rounds(tparams, dparams, tc, dc, n=6, tcfg=tcfg, dcfg=dcfg)

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with mesh:
        tp_t = apply_specs(mesh, tparams, llama_param_specs(tcfg))
        tp_d = apply_specs(mesh, dparams, draft_param_specs(dcfg))
        tc2 = shard_cache(mesh, kv.init_cache(2, 2, 256, 16, jnp.float32))
        dc2 = shard_cache(mesh, kv.init_cache(1, 2, 256, 16, jnp.float32))
        out = run_rounds(tp_t, tp_d, tc2, dc2, n=6, tcfg=tcfg, dcfg=dcfg)

    n = min(len(ref), len(out))
    assert n >= 6
    np.testing.assert_array_equal(out[:n], ref[:n])


def test_tp2_quantized_target_matches_single_device():
    """int8 TARGET weights under tp=2 (quantize_target_inplace + shard_over):
    quantize_aware_specs expands each stacked weight's spec to field-wise
    QTensor specs (scale [L, out] follows the layer and output axes), and the
    sharded decode must be token-identical to the same quantized target on
    one device."""
    from vispec_tpu.spec.spec_model import SpecModel

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    tparams = llama.init_params(TCFG, k1, jnp.float32)
    dparams = draft_mod.init_params(DCFG, k2, jnp.float32)
    dparams["embed"] = tparams["embed"]

    def build():
        m = SpecModel(TCFG, DCFG, SPEC, tparams, dparams, max_len=512,
                      dtype=jnp.float32, eos_token_id=0)
        m.quantize_target_inplace()
        return m

    prompt = list(range(35, 65))
    ref = build().specgenerate(prompt, max_new_tokens=16)
    assert ref.new_tokens >= 8

    model = build()
    model.quantize_draft_inplace("int8")  # rank_head aliases the int8 head
    model.shard_over(make_mesh(dp=1, tp=2, devices=jax.devices()[:2]))
    from vispec_tpu.ops.quant import QTensor
    assert isinstance(model.tparams["layers"]["wq"], QTensor)
    out = model.specgenerate(prompt, max_new_tokens=16)
    n = min(ref.new_tokens, out.new_tokens)
    assert n >= 8
    np.testing.assert_array_equal(
        out.sequences[: len(prompt) + n], ref.sequences[: len(prompt) + n])
