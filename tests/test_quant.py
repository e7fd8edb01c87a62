"""int4 packed quantization (ops/quant.py): round-trip quality, XLA-fallback
exactness, and Pallas-kernel parity (interpret mode on CPU).

The draft-side quantization is a TPU-native bandwidth optimization with no
reference counterpart (the reference runs the draft in fp16,
cnets_ours.py:664-1238); greedy losslessness is untouched because the target
verify stays exact bf16 (SURVEY.md §4 oracle 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vispec_tpu.ops import quant


@pytest.fixture(scope="module")
def wx():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((512, 1024)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 512)), jnp.bfloat16)
    return w, x


def test_q4_roundtrip_error(wx):
    w, _ = wx
    q4 = quant.quantize_q4(w, group_size=128)
    assert q4.packed.dtype == jnp.uint8
    assert q4.packed.shape == (256, 1024)
    assert q4.s.shape == (4, 1024)  # 512 rows / 128-group
    back = quant.dequantize(q4, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # per-group symmetric int4: |err| <= s/2 per element
    smax = float(np.max(np.asarray(q4.s)))
    assert float(err.max()) <= smax / 2 + 1e-7
    # int4 must be meaningfully tighter than a constant predictor
    assert float(err.mean()) < float(np.abs(np.asarray(w)).mean()) * 0.2


def test_q4_column_chunking_is_exact(wx):
    """The OOM-avoiding column-chunked path (lm_head-sized N) must produce
    bit-identical packed bytes and scales to the one-shot path."""
    w, _ = wx
    whole = quant.quantize_q4(w, group_size=128)
    chunked = quant.quantize_q4(w, group_size=128, chunk_cols=192)
    assert np.array_equal(np.asarray(whole.packed), np.asarray(chunked.packed))
    assert np.array_equal(np.asarray(whole.s), np.asarray(chunked.s))


def test_q4_fallback_matches_explicit_dequant(wx):
    w, x = wx
    q4 = quant.quantize_q4(w, group_size=128)
    y = quant.qdot4(x, q4)
    ref = jnp.dot(x, quant.dequantize(q4, jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-2,
                               atol=1e-3)


def test_q4_pallas_kernel_matches_fallback(wx):
    w, x = wx
    q4 = quant.quantize_q4(w, group_size=128)
    y_pl = quant._q4_matmul(x, q4.packed, q4.s, interpret=True)
    wd = quant._q4_dequant(q4)
    ref = jnp.dot(x, wd, preferred_element_type=jnp.float32)
    # kernel does per-group dots scaled on the OUTPUT; fallback scales the
    # weights then one dot — same math, different accumulation order
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(ref), rtol=2e-2,
                               atol=5e-3)


def test_q4_pallas_kernel_multi_group():
    """Deep-K path: several 128-row groups per half exercises the in-kernel
    fori_loop (the w_down kh=5504 case at 7B scale runs 43 iterations)."""
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((768, 512)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 768)), jnp.bfloat16)
    q4 = quant.quantize_q4(w, group_size=128)
    assert quant._q4_tile_n(*q4.packed.shape) == 512
    y_pl = quant._q4_matmul(x, q4.packed, q4.s, interpret=True)
    ref = jnp.dot(x, quant._q4_dequant(q4), preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_q4_vector_input(wx):
    w, _ = wx
    q4 = quant.quantize_q4(w)
    v = jnp.ones((512,), jnp.bfloat16)
    y = quant.qdot(v, q4)
    assert y.shape == (1024,)


def test_q4_odd_group_sizes():
    # K/2 not divisible by 128 (e.g. 11008 -> 5504 = 43*128 works, but 96 -> 48
    # needs the group shrink path)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((96, 256)), jnp.float32)
    q4 = quant.quantize_q4(w, group_size=128)
    assert q4.packed.shape == (48, 256)
    back = quant.dequantize(q4, jnp.float32)
    assert np.isfinite(np.asarray(back)).all()
    x = jnp.asarray(rng.standard_normal((4, 96)), jnp.bfloat16)
    y = quant.qdot(x, q4)
    ref = jnp.dot(x, back.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-2, atol=1e-3)


def test_quantize_draft_params_modes():
    rng = np.random.default_rng(2)
    layer = {k: jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
             for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")}
    dparams = {"layer": layer, "embed": jnp.zeros((10, 64))}
    head = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    q8 = quant.quantize_draft_params(dparams, head, mode="int8")
    assert isinstance(q8["layer"]["wq"], quant.QTensor)
    assert isinstance(q8["rank_head"], quant.QTensor)
    q4 = quant.quantize_draft_params(dparams, head, mode="int4")
    assert isinstance(q4["layer"]["wq"], quant.Q4Tensor)
    assert isinstance(q4["rank_head"], quant.Q4Tensor)
    mixed = quant.quantize_draft_params(dparams, head, mode="int4_head")
    assert isinstance(mixed["layer"]["wq"], quant.QTensor)
    assert isinstance(mixed["rank_head"], quant.Q4Tensor)
    with pytest.raises(ValueError):
        quant.quantize_draft_params(dparams, head, mode="int2")
    # originals untouched
    assert not isinstance(dparams["layer"]["wq"], (quant.QTensor, quant.Q4Tensor))


def test_quantize_draft_params_auto_heuristic():
    """mode="auto" off-TPU uses the measured-at-7B heuristic: int4 for deep
    (K >= 2N), int8 for vocab-like (N >= 4K), bf16 for wide mlp-up."""
    rng = np.random.default_rng(3)
    layer = {
        "wq": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
        "w_up": jnp.asarray(rng.standard_normal((64, 128)), jnp.float32),
        "w_down": jnp.asarray(rng.standard_normal((128, 64)), jnp.float32),
    }
    dparams = {"layer": layer, "embed": jnp.zeros((10, 64))}
    head = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    out = quant.quantize_draft_params(dparams, head, mode="auto")
    assert quant.last_auto_choices["wq"] == "int8"
    assert quant.last_auto_choices["w_down"] == "int4"
    assert quant.last_auto_choices["w_up"] == "bf16"
    assert quant.last_auto_choices["rank_head"] == "int8"  # 256 >= 4*64
    assert isinstance(out["layer"]["w_down"], quant.Q4Tensor)
    assert isinstance(out["layer"]["wq"], quant.QTensor)
    assert out["layer"]["w_up"].dtype == jnp.bfloat16
    assert isinstance(out["rank_head"], quant.QTensor)
    # wide head (bf16 fastest) => NO duplicated ranking copy is stored
    wide_head = jnp.asarray(rng.standard_normal((64, 129)), jnp.float32)
    out2 = quant.quantize_draft_params(dparams, wide_head, mode="auto")
    assert quant.last_auto_choices["rank_head"] == "bf16"
    assert "rank_head" not in out2


def test_quantize_draft_params_mixed_is_static_heuristic(monkeypatch):
    """mode="mixed" applies _heuristic_repr per matrix and NEVER measures —
    it must be deterministic and chip-free even on a live TPU."""
    rng = np.random.default_rng(4)
    layer = {
        "wq": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
        "w_up": jnp.asarray(rng.standard_normal((64, 128)), jnp.float32),
        "w_down": jnp.asarray(rng.standard_normal((128, 64)), jnp.float32),
    }
    dparams = {"layer": layer, "embed": jnp.zeros((10, 64))}
    head = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)

    def boom(*a, **k):
        raise AssertionError("mixed mode must not measure on-chip")

    monkeypatch.setattr(quant, "_measure_repr", boom)
    monkeypatch.setattr(quant, "_auto_repr", boom)
    out = quant.quantize_draft_params(dparams, head, mode="mixed")
    assert quant.last_auto_choices == {
        "wq": "int8", "w_up": "bf16", "w_down": "int4", "rank_head": "int8"}
    assert isinstance(out["layer"]["w_down"], quant.Q4Tensor)
    assert isinstance(out["rank_head"], quant.QTensor)
