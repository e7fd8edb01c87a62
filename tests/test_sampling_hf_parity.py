"""Logits-warper parity against the HF processors the reference uses
(utils.py:39-55): temperature, top-p (incl. tie handling), top-k."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
hf = pytest.importorskip("transformers.generation.logits_process")

import jax.numpy as jnp

from vispec_tpu.ops.sampling import process_logits


def _ref(logits_np, temperature, top_p, top_k):
    procs = []
    if temperature >= 1e-5 and temperature != 1.0:
        procs.append(hf.TemperatureLogitsWarper(temperature))
    if 1e-8 <= top_p < 1.0:
        procs.append(hf.TopPLogitsWarper(top_p))
    if top_k > 0:
        procs.append(hf.TopKLogitsWarper(top_k))
    t = torch.tensor(logits_np)
    for p in procs:
        t = p(None, t)
    return t.numpy()


@pytest.mark.parametrize("temperature,top_p,top_k", [
    (0.8, 0.0, 0), (1.0, 0.9, 0), (0.7, 0.95, 40), (1.0, 0.0, 5),
])
def test_warper_parity(temperature, top_p, top_k):
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, (4, 200)).astype(np.float32)
    ours = np.asarray(process_logits(jnp.asarray(logits), temperature, top_p, top_k))
    ref = _ref(logits, temperature, top_p, top_k)
    finite = np.isfinite(ref) & (ref > -1e8)
    ours_finite = ours > -1e8
    np.testing.assert_array_equal(ours_finite, finite)
    np.testing.assert_allclose(ours[finite], ref[finite], rtol=1e-5)


def test_top_p_tie_handling():
    """Tied logits at the nucleus boundary: only the in-nucleus sorted position
    survives (HF semantics — the review found a value-threshold version kept
    both copies)."""
    logits = np.log(np.asarray([[0.5, 0.25, 0.25, 1e-9]], np.float32))
    ours = np.asarray(process_logits(jnp.asarray(logits), 1.0, 0.7, 0))
    ref = _ref(logits, 1.0, 0.7, 0)
    np.testing.assert_array_equal(ours > -1e8, ref > -1e8)
    assert (ours[0] > -1e8).sum() == 2  # 0.5 + first 0.25 crosses 0.7


def test_repetition_penalty_hf_parity():
    """apply_repetition_penalty vs transformers'
    RepetitionPenaltyLogitsProcessor (the reference plumbs the flag,
    utils.py:41-50, but calls the list with input_ids=None — here the history
    is a seen-token mask and the math must match HF exactly)."""
    from vispec_tpu.ops.sampling import apply_repetition_penalty, seen_mask

    rng = np.random.default_rng(3)
    vocab = 200
    logits = rng.normal(0, 3, (1, vocab)).astype(np.float32)
    history = rng.integers(0, vocab, 40)
    penalty = 1.3

    proc = hf.RepetitionPenaltyLogitsProcessor(penalty)
    ref = proc(torch.tensor(history[None]), torch.tensor(logits)).numpy()

    seen = jnp.asarray(seen_mask(vocab, history))
    ours = np.asarray(apply_repetition_penalty(jnp.asarray(logits), seen, penalty))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)

    # full process_logits order: temperature then penalty then top-p (HF order)
    t = hf.TemperatureLogitsWarper(0.7)(None, torch.tensor(logits))
    t = proc(torch.tensor(history[None]), t)
    t = hf.TopPLogitsWarper(0.9)(None, t)
    ref2 = t.numpy()
    ours2 = np.asarray(process_logits(jnp.asarray(logits), 0.7, 0.9, 0,
                                      repetition_penalty=penalty, seen=seen))
    finite = ref2 > -1e8
    np.testing.assert_array_equal(ours2 > -1e8, finite)
    np.testing.assert_allclose(ours2[finite], ref2[finite], rtol=1e-5)


def test_top_k_clamps_to_vocab():
    logits = np.random.default_rng(1).normal(size=(2, 50)).astype(np.float32)
    out = np.asarray(process_logits(jnp.asarray(logits), 1.0, 0.0, 500))
    np.testing.assert_allclose(out, logits, rtol=1e-6)  # keeps everything


def test_top_k_warp_dyn_matches_static():
    """_top_k_warp_dyn (traced k over a static max-k bucket) keeps exactly
    the tokens _top_k_warp(k) keeps for every k <= bucket; k <= 0 disables
    the warp; k > bucket clamps to the bucket (the engine rejects such
    requests at submit, so the clamp is a belt-and-braces bound)."""
    import jax.numpy as jnp

    from vispec_tpu.ops.sampling import _top_k_warp, _top_k_warp_dyn

    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(0, 3, (3, 64)).astype(np.float32))
    max_k = 8
    for k in (1, 2, 5, 8):
        dyn = np.asarray(_top_k_warp_dyn(logits, jnp.int32(k), max_k))
        st = np.asarray(_top_k_warp(logits, k))
        np.testing.assert_array_equal(dyn, st)
    # disabled: k == 0 keeps everything bitwise
    np.testing.assert_array_equal(
        np.asarray(_top_k_warp_dyn(logits, jnp.int32(0), max_k)),
        np.asarray(logits))
    # over-bucket clamps to max_k
    np.testing.assert_array_equal(
        np.asarray(_top_k_warp_dyn(logits, jnp.int32(99), max_k)),
        np.asarray(_top_k_warp(logits, max_k)))


def test_sample_probs_dyn_top_p_disabled_is_bitwise_static():
    """Slots with no top_p (<=0 or >=1) must take the UNWARPED logits —
    bitwise identical to the static path which skips the warp (an
    eff_p=1.0 warp can clip ~1e-7 of real tail mass to f32 cumsum
    rounding — ADVICE r4)."""
    import jax
    import jax.numpy as jnp

    from vispec_tpu.ops.sampling import sample_probs_dyn

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(0, 4, (300,)).astype(np.float32))
    for p in (0.0, 1.0):
        probs = np.asarray(sample_probs_dyn(
            logits, jnp.float32(0.9), jnp.float32(p), jnp.float32(1.0)))
        want = np.asarray(jax.nn.softmax(logits / jnp.float32(0.9)))
        np.testing.assert_array_equal(probs, want)
    # an active top_p still warps
    probs = np.asarray(sample_probs_dyn(
        logits, jnp.float32(1.0), jnp.float32(0.5), jnp.float32(1.0)))
    assert (probs == 0).sum() > 0


def test_sample_probs_dyn_top_k_dyn_mixed():
    """sample_probs_dyn with a traced per-request k over the static bucket:
    k=1 puts all mass on the argmax, k=0 disables the warp, and any
    1 <= k <= bucket matches the static top_k path's probabilities."""
    import jax
    import jax.numpy as jnp

    from vispec_tpu.ops.sampling import sample_probs_dyn

    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.normal(0, 3, (128,)).astype(np.float32))
    one, t1 = jnp.float32(1.0), jnp.float32(1.0)

    p1 = np.asarray(sample_probs_dyn(logits, t1, jnp.float32(0.0), one,
                                     top_k=8, top_k_dyn=jnp.int32(1)))
    assert p1[int(np.asarray(logits).argmax())] == 1.0

    p0 = np.asarray(sample_probs_dyn(logits, t1, jnp.float32(0.0), one,
                                     top_k=8, top_k_dyn=jnp.int32(0)))
    np.testing.assert_array_equal(p0, np.asarray(jax.nn.softmax(logits)))

    for k in (3, 8):
        dyn = np.asarray(sample_probs_dyn(logits, t1, jnp.float32(0.0), one,
                                          top_k=8, top_k_dyn=jnp.int32(k)))
        st = np.asarray(sample_probs_dyn(logits, t1, jnp.float32(0.0), one,
                                         top_k=k))
        np.testing.assert_array_equal(dyn, st)
