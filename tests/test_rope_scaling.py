"""RoPE scaling: linear and dynamic-NTK variants against a float64 numpy
oracle (HF LlamaDynamicNTKScalingRotaryEmbedding semantics; the reference's
rotary classes live in modeling_llama_kv.py ~186-240)."""

import numpy as np

from vispec_tpu.ops import rope


def _oracle_cos_sin(positions, head_dim, theta, factor=None, max_pos=None,
                    linear_scale=1.0):
    positions = np.asarray(positions, np.float64)
    if factor is not None:
        seq_len = positions.max() + 1
        if seq_len > max_pos:
            theta = theta * (
                (factor * seq_len / max_pos) - (factor - 1)
            ) ** (head_dim / (head_dim - 2))
    inv = 1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    freqs = (positions / linear_scale)[..., None] * inv
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb), np.sin(emb)


def test_dynamic_ntk_beyond_max_pos():
    pos = np.arange(100, 140, dtype=np.int32)  # beyond max_pos=64
    cos, sin = rope.cos_sin(pos, 32, 10000.0, dynamic_ntk=(2.0, 64))
    oc, osn = _oracle_cos_sin(pos, 32, 10000.0, factor=2.0, max_pos=64)
    np.testing.assert_allclose(np.asarray(cos), oc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sin), osn, atol=1e-4)


def test_dynamic_ntk_within_max_pos_is_unscaled():
    pos = np.arange(0, 40, dtype=np.int32)
    cos, sin = rope.cos_sin(pos, 32, 10000.0, dynamic_ntk=(2.0, 64))
    cos0, sin0 = rope.cos_sin(pos, 32, 10000.0)
    np.testing.assert_allclose(np.asarray(cos), np.asarray(cos0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.asarray(sin0), atol=1e-6)


def test_linear_scaling():
    pos = np.arange(0, 64, dtype=np.int32)
    cos, sin = rope.cos_sin(pos, 32, 10000.0, linear_scale=4.0)
    oc, osn = _oracle_cos_sin(pos, 32, 10000.0, linear_scale=4.0)
    np.testing.assert_allclose(np.asarray(cos), oc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), osn, atol=1e-5)


def test_dynamic_ntk_seq_len_override_ignores_padding():
    """Prefill positions include 128-bucket padding rows; the NTK stretch must
    come from the REAL prompt length (HF uses kv_seq_len), not max(position)."""
    real_len = 70
    pad = np.arange(0, 128, dtype=np.int32)  # padded prefill positions
    cos_p, sin_p = rope.cos_sin(pad, 32, 10000.0, dynamic_ntk=(2.0, 64),
                                seq_len=real_len)
    oc, osn = _oracle_cos_sin(np.arange(real_len), 32, 10000.0,
                              factor=2.0, max_pos=64)
    np.testing.assert_allclose(np.asarray(cos_p)[:real_len], oc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sin_p)[:real_len], osn, atol=1e-4)
    # without the override the padded length would (wrongly) change the base
    cos_bad, _ = rope.cos_sin(pad, 32, 10000.0, dynamic_ntk=(2.0, 64))
    assert not np.allclose(np.asarray(cos_bad)[:real_len], oc, atol=1e-4)


def test_dynamic_ntk_prefill_matches_decode_base():
    """spec_prefill passes the real prompt length: a padded prefill and an AR
    step at the same kv length must use the same stretched theta."""
    import jax.numpy as jnp

    from vispec_tpu.configs import LlamaConfig
    from vispec_tpu.models import llama
    from vispec_tpu.ops import kv_cache as kv
    from vispec_tpu.ops.attention import causal_mask
    from vispec_tpu.spec import loop as spec_loop

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=48,
                      rope_scaling_type="dynamic", rope_scaling_factor=2.0)
    import jax

    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ids = jnp.asarray(np.arange(1, 61) % 60, jnp.int32)  # real_len 60 > 48
    embeds = jnp.pad(llama.embed(params, ids), ((0, 128 - 60), (0, 0)))
    pos = jnp.arange(128, dtype=jnp.int32)

    c1 = kv.init_cache(1, 2, 256, 16, jnp.float32)
    mask = causal_mask(128, 256, 0)
    h_pad, _ = llama.forward_hidden(params, cfg, embeds, pos, c1, mask,
                                    seq_len=jnp.asarray(60))
    # unpadded forward over exactly 60 rows: same stretch => same hiddens
    c2 = kv.init_cache(1, 2, 256, 16, jnp.float32)
    h_ref, _ = llama.forward_hidden(
        params, cfg, embeds[:60], pos[:60], c2, causal_mask(60, 256, 0))
    np.testing.assert_allclose(np.asarray(h_pad)[:60], np.asarray(h_ref),
                               atol=2e-5)
