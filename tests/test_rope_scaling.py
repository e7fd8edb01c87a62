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
