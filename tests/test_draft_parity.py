"""Numerical parity of the JAX draft model against a NumPy float64 oracle that
independently implements the reference semantics (cnets_ours.py:603-1038):
the ImgAdaptor cross-attention, the img_fc/fc fusion, the single decoder layer
(layer-0: no input layernorm), and the compressed prefill restructure walk.

The oracle follows the reference's *documented behavior* (SURVEY.md §2.2), not
its code: sequence restructure via explicit span loops, SDPA in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vispec_tpu.configs import DraftConfig
from vispec_tpu.models import draft as draft_mod
from vispec_tpu.ops.kv_cache import init_cache

CFG = DraftConfig(
    vocab_size=97,
    hidden_size=32,
    intermediate_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    num_q=2,
)
RNG = np.random.default_rng(0)


def np_params():
    d, i = CFG.hidden_size, CFG.intermediate_size
    h, dh = CFG.num_attention_heads, CFG.head_dim
    hkv = CFG.num_key_value_heads * dh

    def w(*shape):
        return RNG.normal(0, 0.2, shape)

    return {
        "embed": w(CFG.vocab_size, d),
        "layer": {
            "post_norm": np.abs(w(d)) + 0.5,
            "wq": w(d, h * dh), "wk": w(d, hkv), "wv": w(d, hkv),
            "wo": w(h * dh, d),
            "w_gate": w(d, i), "w_up": w(d, i), "w_down": w(i, d),
        },
        "adaptor": {
            "q": w(CFG.num_q, h, dh),
            "wk": w(d, h * dh), "wv": w(d, h * dh), "wo": w(h * dh, d),
        },
        "fc_w": w(2 * d, d), "fc_b": w(d),
        "img_fc_w": w(2 * d, d), "img_fc_b": w(d),
    }


def to_jax(p):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), p)


# ---------------- NumPy float64 oracle ----------------


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_sdpa(q, k, v, mask):
    """q:[h,Q,dh] k/v:[h,K,dh] mask:[Q,K] bool."""
    scores = np.einsum("hqd,hkd->hqk", q, k) / np.sqrt(q.shape[-1])
    scores = np.where(mask[None], scores, -1e30)
    return np.einsum("hqk,hkd->hqd", np_softmax(scores), v)


def np_adaptor(p, x):
    """x: [S, d] -> [num_q, d] (cnets_ours.py:630-661)."""
    h, dh = CFG.num_attention_heads, CFG.head_dim
    k = (x @ p["adaptor"]["wk"]).reshape(-1, h, dh).transpose(1, 0, 2)
    v = (x @ p["adaptor"]["wv"]).reshape(-1, h, dh).transpose(1, 0, 2)
    q = p["adaptor"]["q"].transpose(1, 0, 2)
    out = np_sdpa(q, k, v, np.ones((CFG.num_q, x.shape[0]), bool))
    return out.transpose(1, 0, 2).reshape(CFG.num_q, -1) @ p["adaptor"]["wo"]


def np_rope(x, pos):
    """x: [h, S, dh], pos: [S]."""
    dh = x.shape[-1]
    inv = 1.0 / (CFG.rope_theta ** (np.arange(0, dh, 2) / dh))
    f = pos[:, None] * inv[None]
    emb = np.concatenate([f, f], -1)
    cos, sin = np.cos(emb), np.sin(emb)
    half = dh // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos[None] + rot * sin[None]


def np_rmsnorm(x, w, eps=1e-6):
    var = (x**2).mean(-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def np_layer(p, x, pos, mask):
    """Reference layer-0: attn (no input norm) + post-norm MLP."""
    lp = p["layer"]
    h, hkv, dh = CFG.num_attention_heads, CFG.num_key_value_heads, CFG.head_dim
    s = x.shape[0]
    q = (x @ lp["wq"]).reshape(s, h, dh).transpose(1, 0, 2)
    k = (x @ lp["wk"]).reshape(s, hkv, dh).transpose(1, 0, 2)
    v = (x @ lp["wv"]).reshape(s, hkv, dh).transpose(1, 0, 2)
    q, k = np_rope(q, pos), np_rope(k, pos)
    groups = h // hkv
    k = np.repeat(k, groups, 0)
    v = np.repeat(v, groups, 0)
    attn = np_sdpa(q, k, v, mask)
    attn = attn.transpose(1, 0, 2).reshape(s, -1) @ lp["wo"]
    hidden = x + attn
    normed = np_rmsnorm(hidden, lp["post_norm"])
    gate = normed @ lp["w_gate"]
    silu = gate / (1 + np.exp(-gate))
    return hidden + (silu * (normed @ lp["w_up"])) @ lp["w_down"]


def np_prefill(p, hiddens, embeds, image_mask):
    """Compressed restructure walk (cnets_ours.py:896-975) + layer forward.

    Returns (sequence hidden out, positions, last_img)."""
    s = len(image_mask)
    spans = []
    i = 0
    while i < s:
        if image_mask[i]:
            j = i
            while j + 1 < s and image_mask[j + 1]:
                j += 1
            spans.append((i, j + 1))
            i = j + 1
        else:
            i += 1
    xs, pos = [], []
    last_img = np.zeros(CFG.hidden_size)
    start = 0
    for st, en in spans:
        for t in range(start, en):
            if not image_mask[t]:
                fused = np.concatenate([hiddens[t], last_img]) @ p["img_fc_w"] + p["img_fc_b"]
                xs.append(np.concatenate([embeds[t], fused]) @ p["fc_w"] + p["fc_b"])
                pos.append(t)
        adapted = np_adaptor(p, embeds[st:en][image_mask[st:en]])
        for qi in range(CFG.num_q - 1):
            xs.append(adapted[qi])
            pos.append(en - (CFG.num_q - 1) + qi)
        last_img = adapted[-1]
        start = en
    for t in range(start, s):
        fused = np.concatenate([hiddens[t], last_img]) @ p["img_fc_w"] + p["img_fc_b"]
        xs.append(np.concatenate([embeds[t], fused]) @ p["fc_w"] + p["fc_b"])
        pos.append(t)
    x = np.stack(xs)
    pos = np.asarray(pos)
    lc = x.shape[0]
    causal = np.tril(np.ones((lc, lc), bool))
    return np_layer(p, x, pos, causal), pos, last_img


def test_adaptor_parity():
    p = np_params()
    jp = to_jax(p)
    x = RNG.normal(0, 1, (9, CFG.hidden_size))
    ref = np_adaptor(p, x)
    out = draft_mod.img_adaptor(
        jp, CFG, jnp.asarray(x, jnp.float32), jnp.ones(9, bool)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_prefill_parity_multi_image():
    p = np_params()
    jp = to_jax(p)
    s = 40
    image_mask = np.zeros(s, bool)
    image_mask[6:14] = True
    image_mask[20:29] = True
    hiddens = RNG.normal(0, 1, (s, CFG.hidden_size))
    embeds = RNG.normal(0, 1, (s, CFG.hidden_size))

    ref_out, ref_pos, ref_last_img = np_prefill(p, hiddens, embeds, image_mask)

    pad_len = 48
    plan, max_span = draft_mod.make_prefill_plan(
        image_mask, s, CFG.num_q, pad_len, max_images=3, max_span=16
    )
    comp_len = int(plan.comp_len)
    assert comp_len == ref_out.shape[0]
    np.testing.assert_array_equal(np.asarray(plan.pos_ids)[:comp_len], ref_pos)

    cache = init_cache(1, CFG.num_key_value_heads, 128, CFG.head_dim, jnp.float32)
    h_pad = jnp.asarray(np.pad(hiddens, ((0, pad_len - s), (0, 0))), jnp.float32)
    e_pad = jnp.asarray(np.pad(embeds, ((0, pad_len - s), (0, 0))), jnp.float32)
    last_hidden, last_img, cache = draft_mod.prefill(
        jp, CFG, h_pad, e_pad, plan, cache, max_span
    )
    np.testing.assert_allclose(
        np.asarray(last_img), ref_last_img, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(last_hidden), ref_out[-1], rtol=3e-4, atol=3e-4
    )
    assert int(cache.length) == comp_len
    assert int(cache.real_length) == s


def test_decode_fuse_and_layer_parity():
    p = np_params()
    jp = to_jax(p)
    s, past = 3, 7
    hiddens = RNG.normal(0, 1, (s, CFG.hidden_size))
    toks = RNG.integers(0, CFG.vocab_size, s)
    last_img = RNG.normal(0, 1, CFG.hidden_size)

    # oracle: full-sequence layer over [past ; new] with fused inputs
    past_x = RNG.normal(0, 1, (past, CFG.hidden_size))
    fused = np.stack([
        np.concatenate([
            p["embed"][toks[t]],
            np.concatenate([hiddens[t], last_img]) @ p["img_fc_w"] + p["img_fc_b"],
        ]) @ p["fc_w"] + p["fc_b"]
        for t in range(s)
    ])
    full = np.concatenate([past_x, fused])
    pos = np.arange(past + s)
    causal = np.tril(np.ones((past + s, past + s), bool))
    ref = np_layer(p, full, pos, causal)[past:]

    # jax: seed the cache by running the past through layer_forward, then append
    cache = init_cache(1, CFG.num_key_value_heads, 64, CFG.head_dim, jnp.float32)
    rows = jnp.arange(64)
    m0 = (rows[None, :] <= jnp.arange(past)[:, None]) & (rows[None, :] < past)
    _, cache = draft_mod.layer_forward(
        jp, CFG, jnp.asarray(past_x, jnp.float32), jnp.arange(past, dtype=jnp.int32),
        cache, jnp.zeros((), jnp.int32), m0,
    )
    from vispec_tpu.ops.kv_cache import advance

    cache = advance(cache, past, past)
    seed, cache = draft_mod.append_accepted(
        jp, CFG,
        jnp.asarray(hiddens, jnp.float32),
        jnp.asarray(toks, jnp.int32),
        jnp.asarray(s, jnp.int32),
        jnp.asarray(last_img, jnp.float32),
        cache,
    )
    np.testing.assert_allclose(np.asarray(seed), ref[-1], rtol=3e-4, atol=3e-4)
    assert int(cache.length) == past + s
