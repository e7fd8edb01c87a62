"""Draft-distillation losses (stage-2 / main_mtp semantics).

Reference: vispec/train/main_mtp.py compute_loss (:383-407):
  ploss = mean over masked positions of sum_v |softmax(head(predict)) - target_p|
  rloss = Plackett-Luce ranking loss over the target's top-10 token indices
  loss  = 10 * ploss + 0.1 * rloss
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def draft_loss(
    student_logits: jax.Array,  # [N, S, V] float32 (N = mtp_steps + 1 stacked)
    target_p: jax.Array,  # [N, S, V] target softmax probabilities
    loss_mask: jax.Array,  # [N, S] bool/float
    topk: int = 10,
) -> Tuple[jax.Array, dict]:
    mask = loss_mask.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)

    student_p = jax.nn.softmax(student_logits, axis=-1)
    l1 = jnp.abs(student_p - target_p).sum(-1)  # [N, S]
    ploss = (l1 * mask).sum() / denom

    # Plackett–Luce over the target's top-k indices (main_mtp.py:396-404):
    # log-likelihood of the target ranking under student logits.
    _, topk_idx = jax.lax.top_k(target_p, topk)
    s_topk = jnp.take_along_axis(student_logits, topk_idx, axis=-1)  # [N, S, k]
    rev = jnp.flip(s_topk, axis=-1)
    log_denom = jnp.flip(jax.lax.cumlogsumexp(rev, axis=-1), axis=-1)
    log_lik = (s_topk - log_denom).sum(-1)  # [N, S]
    rloss = -(log_lik * mask).sum() / denom

    loss = 10.0 * ploss + 0.1 * rloss

    # top-1/2/3 accuracy for logging (reference tracks all three,
    # main_mtp.py:693-714)
    metrics = {"ploss": ploss, "rloss": rloss}
    tgt_tok = jnp.argmax(target_p, axis=-1)
    _, top3 = jax.lax.top_k(student_logits, 3)  # [N, S, 3]
    hit = top3 == tgt_tok[..., None]
    for k in (1, 2, 3):
        name = "acc" if k == 1 else f"acc_top{k}"
        metrics[name] = (jnp.any(hit[..., :k], axis=-1) * mask).sum() / denom
    return loss, metrics


def smooth_l1(x: jax.Array, y: jax.Array, beta: float = 1.0) -> jax.Array:
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def stage1_loss(
    predict_hidden: jax.Array,  # [S, D] draft hidden predictions
    target_hidden: jax.Array,  # [S, D]
    student_logits: jax.Array,  # [S, V]
    target_p: jax.Array,  # [S, V]
    loss_mask: jax.Array,  # [S]
    v_w: float = 1.0,
    p_w: float = 0.1,
    topk: int = 10,
):
    """Stage-1 text-only distillation loss (reference main.py compute_loss
    :313-333 with weights v_w=1.0, p_w=0.1, main.py:541): SmoothL1 on hidden
    states + soft cross-entropy to the target's probs + top-k Plackett-Luce."""
    mask = loss_mask.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)

    vloss = (smooth_l1(predict_hidden.astype(jnp.float32),
                       target_hidden.astype(jnp.float32)).mean(-1) * mask).sum() / denom

    logp = jax.nn.log_softmax(student_logits, axis=-1)
    ploss = -((target_p * logp).sum(-1) * mask).sum() / denom

    _, topk_idx = jax.lax.top_k(target_p, topk)
    s_topk = jnp.take_along_axis(student_logits, topk_idx, axis=-1)
    rev = jnp.flip(s_topk, axis=-1)
    log_denom = jnp.flip(jax.lax.cumlogsumexp(rev, axis=-1), axis=-1)
    rloss = -(((s_topk - log_denom).sum(-1)) * mask).sum() / denom

    loss = v_w * vloss + p_w * ploss + 0.1 * rloss
    metrics = {"vloss": vloss, "ploss": ploss, "rloss": rloss}
    tgt_tok = jnp.argmax(target_p, axis=-1)
    _, top3 = jax.lax.top_k(student_logits, 3)
    hit = top3 == tgt_tok[..., None]
    for k in (1, 2, 3):
        name = "acc" if k == 1 else f"acc_top{k}"
        metrics[name] = (jnp.any(hit[..., :k], axis=-1) * mask).sum() / denom
    return loss, metrics
