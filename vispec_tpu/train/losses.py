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

    # top-1 accuracy of the first (non-MTP) prediction for logging
    pred_tok = jnp.argmax(student_logits, axis=-1)
    tgt_tok = jnp.argmax(target_p, axis=-1)
    acc = ((pred_tok == tgt_tok) * mask).sum() / denom
    return loss, {"ploss": ploss, "rloss": rloss, "acc": acc}
