"""Draft training step (stage-2 / MTP) — pjit over a dp x tp mesh.

Reference: vispec/train/main_mtp.py:624-718.  The accelerate/DDP wrapper and
NCCL all-reduce become GSPMD: the batch is sharded over ``dp``, parameters over
``tp`` (parallel/sharding.py), and XLA inserts the gradient psum / activation
collectives.  Grad clip is by-value 0.5 (main_mtp.py:48, clip_grad_value_),
optimizer AdamW(b1=0.9, b2=0.95) with linear warmup (main_mtp.py:600-607).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import DraftConfig
from ..models import draft as draft_mod
from .losses import draft_loss


class TrainBatch(NamedTuple):
    """One device batch (leading batch axis; bs=1 per reference, we allow B).

    hidden_states: [B, S, D] target hiddens (noise-augmented upstream)
    embeds:        [B, S, D] vision-merged input embeds
    target:        [B, S, D] next-position target hiddens
    loss_mask:     [B, S]
    plans:         batched PrefillPlan (each field with leading B)
    """

    hidden_states: jax.Array
    embeds: jax.Array
    target: jax.Array
    loss_mask: jax.Array
    plans: draft_mod.PrefillPlan


def bf16_compute(tree):
    """Mixed-precision compute cast (the reference trains under
    ``accelerate launch --mixed_precision=bf16``, README.md:85-87): f32
    leaves become bf16 for the forward/backward matmuls while the MASTER
    params, optimizer state, and losses stay f32 — the head einsums force
    f32 logits via ``preferred_element_type`` so every softmax/CE/L1 term
    is computed in f32, and the cast is differentiable (cotangents land
    back in f32 on the master leaves)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        tree,
    )


def make_optimizer(
    lr: float = 3e-5,
    warmup_steps: int = 2000,
    total_steps: int = 800_000,
    grad_clip: float = 0.5,
) -> optax.GradientTransformation:
    schedule = optax.linear_schedule(0.0, lr, warmup_steps)
    decay = optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))
    lr_fn = optax.join_schedules([schedule, decay], [warmup_steps])
    return optax.chain(
        optax.clip(grad_clip),  # by-value, matching clip_grad_value_
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.scale_by_learning_rate(lr_fn),
    )


def mtp_forward(
    dparams: dict,
    dcfg: DraftConfig,
    head_w: jax.Array,  # [D, V] frozen target lm_head
    batch: TrainBatch,
    mtp_steps: int,
    max_span: int,
) -> Tuple[jax.Array, dict]:
    """Stacked multi-token-prediction forward + loss (main_mtp.py:630-654)."""

    def single(hidden, embeds, plan):
        return draft_mod.forward_train(dparams, dcfg, hidden, embeds, plan, max_span)

    vforward = jax.vmap(single)

    predict = vforward(batch.hidden_states, batch.embeds, batch.plans)
    predicts = [predict]
    cur = predict
    for _ in range(mtp_steps):
        cur = jnp.concatenate(
            [batch.hidden_states[:, :1], cur[:, :-1]], axis=1
        )
        cur = vforward(cur, batch.embeds, batch.plans)
        predicts.append(cur)
    stacked = jnp.concatenate(predicts, axis=0)  # [(m+1)*B, S, D]

    n = mtp_steps + 1
    target_logits = jnp.einsum(
        "bsd,dv->bsv", batch.target, head_w, preferred_element_type=jnp.float32
    )
    target_p = jax.lax.stop_gradient(jax.nn.softmax(target_logits, axis=-1))
    target_p = jnp.tile(target_p, (n, 1, 1))
    mask = jnp.tile(batch.loss_mask, (n, 1))

    student_logits = jnp.einsum(
        "bsd,dv->bsv", stacked, head_w, preferred_element_type=jnp.float32
    )
    return draft_loss(student_logits, target_p, mask)


@functools.partial(
    jax.jit,
    static_argnames=("dcfg", "max_span", "optimizer", "v_w", "p_w", "bf16"),
    donate_argnames=("dparams", "opt_state"),
)
def train_step_stage1(
    dparams: dict,
    opt_state,
    dcfg: DraftConfig,
    head_w: jax.Array,
    batch: TrainBatch,
    optimizer: optax.GradientTransformation,
    v_w: float = 1.0,
    p_w: float = 0.1,
    max_span: int = 1,
    bf16: bool = False,
):
    """Stage-1 text-only distillation step (reference main.py:313-333, 541):
    SmoothL1 on predicted hidden states + soft-CE + ranking loss."""
    from .losses import stage1_loss

    def loss_fn(p):
        if bf16:
            p, batch_c, head_c = (bf16_compute(p), bf16_compute(batch),
                                  bf16_compute(head_w))
        else:
            batch_c, head_c = batch, head_w

        def single(hidden, embeds, plan):
            return draft_mod.forward_train(p, dcfg, hidden, embeds, plan, max_span)

        predict = jax.vmap(single)(batch_c.hidden_states, batch_c.embeds,
                                   batch_c.plans)
        student_logits = jnp.einsum(
            "bsd,dv->bsv", predict, head_c, preferred_element_type=jnp.float32
        )
        target_logits = jnp.einsum(
            "bsd,dv->bsv", batch_c.target, head_c,
            preferred_element_type=jnp.float32
        )
        target_p = jax.lax.stop_gradient(jax.nn.softmax(target_logits, axis=-1))
        loss, metrics = stage1_loss(
            predict.reshape(-1, predict.shape[-1]),
            batch_c.target.reshape(-1, batch_c.target.shape[-1]),
            student_logits.reshape(-1, student_logits.shape[-1]),
            target_p.reshape(-1, target_p.shape[-1]),
            batch.loss_mask.reshape(-1),
            v_w=v_w, p_w=p_w,
        )
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(dparams)
    grads = dict(grads)
    grads["embed"] = jax.tree.map(jnp.zeros_like, dparams["embed"])
    updates, opt_state = optimizer.update(grads, opt_state, dparams)
    dparams = optax.apply_updates(dparams, updates)
    return dparams, opt_state, dict(metrics, loss=loss)


@functools.partial(
    jax.jit,
    static_argnames=("optimizer", "v_w", "p_w", "bf16"),
    donate_argnames=("mparams", "opt_state"),
)
def train_step_medusa(
    mparams: dict,
    opt_state,
    head_w: jax.Array,
    batch: TrainBatch,
    optimizer: optax.GradientTransformation,
    v_w: float = 1.0,
    p_w: float = 0.1,
    bf16: bool = False,
):
    """Medusa heads training (reference main_medusa.py:498-540): head i's
    target is the target hidden shifted left by i (zeros-prefixed); loss =
    v_w * SmoothL1(hidden) + p_w * soft-CE, summed over heads."""
    from ..models.medusa import NUM_HEADS, heads_forward
    from .losses import smooth_l1

    def loss_fn(p):
        if bf16:
            p, b, head_c = (bf16_compute(p), bf16_compute(batch),
                            bf16_compute(head_w))
        else:
            b, head_c = batch, head_w
        # [H, B, S, D] predictions from every head on the same trunk hiddens
        predict = jax.vmap(
            lambda h: heads_forward(p, h), in_axes=0, out_axes=1
        )(b.hidden_states)
        tgt = jnp.stack([
            jnp.concatenate(
                [jnp.zeros_like(b.target[:, :i]), b.target[:, i:]],
                axis=1,
            )
            for i in range(NUM_HEADS)
        ])  # [H, B, S, D]
        mask = batch.loss_mask[None].astype(jnp.float32)  # [1, B, S]
        denom = jnp.maximum(mask.sum() * NUM_HEADS, 1.0)

        vloss = (smooth_l1(predict.astype(jnp.float32),
                           tgt.astype(jnp.float32)).mean(-1) * mask).sum() / denom

        s_logits = jnp.einsum("hbsd,dv->hbsv", predict, head_c,
                              preferred_element_type=jnp.float32)
        t_logits = jnp.einsum("hbsd,dv->hbsv", tgt, head_c,
                              preferred_element_type=jnp.float32)
        t_p = jax.lax.stop_gradient(jax.nn.softmax(t_logits, axis=-1))
        ploss = -((t_p * jax.nn.log_softmax(s_logits, axis=-1)).sum(-1)
                  * mask).sum() / denom
        loss = v_w * vloss + p_w * ploss
        acc = ((jnp.argmax(s_logits, -1) == jnp.argmax(t_p, -1)) * mask).sum() / denom
        return loss, {"vloss": vloss, "ploss": ploss, "acc": acc}

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(mparams)
    updates, opt_state = optimizer.update(grads, opt_state, mparams)
    mparams = optax.apply_updates(mparams, updates)
    return mparams, opt_state, dict(metrics, loss=loss)


@functools.partial(
    jax.jit,
    static_argnames=("dcfg", "mtp_steps", "max_span", "optimizer", "bf16"),
    donate_argnames=("dparams", "opt_state"),
)
def train_step(
    dparams: dict,
    opt_state,
    dcfg: DraftConfig,
    head_w: jax.Array,
    batch: TrainBatch,
    optimizer: optax.GradientTransformation,
    mtp_steps: int = 2,
    max_span: int = 1,
    bf16: bool = False,
):
    """One optimization step; under a mesh context with sharded inputs this is
    the full dp x tp distributed training step.  ``bf16=True`` runs the
    forward/backward matmuls in bf16 (see ``bf16_compute``) — the MXU's
    native precision, ~4x the f32 matmul rate on v5e."""

    def loss_fn(p):
        if bf16:
            p, b, hw = bf16_compute(p), bf16_compute(batch), bf16_compute(head_w)
        else:
            b, hw = batch, head_w
        loss, metrics = mtp_forward(p, dcfg, hw, b, mtp_steps, max_span)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(dparams)
    # embed_tokens is frozen (cnets_ours.py:761-762)
    grads = dict(grads)
    grads["embed"] = jax.tree.map(jnp.zeros_like, dparams["embed"])
    updates, opt_state = optimizer.update(grads, opt_state, dparams)
    dparams = optax.apply_updates(dparams, updates)
    metrics = dict(metrics, loss=loss)
    return dparams, opt_state, metrics
