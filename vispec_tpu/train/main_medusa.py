"""Medusa heads training CLI — reference main_medusa.py's surface.

  python -m vispec_tpu.train.main_medusa --basepath <target> \
      --tmpdir <npz data dir> --cpdir <ckpts> [--lr 3e-5]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser(description="sp-medusa")
    p.add_argument("--basepath", type=str, required=True)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--tmpdir", type=str, default="0")
    p.add_argument("--cpdir", type=str, default="0")
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--num-epochs", type=int, default=20)
    # data/sequence parallel GSPMD axes (medusa heads are tiny — they
    # replicate; only the batch shards, like the reference's DDP launch)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 matmul compute, f32 master weights/losses")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..configs import DraftConfig
    from ..models import medusa as medusa_mod
    from .main_mtp import load_head_only
    from .step import make_optimizer, train_step_medusa
    from .trainer import TrainConfig, data_iterator, latest_state, load_state, save_state

    head_w = load_head_only(args.basepath, jnp.float32)
    d = head_w.shape[0]
    dcfg = DraftConfig(hidden_size=d, vocab_size=head_w.shape[1])
    cfg = TrainConfig(lr=args.lr, bs=args.bs, num_epochs=args.num_epochs,
                      max_len=args.max_len)

    optimizer = make_optimizer(cfg.lr, cfg.warmup_steps, cfg.total_steps, cfg.grad_clip)
    begin = 0
    resume = latest_state(args.cpdir)
    if resume:
        begin, raw, raw_opt = load_state(resume)
        begin += 1
        mparams = jax.tree.map(jnp.asarray, raw)
        opt_state = jax.tree.map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x, raw_opt
        )
    else:
        mparams = medusa_mod.init_params(d, jax.random.PRNGKey(0), jnp.float32)
        opt_state = optimizer.init(mparams)

    from ..parallel.mesh import mesh_from_args

    try:
        mesh = mesh_from_args(dp=args.dp, sp=args.sp,
                              bs=args.bs, max_len=args.max_len)
    except ValueError as e:
        p.error(str(e))
    shard_batch = lambda b: b  # noqa: E731 — identity when unsharded
    if mesh is not None:
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharding import shard_train_batch

        rep = NamedSharding(mesh, P())
        put_rep = lambda x: (jax.device_put(x, rep)  # noqa: E731
                             if hasattr(x, "shape") else x)
        mparams = jax.tree.map(put_rep, mparams)
        opt_state = jax.tree.map(put_rep, opt_state)
        head_w = jax.device_put(head_w, rep)
        shard_batch = functools.partial(shard_train_batch, mesh)

    step = 0
    for epoch in range(begin, cfg.num_epochs):
        for batch, _ in data_iterator(args.tmpdir, cfg, dcfg, seed=epoch):
            batch = shard_batch(batch)
            mparams, opt_state, metrics = train_step_medusa(
                mparams, opt_state, head_w, batch, optimizer, bf16=args.bf16,
            )
            if step % 20 == 0:
                print(f"[medusa] epoch {epoch} step {step} "
                      f"loss={float(metrics['loss']):.4f} "
                      f"acc={float(metrics['acc']):.4f}")
            step += 1
        save_state(args.cpdir, epoch, mparams, opt_state)


if __name__ == "__main__":
    main()
