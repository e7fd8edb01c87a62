"""Stage-1 (text-only) draft training CLI — reference main.py's surface.

  python -m vispec_tpu.train.main --basepath <target> --configpath <draft cfg> \
      --tmpdir <npz data dir> --cpdir <ckpts> [--lr 3e-5] [--num-q 2]

Stage-1 distills the EAGLE-style draft on ShareGPT-style text data with
vloss(SmoothL1 on hiddens) + ploss(soft-CE) + ranking loss (main.py:313-333;
weights v_w=1.0 p_w=0.1, :541).  The produced checkpoint warm-starts stage-2
(main_mtp --loadpath, README.md:112, strict=False load => vision modules start
fresh)."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description="sp-stage1")
    p.add_argument("--basepath", type=str, required=True)
    p.add_argument("--configpath", type=str, required=True)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--tmpdir", type=str, default="0")
    p.add_argument("--cpdir", type=str, default="0")
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--num-q", type=int, default=2)
    p.add_argument("--num-epochs", type=int, default=20)
    p.add_argument("--ckpt-backend", choices=["pickle", "orbax"],
                   default="pickle")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 matmul compute, f32 master weights/losses "
                   "(the reference's accelerate --mixed_precision=bf16)")
    # mesh axes — same GSPMD step as main_mtp (the reference trains stage 1
    # with the identical accelerate/DDP launch, README.md:85-87)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    args = p.parse_args()

    from .main_mtp import _enable_compile_cache

    _enable_compile_cache()

    import jax.numpy as jnp

    from ..configs import DraftConfig
    from .main_mtp import load_head_only
    from .trainer import TrainConfig, train

    dcfg = DraftConfig.from_json(args.configpath, num_q=args.num_q)
    head_w = load_head_only(args.basepath, jnp.float32)
    cfg = TrainConfig(
        lr=args.lr, bs=args.bs, num_epochs=args.num_epochs,
        max_len=args.max_len, mtp_steps=0, ckpt_backend=args.ckpt_backend,
        bf16=args.bf16,
    )
    from ..parallel.mesh import mesh_from_args

    try:
        mesh = mesh_from_args(dp=args.dp, tp=args.tp, sp=args.sp,
                              bs=args.bs, max_len=args.max_len)
    except ValueError as e:
        p.error(str(e))
    train(args.tmpdir, args.cpdir, dcfg, head_w, cfg, stage1=True, mesh=mesh)


if __name__ == "__main__":
    main()
