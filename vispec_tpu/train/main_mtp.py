"""Stage-2 (multimodal MTP) training CLI — reference main_mtp.py's argparse
surface (:3-20) on top of train/trainer.py.

  python -m vispec_tpu.train.main_mtp --basepath <target ckpt> \
      --configpath <draft config.json> --tmpdir <npz data dir> --cpdir <ckpts> \
      [--loadpath stage1.pkl] [--lr 3e-5] [--mtp-steps 2] [--num-q 2]

The frozen target lm_head is loaded tensor-only (main_mtp.py:95-146) — the full
target never enters trainer memory.  Under a multi-chip mesh this becomes a
dp x tp pjit step automatically (train/step.py + parallel/sharding.py).
"""

from __future__ import annotations

import argparse
import json
import os


def _enable_compile_cache():
    """Persistent XLA compile cache for TPU runs (1-CPU host: 7B compiles take
    minutes; see CLAUDE.md).  CPU AOT results are machine-specific -> skipped."""
    import os

    if os.environ.get("JAX_PLATFORMS", "") in ("cpu",):
        return
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def load_head_only(basepath: str, dtype):
    """Load only lm_head (or embed if tied) from the target checkpoint."""
    import jax.numpy as jnp
    import numpy as np

    from ..convert.hf import load_state_dict

    sd = load_state_dict(basepath)
    for key in ("lm_head.weight", "language_model.lm_head.weight"):
        if key in sd:
            return jnp.asarray(np.ascontiguousarray(sd[key].T), dtype)
    for key in ("model.embed_tokens.weight", "language_model.model.embed_tokens.weight"):
        if key in sd:  # tied embeddings
            return jnp.asarray(np.ascontiguousarray(sd[key].T), dtype)
    raise KeyError("no lm_head/embed_tokens in target checkpoint")


def main():
    p = argparse.ArgumentParser(description="sp")
    p.add_argument("--basepath", type=str, required=True)
    p.add_argument("--configpath", type=str, required=True)
    p.add_argument("--loadpath", type=str, default=None)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--tmpdir", type=str, default="0")
    p.add_argument("--cpdir", type=str, default="0")
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--use-ours", action="store_true", default=True)
    p.add_argument("--num-q", type=int, default=2)
    p.add_argument("--mtp-steps", type=int, default=2)
    p.add_argument("--num-epochs", type=int, default=20)
    p.add_argument("--begin-epoch", type=int, default=0)
    p.add_argument("--ckpt-backend", choices=["pickle", "orbax"],
                   default="pickle", help="orbax = sharded-aware tensorstore "
                   "saves (no host gather of tp-sharded params)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 matmul compute with f32 master weights/losses "
                   "(the reference's accelerate --mixed_precision=bf16)")
    # mesh axes (multi-chip GSPMD step — the accelerate/DDP replacement);
    # --bs must be a multiple of dp, --max-len a multiple of sp
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    args = p.parse_args()
    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ..configs import DraftConfig
    from .trainer import TrainConfig, train

    dcfg = DraftConfig.from_json(args.configpath, num_q=args.num_q)
    head_w = load_head_only(args.basepath, jnp.float32)

    dparams = None
    if args.loadpath:
        if args.loadpath.endswith(".orbax"):
            # stage-1 saved with --ckpt-backend orbax; params are a plain
            # nested dict, so a structureless restore is safe here
            import orbax.checkpoint as ocp

            blob = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(args.loadpath))
        else:
            import pickle

            with open(args.loadpath, "rb") as f:
                blob = pickle.load(f)
        dparams = jax.tree.map(jnp.asarray, blob["params"])
        print(f"[main_mtp] warm-started from {args.loadpath}")

    cfg = TrainConfig(
        lr=args.lr, bs=args.bs, num_epochs=args.num_epochs,
        max_len=args.max_len, mtp_steps=args.mtp_steps,
        ckpt_backend=args.ckpt_backend, bf16=args.bf16,
    )
    from ..parallel.mesh import mesh_from_args

    try:
        mesh = mesh_from_args(dp=args.dp, tp=args.tp, sp=args.sp,
                              bs=args.bs, max_len=args.max_len)
    except ValueError as e:
        p.error(str(e))
    train(args.tmpdir, args.cpdir, dcfg, head_w, cfg, dparams=dparams,
          mesh=mesh)


if __name__ == "__main__":
    main()
