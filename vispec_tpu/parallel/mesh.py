"""Device mesh construction for multi-chip execution.

TPU-native replacement for the reference's distributed story (SURVEY.md §2.6):
HF accelerate/DDP-over-NCCL for training and device_map layer placement at
inference both become a single ``jax.sharding.Mesh`` with named axes:

  dp — data parallel (gradient psum rides ICI)
  pp — layer-stage placement (scan-stacked layer weights split by depth; the
       TPU equivalent of the reference's device_map="auto" layer spread +
       per-device KV buffer groups, kv_cache.py:91-127)
  sp — sequence parallel (long-prompt prefill activations split by position)
  tp — tensor parallel (weight-sharded matmuls; all-gather/reduce-scatter)

All four axes always exist (size-1 axes are free); PartitionSpecs that name
only a subset replicate over the rest, so dp×tp callers are unaffected.

Evaluation scale-out (the reference's ray sharding, gen_spec_answer_sqa.py:89-122)
needs no mesh at all — independent per-host processes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp * pp)
    assert dp * pp * sp * tp == n, f"mesh {dp}x{pp}x{sp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, pp, sp, tp)
    return Mesh(arr, ("dp", "pp", "sp", "tp"))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def mesh_from_args(
    dp: int = 1,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    bs: Optional[int] = None,
    max_len: Optional[int] = None,
) -> Optional[Mesh]:
    """Build the mesh a CLI's --dp/--tp/--sp/--pp flags describe, or None when
    every axis is 1 (single-device: no mesh machinery engaged).  Validates the
    shardable quantities the flags act on: ``bs`` must divide over dp and
    ``max_len`` over sp.  One helper for every CLI so the mesh construction
    and its checks can't drift between entry points."""
    n = dp * tp * sp * pp
    if n <= 1:
        return None
    if bs is not None and bs % dp:
        raise ValueError(f"--bs {bs} must be a multiple of --dp {dp}")
    if max_len is not None and max_len % sp:
        raise ValueError(f"--max-len {max_len} must be a multiple of --sp {sp}")
    return make_mesh(dp=dp, tp=tp, sp=sp, pp=pp, devices=jax.devices()[:n])
