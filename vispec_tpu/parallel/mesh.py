"""Device mesh construction for multi-chip execution.

TPU-native replacement for the reference's distributed story (SURVEY.md §2.6):
HF accelerate/DDP-over-NCCL for training and device_map layer placement at
inference both become a single ``jax.sharding.Mesh`` with named axes:

  dp — data parallel (gradient psum rides ICI)
  tp — tensor parallel (weight-sharded matmuls; all-gather/reduce-scatter)

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
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
