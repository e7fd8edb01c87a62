"""Multi-host initialization for pod-scale runs.

The reference's multi-process story is `accelerate launch --multi_gpu` (NCCL
DDP) for training and ray actors for eval (SURVEY.md §2.6).  On TPU pods the
equivalent is `jax.distributed.initialize()` per host: every host then sees the
global device set, `make_mesh` spans the pod, and the same pjit train step runs
SPMD with gradient psum over ICI/DCN — no launcher framework needed.

Evaluation scale-out intentionally uses NO collectives: each host runs an
independent `gen_answer` process over a question shard (the reference's ray
sharding, gen_spec_answer_sqa.py:89-122).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; on Cloud TPU VMs the
    no-arg form autodetects).  Returns the process index."""
    if jax.process_count() > 1:
        return jax.process_index()
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=int(num_processes or os.environ["NUM_PROCESSES"]),
            process_id=int(process_id or os.environ["PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:  # single-host runs
        if coordinator_address:
            raise
    return jax.process_index()


def local_shard(total: int) -> range:
    """This host's contiguous slice of `total` work items (eval sharding)."""
    n, i = jax.process_count(), jax.process_index()
    per = (total + n - 1) // n
    return range(i * per, min((i + 1) * per, total))
