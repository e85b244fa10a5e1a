"""Multi-host helpers.

The reference's torchrun/NCCL machinery (SURVEY §2.7: elastic launch,
monitored barriers, uneven-workload join) maps to:
  * jax.distributed.initialize() per host (coordinator via env/args)
  * synchronous SPMD — device-level barriers are implicit in collectives
  * host-level sync points via multihost_utils
  * uneven data: each host computes its local number of batches and the
    epoch runs min-across-hosts steps (agree_steps) — the XLA-safe
    replacement for dist.monitored_barrier + break
    (reference: utils/train_utils.py:285-304).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize wrapper (torchrun-equivalent; reads
    JAX_COORDINATOR_ADDRESS etc. when args are None). On the CPU
    backend (multi-host tests, SURVEY §4's fake-backend analogue) the
    cross-process collectives need the gloo implementation."""
    # NOTE: must not query devices/default_backend here — that would
    # initialize XLA before jax.distributed.initialize and fail
    platforms = str(jax.config.jax_platforms or "")
    if "cpu" in platforms:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: flag absent; collectives may still work
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def sync_hosts(name: str = "sync"):
    """Host-level barrier (replaces dist.barrier around checkpointing,
    reference: executor.py:116-126)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def agree_steps(local_steps: int) -> int:
    """All hosts agree on min(local_steps): every host runs the same number
    of SPMD steps per epoch, so no rank can enter a collective alone —
    the reference's monitored-barrier failure mode cannot occur."""
    from jax.experimental import multihost_utils
    arr = np.array([local_steps], np.int32)
    gathered = multihost_utils.process_allgather(arr)
    return int(np.min(gathered))


def uneven_join_batches(batches, round_size: int = 8):
    """Yield only batches every host can match step-for-step.

    The XLA-safe uneven-workload join (replaces dist.monitored_barrier
    + break, reference: utils/train_utils.py:285-304): hosts buffer up
    to `round_size` local batches, allgather the counts, and yield
    min(count) batches each — so no host ever enters a collective the
    others have run out of. When any host's buffer comes up short the
    epoch ends for ALL hosts (the longer hosts drop at most
    round_size-1 stray batches, like the reference's broken-epoch
    semantics). Single-process runs pass batches through untouched."""
    if jax.process_count() == 1:
        yield from batches
        return
    it = iter(batches)
    while True:
        buf = []
        for _ in range(round_size):
            nxt = next(it, None)
            if nxt is None:
                break
            buf.append(nxt)
        agreed = agree_steps(len(buf))
        yield from buf[:agreed]
        if agreed < round_size:
            return
