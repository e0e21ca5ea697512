"""Multi-host initialization and mesh construction.

The reference is strictly single-process (OpenMP shared memory,
SURVEY.md section 2); scaling beyond one host here follows the standard
JAX recipe: ``jax.distributed.initialize`` connects the hosts over DCN,
after which ``jax.devices()`` spans the full slice and the same
("batch", "time") mesh code works unchanged — XLA routes the
condensed-boundary all-gather over ICI within a host/slice and the
(embarrassingly parallel) batch axis over DCN.

Axis-placement rule of thumb (scaling-book recipe): put the "time"
axis within one ICI domain — the PDP boundary exchange
(parallel/pdp_sharded.py) all-gathers nx*nx blocks every solve — and
let "batch" span hosts, since batch instances never communicate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the multi-host slice.

    On TPU pods with standard orchestration (GKE/queued resources) all
    arguments auto-detect; pass them explicitly for manual bring-up.
    No-op if already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_pod_mesh(time: int = 1) -> Mesh:
    """("batch", "time") mesh over every device in the (multi-host) slice.

    ``time`` devices per horizon-sharding group are taken contiguously
    so each group stays within one host's ICI domain whenever
    time <= local_device_count.
    """
    devices = jax.devices()
    n = len(devices)
    if n % time != 0:
        raise ValueError(f"device count {n} not divisible by time={time}")
    local = jax.local_device_count()
    if time > local:
        raise ValueError(
            f"time={time} spans hosts (local={local}); keep the horizon "
            "axis within one ICI domain"
        )
    arr = np.asarray(devices).reshape(n // time, time)
    return Mesh(arr, axis_names=("batch", "time"))
