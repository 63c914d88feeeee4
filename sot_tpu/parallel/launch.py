"""Multi-host launch helpers (DCN outer axis; SURVEY §2.3/§5).

On a multi-host TPU slice every host runs the same program;
``initialize_distributed`` wires jax.distributed from the standard
environment (TPU pods auto-discover; GPU/CPU clusters use
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), and
``global_mesh`` builds the (data, freq) mesh over all global devices —
device order groups each host's local chips so the 'data' axis crosses
hosts over DCN while 'freq' stays intra-host on ICI.

Single-process runs are the common case and need none of this: both
helpers degrade to no-ops / local meshes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from sot_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialise jax.distributed if a multi-process environment is present.

    Returns True if distributed mode was initialised. Safe to call in
    single-process runs (returns False, touches nothing).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES") or
                  os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator is None and not on_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(freq: int = 1):
    """Mesh over all global devices: ('data' across hosts/DCN, 'freq' on ICI)."""
    return make_mesh(len(jax.devices()), freq=freq)
