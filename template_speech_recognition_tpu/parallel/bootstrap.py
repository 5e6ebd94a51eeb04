"""Multi-host runtime bootstrap (SURVEY.md section 5, comm backend row).

The reference has no distributed runtime; here multi-host process
groups come from ``jax.distributed.initialize()`` (libtpu/PJRT), after
which ``jax.devices()`` is the global device list and the mesh in
``parallel.mesh`` spans hosts.  All cross-chip traffic is XLA
collectives over ICI/DCN -- no NCCL/MPI/Gloo anywhere.
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-host runtime; no-op for single-process runs.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); on TPU pods jax can also auto-detect all
    three.  Returns True if distributed mode was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_str = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None
    )
    pid_str = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None
    )
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) for per-host data feeding."""
    return jax.process_index(), jax.process_count()
