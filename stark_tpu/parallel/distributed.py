"""Multi-host initialization for pod-slice runs.

The reference has no distributed runtime at all (SURVEY §2); this is the
thin TPU-native entry: `jax.distributed.initialize` from the standard
environment (coordinator address / process id / process count), then a
global 1-D mesh over every chip in the slice.  All parallel kernels
(parallel/pntt.py, pmerkle.py, pstark.py) are written against a Mesh and
work unchanged on a multi-host mesh — collectives ride ICI within a slice
and DCN across slices, as scheduled by XLA.

Untested on real multi-host hardware in this environment (one chip is
attached); the sharding semantics are exercised on virtual device meshes
in tests/test_parallel.py and via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import os

from stark_tpu.parallel.mesh import make_mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize the JAX distributed runtime (idempotent-ish: skips when
    a single process has every device or args/env are absent)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address or not num_processes:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """1-D mesh over every device in the (possibly multi-host) slice."""
    return make_mesh()
