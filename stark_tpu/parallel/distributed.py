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
    """Initialize the JAX distributed runtime.

    Configuration comes from the arguments or the environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).  A
    fully-absent configuration is a normal single-process run; a PARTIAL
    one raises — a typo'd variable on a pod must fail loudly, not
    silently prove on one process (round-1 review, weak #6)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env is not None else None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    given = {
        "coordinator_address": coordinator_address,
        "num_processes": num_processes,
        "process_id": process_id,
    }
    missing = [k for k, v in given.items() if v is None]
    if len(missing) == 3:
        return  # single-process run
    if missing:
        raise RuntimeError(
            "partial distributed configuration — set all of "
            "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID "
            f"(missing: {', '.join(missing)})"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """1-D mesh over every device in the (possibly multi-host) slice."""
    return make_mesh()
