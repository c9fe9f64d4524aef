"""Device-mesh helpers for the distributed prover.

The reference is a single-process, single-threaded CPU program with no
communication backend of any kind (SURVEY §2 "Parallelism inventory: none";
reference Cargo.toml:6 has zero dependencies).  Distribution is therefore a
new, TPU-first design: a 1-D ``jax.sharding.Mesh`` over the evaluation-domain
axis — codewords, LDEs and Merkle leaf lanes are sharded contiguously across
devices; the Fiat-Shamir transcript is replicated (it is tiny and host-side),
so challenge derivation needs no communication and proof bytes are
host-count-invariant.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXIS = "d"  # the single mesh axis: evaluation-domain shards


def make_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devs), (
            f"requested {n_devices} devices, only {len(devs)} available"
        )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def sharded(mesh: Mesh, *axis_for_dim) -> NamedSharding:
    """NamedSharding with AXIS on the dims marked True (e.g. sharded(m, True))."""
    spec = PartitionSpec(*[AXIS if s else None for s in axis_for_dim])
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
