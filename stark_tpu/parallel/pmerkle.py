"""Mesh-sharded Merkle commitment: per-device subtrees + gathered top levels.

The reference builds its tree with a single sequential bottom-up loop
storing every level (reference src/merkle.rs:11-38).  That loop splits
naturally at the shard boundary (SURVEY §5): with n leaves contiguously
sharded over D devices, every level of width > D is a *local* batched
``Hash::combine`` pass on each device's subtree (no communication at all —
the hash lanes axis is the sharded axis and all ops are elementwise over
lanes); only the top log2(D) levels, built from the D subtree roots, cross
devices — 32*D bytes moved once per tree.

The produced level bytes are identical to the single-device / scalar
construction, so roots, openings and proof bytes are host-count-invariant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from stark_tpu.merkle import MerkleTree
from stark_tpu.ops import hash_batch as HB
from stark_tpu.parallel.mesh import AXIS


def _subtree_body(values, *, local_n: int):
    """Per-device: hash local leaves, build all local levels.

    Returns a tuple of (32, width) arrays, widths local_n, local_n/2, .., 1.
    """
    digests = HB.leaf_hash_core(jnp, values)
    levels = [digests]
    while levels[-1].shape[1] > 1:
        prev = levels[-1]
        levels.append(HB.combine_core(jnp, prev[:, 0::2], prev[:, 1::2]))
    return tuple(levels)


def _row_subtree_body(rows, *, local_n: int):
    """Per-device: hash local (c, local_n) rows, build all local levels."""
    digests = HB.row_hash_core(jnp, rows)
    levels = [digests]
    while levels[-1].shape[1] > 1:
        prev = levels[-1]
        levels.append(HB.combine_core(jnp, prev[:, 0::2], prev[:, 1::2]))
    return tuple(levels)


@functools.lru_cache(maxsize=None)
def _subtree_fn(mesh: Mesh, n: int, num_rows: int | None):
    D = mesh.devices.size
    assert n % D == 0 and (n // D) & (n // D - 1) == 0
    local_n = n // D
    n_levels = local_n.bit_length()  # local_n, .., 1
    if num_rows is None:
        body = functools.partial(_subtree_body, local_n=local_n)
        in_specs = (P(AXIS),)
    else:
        body = functools.partial(_row_subtree_body, local_n=local_n)
        in_specs = (P(None, AXIS),)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=tuple(P(None, AXIS) for _ in range(n_levels)),
    )
    return jax.jit(fn)


def _finish_tree(levels_dev, n: int) -> MerkleTree:
    """Convert sharded level arrays to host byte levels + build top levels."""
    levels = [HB.digests_to_bytes(np.asarray(lv)) for lv in levels_dev]
    # Top log2(D) levels from the gathered subtree roots (width D .. 1).
    current = HB.bytes_to_digests(levels[-1])
    while current.shape[1] > 1:
        current = HB.merkle_level_np(current)
        levels.append(HB.digests_to_bytes(current))
    return MerkleTree(_levels=levels)


def sharded_tree_from_values(values, mesh: Mesh) -> MerkleTree:
    """Tree over leaf_i = Hash::from_field_elements([v_i]) (fri.rs:117-128),
    leaves sharded over the mesh.  Bytes identical to the scalar build."""
    n = values.shape[0]
    return _finish_tree(_subtree_fn(mesh, n, None)(values), n)


def sharded_tree_from_rows(rows, mesh: Mesh) -> MerkleTree:
    """Tree over leaf_j = Hash::from_field_elements(rows[:, j]) — the trace
    commitment path; rows is (c, n) sharded on the lane axis."""
    n = rows.shape[1]
    return _finish_tree(_subtree_fn(mesh, n, rows.shape[0])(rows), n)
