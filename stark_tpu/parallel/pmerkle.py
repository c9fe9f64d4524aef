"""Mesh-sharded Merkle commitment: local per-level combines + host top.

The reference builds its tree with a single sequential bottom-up loop
storing every level (reference src/merkle.rs:11-38).  That loop splits
naturally at the shard boundary (SURVEY §5): with n leaves contiguously
sharded over D devices, every level of width >= 2D is a *local* batched
``Hash::combine`` pass on each device's subtree — the pairs (2i, 2i+1) sit
inside one shard, so no communication at all.  Only the narrow top of the
tree crosses devices: one 32-byte-per-node gather, after which the top is
finished on the (replicated) host exactly like the single-chip tree.

Each level is its own cached shard_map jit (per width) — compile cost stays
linear in distinct widths, not in tree size — and wide levels stay device
resident for :meth:`MerkleTree.open_batch_dev` path gathers.

The produced level bytes are identical to the single-device / scalar
construction, so roots, openings and proof bytes are host-count-invariant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from stark_tpu.merkle import _DEVICE_MIN_WIDTH, MerkleTree, _build_host_levels
from stark_tpu.ops import hash_batch as HB
from stark_tpu.parallel.mesh import AXIS


@functools.lru_cache(maxsize=None)
def _leaf_fn(mesh: Mesh, n: int):
    fn = jax.shard_map(
        functools.partial(HB.leaf_hash_core, jnp),
        mesh=mesh,
        in_specs=(P(AXIS),),
        out_specs=P(None, AXIS),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _row_leaf_fn(mesh: Mesh, n: int, c: int):
    fn = jax.shard_map(
        functools.partial(HB.row_hash_core, jnp),
        mesh=mesh,
        in_specs=(P(None, AXIS),),
        out_specs=P(None, AXIS),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _level_fn(mesh: Mesh, w: int):
    """Width-w level -> width-w/2 parents, combining local adjacent pairs."""

    def body(x):
        return HB.combine_core(jnp, x[:, 0::2], x[:, 1::2])

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P(None, AXIS),), out_specs=P(None, AXIS)
    )
    return jax.jit(fn)


def _finish_tree(digests, mesh: Mesh) -> MerkleTree:
    D = mesh.devices.size
    dev = [digests]
    while (
        dev[-1].shape[1] > max(D, _DEVICE_MIN_WIDTH)
        and dev[-1].shape[1] // D >= 2
    ):
        dev.append(_level_fn(mesh, int(dev[-1].shape[1]))(dev[-1]))
    # Narrow top: one small gather, then the numpy engine (bytes identical).
    top = _build_host_levels(HB.digests_to_bytes(np.asarray(dev[-1])))[1:]
    return MerkleTree(_dev_levels=tuple(dev), _top_levels=top)


def sharded_tree_from_values(values, mesh: Mesh) -> MerkleTree:
    """Tree over leaf_i = Hash::from_field_elements([v_i]) (fri.rs:117-128),
    leaves sharded over the mesh.  Bytes identical to the scalar build."""
    n = int(values.shape[0])
    return _finish_tree(_leaf_fn(mesh, n)(values), mesh)


def sharded_tree_from_rows(rows, mesh: Mesh) -> MerkleTree:
    """Tree over leaf_j = Hash::from_field_elements(rows[:, j]) — the trace
    commitment path; rows is (c, n) sharded on the lane axis."""
    n = int(rows.shape[1])
    return _finish_tree(_row_leaf_fn(mesh, n, int(rows.shape[0]))(rows), mesh)
