"""Merkle commitment trees.  Contract: reference src/merkle.rs:4-96.

Two constructors:

* ``MerkleTree(leaves)`` — from a list of :class:`Hash` leaves, mirroring
  ``MerkleTree::new`` (merkle.rs:11-38).
* ``MerkleTree.from_leaf_values(values)`` — the TPU path: leaf hashing and
  every wide tree level run as batched device ops
  (:mod:`stark_tpu.ops.hash_batch`); narrow top levels fall back to the
  numpy engine to avoid per-shape XLA recompiles.  The resulting bytes are
  identical to the scalar construction.

All levels are stored host-side as (width, 32) uint8 arrays so that
``open`` (sibling-path extraction, merkle.rs:67-80) is a cheap indexed read.
"""

from __future__ import annotations

import numpy as np

from stark_tpu.hashfn import Hash
from stark_tpu.ops import hash_batch as HB

# Below this width a tree level is hashed with the numpy engine (same code,
# no XLA compile); at or above, on device.
_DEVICE_MIN_WIDTH = 1024


class MerkleTree:
    def __init__(self, leaves=None, *, _levels=None):
        if _levels is not None:
            self.levels = _levels
        else:
            assert leaves is not None and len(leaves) > 0, (
                "Cannot create tree from empty leaves"
            )
            n = len(leaves)
            assert n & (n - 1) == 0, "Number of leaves must be power of 2"
            arr = np.frombuffer(
                b"".join(h.data for h in leaves), dtype=np.uint8
            ).reshape(n, 32)
            self.levels = _build_levels_from_digest_bytes(arr)

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_leaf_values(values) -> "MerkleTree":
        """Build from raw field values: leaf_i = Hash::from_field_elements([v_i]).

        This is the FRI codeword-commitment path (fri.rs:117-128): leaf
        hashing and tree levels are device-batched.
        """
        values = np.asarray(values)
        n = values.shape[0]
        assert n > 0 and n & (n - 1) == 0
        if n >= _DEVICE_MIN_WIDTH:
            import jax.numpy as jnp

            digests = HB.digests_to_bytes(HB.leaf_hash(jnp.asarray(values)))
        else:
            digests = HB.digests_to_bytes(HB.leaf_hash_np(values))
        return MerkleTree(_levels=_build_levels_from_digest_bytes(digests))

    @staticmethod
    def from_leaf_digests(digest_bytes: np.ndarray) -> "MerkleTree":
        """Build from precomputed (N, 32) uint8 leaf digests."""
        return MerkleTree(_levels=_build_levels_from_digest_bytes(digest_bytes))

    # -- queries (merkle.rs:40-96) -------------------------------------------

    @property
    def root(self) -> Hash:
        return Hash(self.levels[-1][0].tobytes())

    def get_root(self) -> Hash:
        return self.root

    @property
    def num_leaves(self) -> int:
        return self.levels[0].shape[0]

    def leaf(self, index: int) -> Hash:
        return Hash(self.levels[0][index].tobytes())

    @staticmethod
    def commit(leaves) -> Hash:
        """Root-only build (merkle.rs:44-65)."""
        return MerkleTree(leaves).root

    def open(self, index: int) -> list[Hash]:
        """Sibling authentication path, bottom-up (merkle.rs:67-80)."""
        assert index < self.num_leaves, "Index out of bounds"
        proof = []
        idx = index
        for level in self.levels[:-1]:
            sibling = idx + 1 if idx % 2 == 0 else idx - 1
            proof.append(Hash(level[sibling].tobytes()))
            idx //= 2
        return proof

    @staticmethod
    def verify(leaf: Hash, index: int, proof: list[Hash], root: Hash) -> bool:
        """Refold by index parity (merkle.rs:82-96)."""
        current = leaf
        idx = index
        for sibling in proof:
            if idx % 2 == 0:
                current = Hash.combine(current, sibling)
            else:
                current = Hash.combine(sibling, current)
            idx //= 2
        return current == root


def _build_levels_from_digest_bytes(leaf_bytes: np.ndarray) -> list[np.ndarray]:
    """Pairwise Hash::combine bottom-up, storing every level (merkle.rs:18-29)."""
    levels = [np.ascontiguousarray(leaf_bytes, dtype=np.uint8)]
    current = HB.bytes_to_digests(levels[0])  # (32, N)
    while current.shape[1] > 1:
        if current.shape[1] >= _DEVICE_MIN_WIDTH:
            import jax.numpy as jnp

            nxt = HB.merkle_level(jnp.asarray(current))
            nxt = np.asarray(nxt, dtype=np.uint32)
        else:
            nxt = HB.merkle_level_np(current)
        levels.append(HB.digests_to_bytes(nxt))
        current = nxt
    return levels
