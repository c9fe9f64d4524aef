"""Merkle tests: reference contract (merkle.rs:99-134) + device path parity."""

import numpy as np
import pytest

from stark_tpu.hashfn import Hash
from stark_tpu.merkle import MerkleTree


class TestMerkle:
    def test_tree_shape(self):
        leaves = [Hash.from_bytes(bytes([i])) for i in range(4)]
        tree = MerkleTree(leaves)
        assert tree.num_leaves == 4
        assert len(tree.levels) == 3  # n leaves -> log n + 1 levels

    def test_open_verify_roundtrip(self):
        leaves = [Hash.from_bytes(bytes([i])) for i in range(8)]
        tree = MerkleTree(leaves)
        for i in range(8):
            proof = tree.open(i)
            assert MerkleTree.verify(leaves[i], i, proof, tree.root)

    def test_invalid_leaf_rejected(self):
        leaves = [Hash.from_bytes(bytes([i])) for i in range(4)]
        tree = MerkleTree(leaves)
        proof = tree.open(0)
        wrong = Hash.from_bytes(bytes([99]))
        assert not MerkleTree.verify(wrong, 0, proof, tree.root)

    def test_wrong_index_rejected(self):
        leaves = [Hash.from_bytes(bytes([i])) for i in range(8)]
        tree = MerkleTree(leaves)
        proof = tree.open(3)
        assert not MerkleTree.verify(leaves[3], 2, proof, tree.root)

    def test_power_of_two_required(self):
        with pytest.raises(AssertionError):
            MerkleTree([Hash.from_bytes(b"a")] * 3)
        with pytest.raises(AssertionError):
            MerkleTree([])

    def test_commit_equals_root(self):
        leaves = [Hash.from_bytes(bytes([i])) for i in range(16)]
        assert MerkleTree.commit(leaves) == MerkleTree(leaves).root

    def test_root_matches_manual_combine(self):
        leaves = [Hash.from_bytes(bytes([i])) for i in range(4)]
        l01 = Hash.combine(leaves[0], leaves[1])
        l23 = Hash.combine(leaves[2], leaves[3])
        assert MerkleTree(leaves).root == Hash.combine(l01, l23)

    def test_device_path_matches_scalar(self):
        # from_leaf_values (device leaf hashing + device levels) must be
        # byte-identical to the scalar construction (fri.rs:117-128 path).
        rng = np.random.default_rng(3)
        for n in [4, 64, 2048]:  # spans the numpy/device width threshold
            values = rng.integers(0, 998244353, size=n, dtype=np.uint64).astype(
                np.uint32
            )
            dev_tree = MerkleTree.from_leaf_values(values)
            scalar_leaves = [Hash.from_field_elements([int(v)]) for v in values]
            scalar_tree = MerkleTree(scalar_leaves)
            assert dev_tree.root == scalar_tree.root
            for i in [0, 1, n // 2, n - 1]:
                assert dev_tree.open(i) == scalar_tree.open(i)
