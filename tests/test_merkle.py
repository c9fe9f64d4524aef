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


class TestFusedTailTrees:
    """Fused tail builder (ops/hash_batch.tail_levels) + the vectorized
    stack path gather (merkle.path_gather_dev) — the one-dispatch tree and
    one-dispatch query machinery behind the FRI commit/query phases."""

    def test_full_device_tree_matches_scalar(self):
        rng = np.random.default_rng(7)
        for n in [32, 256, 4096]:  # narrow (1, w) and tiled (R, 128) stacks
            values = rng.integers(0, 998244353, size=n, dtype=np.uint32)
            tree = MerkleTree.from_leaf_values_full_device(values)
            scalar = MerkleTree(
                [Hash.from_field_elements([int(v)]) for v in values]
            )
            assert tree.root == scalar.root
            idxs = [0, 1, n // 2, n - 1]
            assert tree.open_batch(idxs) == [scalar.open(i) for i in idxs]

    def test_path_gather_dev_matches_open_batch(self):
        import jax
        import jax.numpy as jnp

        from stark_tpu.merkle import path_gather_dev

        rng = np.random.default_rng(8)
        n = 2048
        values = rng.integers(0, 998244353, size=n, dtype=np.uint32)
        tree = MerkleTree.from_leaf_values_full_device(values)
        idxs = [0, 5, 1023, 2047]
        ops, n_path = tree.gather_operands()
        fn = jax.jit(lambda o, s, i: path_gather_dev(o, s, i, n_path))
        sib = np.asarray(fn(ops[0], ops[1], jnp.asarray(idxs, jnp.int32)))
        paths = MerkleTree.paths_from_dev(sib)
        assert paths == tree.open_batch(idxs)

    @pytest.mark.slow
    def test_wide_plus_tail_seam(self):
        # Leaf width above FUSE_MAX_WIDTH: per-level wide combines feed the
        # fused tail (n_pre > 1); paths cross the seam.
        from stark_tpu.ops import hash_batch as HB

        rng = np.random.default_rng(9)
        n = 2 * HB.FUSE_MAX_WIDTH
        values = rng.integers(0, 998244353, size=n, dtype=np.uint32)
        tree = MerkleTree.from_leaf_values_full_device(values)
        assert tree._tail_first == 2 and tree._tail_stack is not None
        # Spot-check paths by refolding to the root (merkle.rs:82-96).
        for i in [0, n // 2 + 3, n - 1]:
            leaf = Hash.from_field_elements([int(values[i])])
            assert MerkleTree.verify(leaf, i, tree.open(i), tree.root)

    @pytest.mark.slow
    def test_bitrev_wide_tree_matches_scalar_reference(self):
        """Wide trees store pre levels bit-reversed (contiguous-halves
        combine fast path).  Every externally visible surface must be
        natural-order: root, levels property, leaf accessor, and opened
        paths (refolded to the root)."""
        import numpy as np

        from stark_tpu import native
        from stark_tpu.ops import hash_batch as HB

        rng = np.random.default_rng(10)
        n = 4 * HB.FUSE_MAX_WIDTH  # two wide (bitrev) levels + tail
        values = rng.integers(0, 998244353, size=n, dtype=np.uint32)
        tree = MerkleTree.from_leaf_values_full_device(values)
        assert tree._bitrev_pre and tree._tail_first == 3

        if native.AVAILABLE:
            digests = native.hash_u64s(values.astype(np.uint64))
            ref_levels = native.merkle_levels(digests)
            assert tree.root.data == ref_levels[-1][0].tobytes()
            # Host-materialized levels are unpermuted back to natural.
            assert np.array_equal(tree.levels[0], ref_levels[0])
            assert np.array_equal(tree.levels[1], ref_levels[1])
            assert np.array_equal(tree.levels[2], ref_levels[2])
            assert tree.leaf(12345).data == digests[12345].tobytes()

        idxs = [0, 1, 2, 77777, n // 2, n - 1]
        paths = tree.open_batch(idxs)
        for i, p in zip(idxs, paths):
            leaf = Hash.from_field_elements([int(values[i])])
            assert MerkleTree.verify(leaf, i, p, tree.root), i


def test_semirev_position_maps_agree():
    """The three semirev index maps must agree: the device-traceable
    _semirev_pos, the host _semirev_host sigma array, and a brute-force
    string-reversal model — for every (K, lgF) combination a tree up to
    2^10 leaves with a 2^4 cutover can produce."""
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.merkle import _semirev_host, _semirev_pos

    for K in range(0, 5):
        for lgF in range(1, 5):
            W = 1 << (K + lgF)
            idx = np.arange(W)
            sigma = _semirev_host(K, lgF)
            dev = np.asarray(
                _semirev_pos(jnp.asarray(idx, jnp.int32), K, lgF)
            )
            brute = np.array(
                [
                    (
                        (
                            int(format(j & ((1 << K) - 1), f"0{K}b")[::-1], 2)
                            if K
                            else 0
                        )
                        << lgF
                    )
                    | (j >> K)
                    for j in idx
                ]
            )
            assert np.array_equal(sigma, brute), (K, lgF)
            assert np.array_equal(dev, brute), (K, lgF)
            # sigma is a permutation (bijective storage map)
            assert len(set(sigma.tolist())) == W


@pytest.mark.slow
def test_row_hash_semirev_tree_matches_natural_multi_register():
    """Wide trace tree via the fused semirev row hash (c > 1) must equal
    the natural-order build: same root, same opened paths — the c=8 MDS
    flagship's trace commitment takes exactly this path at N > 2^16."""
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.ops import hash_batch as HB

    rng = np.random.default_rng(11)
    c, n = 3, 2 * HB.FUSE_MAX_WIDTH
    cols = rng.integers(0, 998244353, size=(c, n), dtype=np.uint32)

    K0 = n.bit_length() - HB.FUSE_MAX_WIDTH.bit_length()
    t_semi = MerkleTree.from_leaf_digests_semirev(
        HB.row_hash_rows_semirev(jnp.asarray(cols), K0)
    )
    t_nat = MerkleTree.from_leaf_digests(
        HB.row_hash_rows(jnp.asarray(cols).reshape(c, -1, HB.LANE))
    )
    assert t_semi.root == t_nat.root
    idxs = [0, 1, 12345, n // 2, n - 1]
    assert t_semi.open_batch(idxs) == t_nat.open_batch(idxs)
    for i in idxs:
        leaf = Hash.from_field_elements([int(v) for v in cols[:, i]])
        assert MerkleTree.verify(leaf, i, t_semi.open(i), t_semi.root), i
