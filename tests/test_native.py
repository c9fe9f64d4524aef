"""Native C host engine vs the numpy oracle: every binding bit-exact."""

import numpy as np
import pytest

from stark_tpu import native
from stark_tpu.hashfn import Hash, _hash_bytes_py

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="no C compiler available"
)


def test_hash_bytes_matches_numpy_engine():
    rng = np.random.default_rng(0)
    for length in (0, 1, 7, 8, 31, 32, 33, 64, 100, 1000):
        data = rng.integers(0, 256, size=length, dtype=np.uint8).tobytes()
        assert native.hash_bytes(data) == _hash_bytes_py(data), length


def test_combine_matches():
    a = _hash_bytes_py(b"left")
    b = _hash_bytes_py(b"right")
    assert native.combine(a, b) == _hash_bytes_py(a + b)


def test_challenge_matches_transcript():
    t = b"some transcript bytes" * 9
    want = int.from_bytes(_hash_bytes_py(t)[:8], "little")
    assert native.challenge(t) == want


def test_sample_indices_matches_python_loop():
    from stark_tpu.fri import Fri

    seed = _hash_bytes_py(b"seed")
    size, reduced, number = 1 << 16, 1 << 8, 40
    got = native.sample_indices(seed, size, reduced, number)
    # python reference loop (fri.rs:176-213 semantics)
    indices, seen = [], set()
    counter = 0
    while len(indices) < number:
        d = _hash_bytes_py(seed + counter.to_bytes(4, "little"))
        idx = Fri.sample_index(d, size)
        counter += 1
        if idx % reduced not in seen:
            seen.add(idx % reduced)
            indices.append(idx)
    assert got == indices


def test_sample_indices_overflow_raises():
    with pytest.raises(AssertionError):
        native.sample_indices(b"\x00" * 32, 16, 4, 8)


def test_merkle_verify_roundtrip():
    from stark_tpu.merkle import MerkleTree

    leaves = [Hash(_hash_bytes_py(bytes([i]))) for i in range(8)]
    tree = MerkleTree(leaves)
    for i in range(8):
        path = tree.open(i)
        assert native.merkle_verify(
            leaves[i].data, i, [h.data for h in path], tree.root.data
        )
        assert not native.merkle_verify(
            leaves[(i + 1) % 8].data, i, [h.data for h in path], tree.root.data
        )


def test_hash_u64s_matches():
    vals = [0, 1, 998244352, (1 << 40) + 7]
    out = native.hash_u64s(np.array(vals, dtype=np.uint64))
    for i, v in enumerate(vals):
        assert out[i].tobytes() == Hash.from_field_elements([v]).data


def test_merkle_levels_matches():
    from stark_tpu.merkle import MerkleTree

    rng = np.random.default_rng(5)
    leaves = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    got = native.merkle_levels(leaves)
    # numpy-engine oracle
    from stark_tpu.ops import hash_batch as HB

    want = [np.ascontiguousarray(leaves)]
    cur = HB.bytes_to_digests(leaves)
    while cur.shape[1] > 1:
        cur = HB.merkle_level_np(cur)
        want.append(HB.digests_to_bytes(cur))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def _rand_tree_paths(rng, n_leaves, n_paths, arity):
    """Build a real Merkle tree over random u64 rows; return rows, indices,
    paths, root (pure-Python engines — the oracle side)."""
    from stark_tpu.merkle import MerkleTree

    rows = rng.integers(0, 1 << 63, size=(n_leaves, arity), dtype=np.uint64)
    leaves = [Hash.from_field_elements([int(v) for v in r]) for r in rows]
    tree = MerkleTree(leaves)
    idxs = rng.integers(0, n_leaves, size=n_paths, dtype=np.uint64)
    paths = [tree.open(int(i)) for i in idxs]
    return rows, idxs, paths, tree.root


def test_merkle_verify_batch_soa_tiles_and_first_fail():
    """The SoA lane-parallel batch verifier (tiles of 64) vs the scalar
    walk: all-pass at tile-boundary sizes, and exact smallest-failing-index
    semantics under tampering anywhere in a tile."""
    rng = np.random.default_rng(7)
    for arity in (1, 3):
        rows, idxs, paths, root = _rand_tree_paths(rng, 128, 130, arity)
        path_len = len(paths[0])
        roots_flat = root.data * len(idxs)

        def run(leaf_rows, indices, path_list):
            flat = b"".join(h.data for p in path_list for h in p)
            return native.merkle_verify_batch(
                leaf_rows, indices, flat, path_len, root.data * len(indices)
            )

        for k in (1, 2, 63, 64, 65, 130):
            leaf_rows = [
                [int(v) for v in rows[int(idxs[q])]] for q in range(k)
            ]
            assert run(leaf_rows, idxs[:k], paths[:k]) == -1, (arity, k)

        # Tamper one lane per interesting position: the returned index must
        # be exactly that lane (scalar first-fail semantics), including
        # lanes inside the second 64-wide tile.
        for bad in (0, 1, 63, 64, 65, 129):
            k = 130
            leaf_rows = [
                [int(v) for v in rows[int(idxs[q])]] for q in range(k)
            ]
            leaf_rows[bad][0] ^= 1
            assert run(leaf_rows, idxs[:k], paths[:k]) == bad, (arity, bad)

        # Two bad lanes: smallest wins.
        leaf_rows = [[int(v) for v in rows[int(idxs[q])]] for q in range(130)]
        leaf_rows[5][0] ^= 1
        leaf_rows[99][0] ^= 1
        assert run(leaf_rows, idxs[:130], paths[:130]) == 5

        # Tampered sibling digest (not leaf) also fails at the right lane.
        k = 70
        leaf_rows = [[int(v) for v in rows[int(idxs[q])]] for q in range(k)]
        flat = bytearray(
            b"".join(h.data for p in paths[:k] for h in p)
        )
        flat[66 * path_len * 32 + 5] ^= 0xFF
        assert (
            native.merkle_verify_batch(
                leaf_rows, idxs[:k], bytes(flat), path_len, root.data * k
            )
            == 66
        )

    # Unsupported arity falls back (-2).
    assert (
        native.merkle_verify_batch(
            [[1] * 65], [0], b"\x00" * 32, 1, b"\x00" * 32
        )
        == -2
    )
