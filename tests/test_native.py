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
