"""Hash tests: reference-contract behavior (hash.rs:101-150 test suite) plus
scalar-vs-vectorized engine equivalence (the bit-exactness backbone)."""

import numpy as np

import jax.numpy as jnp

from stark_tpu.hashfn import Hash, hash_bytes
from stark_tpu.ops import hash_batch as HB

RNG = np.random.default_rng(7)


class TestScalarHash:
    def test_deterministic(self):
        assert Hash.from_bytes(b"hello") == Hash.from_bytes(b"hello")

    def test_different_inputs(self):
        assert Hash.from_bytes(b"hello") != Hash.from_bytes(b"world")

    def test_avalanche(self):
        h1 = Hash.from_bytes(b"hello").data
        h2 = Hash.from_bytes(b"hallo").data
        diff = sum(1 for a, b in zip(h1, h2) if a != b)
        assert diff > 10, "Hash should have good avalanche effect"

    def test_from_field_elements(self):
        h = Hash.from_field_elements([1, 2, 3, 4, 5])
        assert len(h.data) == 32
        # LE u64 concat contract (hash.rs:32-35)
        manual = hash_bytes(b"".join(v.to_bytes(8, "little") for v in [1, 2, 3, 4, 5]))
        assert h.data == manual

    def test_combine(self):
        h1 = Hash.from_bytes(b"left")
        h2 = Hash.from_bytes(b"right")
        c = Hash.combine(h1, h2)
        assert c != h1 and c != h2
        assert c.data == hash_bytes(h1.data + h2.data)

    def test_empty_and_chunk_boundaries(self):
        # 0, 31, 32, 33, 63, 64, 65 bytes — chunking edges (hash.rs:14)
        for n in [0, 1, 7, 8, 31, 32, 33, 63, 64, 65, 100]:
            data = bytes(range(n % 256))[:n] if n <= 256 else bytes(n)
            h = hash_bytes(data)
            assert len(h) == 32
            assert h == hash_bytes(data)  # deterministic

    def test_from_u64_unreduced(self):
        # from_u64 consumes the RAW value (fri.rs:272 quirk)
        v = (1 << 63) + 12345
        assert Hash.from_u64(v).data == hash_bytes(v.to_bytes(8, "little"))


class TestStackedMix:
    """The stacked-state mix (cumsum diffusion) must be bit-identical to
    the row-list mix it replaces on the latency paths."""

    def test_mix_stacked_matches_rows(self):
        import jax.numpy as jnp

        from stark_tpu.ops import hash_batch as HB

        rng = np.random.default_rng(3)
        for shape in ((5,), (3, 128)):
            s = rng.integers(0, 256, size=(32,) + shape).astype(np.uint8)
            rows = [jnp.asarray(s[i]) for i in range(32)]
            want = np.stack(
                [np.asarray(r) for r in HB._mix_rows(rows)], axis=0
            )
            got = np.asarray(HB._mix_stacked(jnp.asarray(s)))
            assert np.array_equal(got, want), shape

    def test_combine_stacked_matches_scalar(self):
        import jax.numpy as jnp

        from stark_tpu.ops import hash_batch as HB

        rng = np.random.default_rng(4)
        left = rng.integers(0, 256, size=(32, 4)).astype(np.uint8)
        right = rng.integers(0, 256, size=(32, 4)).astype(np.uint8)
        got = np.asarray(
            HB._combine_stacked(jnp.asarray(left), jnp.asarray(right))
        )
        for j in range(4):
            want = Hash.combine(
                Hash(bytes(left[:, j])), Hash(bytes(right[:, j]))
            ).data
            assert bytes(got[:, j]) == want


class TestPackedFetch:
    def test_pack_unpack_roundtrip(self):
        import jax
        import jax.numpy as jnp

        from stark_tpu.fri import _pack_u8, _unpack_u8

        tree = [
            jnp.arange(7, dtype=jnp.uint32),
            (jnp.ones((2, 3), jnp.uint8), None, jnp.int32(-5)),
            [jnp.asarray(9.0, jnp.float32)],
        ]
        out = _unpack_u8(jax.device_get(_pack_u8(tree)), tree)
        flat_in, _ = jax.tree.flatten(tree)
        flat_out, _ = jax.tree.flatten(out)
        for a, b in zip(flat_in, flat_out):
            assert np.array_equal(np.asarray(a), np.asarray(b))


class TestBatchedHash:
    """Device/numpy vectorized engines must be byte-identical to scalar."""

    def test_leaf_hash_matches_scalar(self):
        values = np.concatenate(
            [
                np.array([0, 1, 2, 998244352, 12345678], dtype=np.uint32),
                RNG.integers(0, 998244353, size=64, dtype=np.uint64).astype(
                    np.uint32
                ),
            ]
        )
        want = np.stack(
            [
                np.frombuffer(
                    Hash.from_field_elements([int(v)]).data, dtype=np.uint8
                )
                for v in values
            ]
        )
        got_np = HB.digests_to_bytes(HB.leaf_hash_np(values))
        got_dev = HB.digests_to_bytes(HB.leaf_hash(jnp.asarray(values)))
        np.testing.assert_array_equal(got_np, want)
        np.testing.assert_array_equal(got_dev, want)

    def test_row_hash_matches_scalar(self):
        for c in [1, 2, 3, 4, 5, 8]:
            values = RNG.integers(0, 998244353, size=(c, 16), dtype=np.uint64).astype(
                np.uint32
            )
            want = np.stack(
                [
                    np.frombuffer(
                        Hash.from_field_elements(
                            [int(values[r, i]) for r in range(c)]
                        ).data,
                        dtype=np.uint8,
                    )
                    for i in range(16)
                ]
            )
            got = HB.digests_to_bytes(HB.row_hash(jnp.asarray(values)))
            np.testing.assert_array_equal(got, want, err_msg=f"c={c}")

    def test_combine_matches_scalar(self):
        n = 32
        left = RNG.integers(0, 256, size=(n, 32), dtype=np.uint8)
        right = RNG.integers(0, 256, size=(n, 32), dtype=np.uint8)
        want = np.stack(
            [
                np.frombuffer(
                    Hash.combine(
                        Hash(left[i].tobytes()), Hash(right[i].tobytes())
                    ).data,
                    dtype=np.uint8,
                )
                for i in range(n)
            ]
        )
        got_dev = HB.digests_to_bytes(
            HB.combine(
                jnp.asarray(HB.bytes_to_digests(left)),
                jnp.asarray(HB.bytes_to_digests(right)),
            )
        )
        got_np = HB.digests_to_bytes(
            HB.combine_core(np, HB.bytes_to_digests(left), HB.bytes_to_digests(right))
        )
        np.testing.assert_array_equal(got_dev, want)
        np.testing.assert_array_equal(got_np, want)


class TestIncrementalSponge:
    """The incremental transcript sponge (hash_batch.sponge_*) must be
    byte-identical to re-hashing the whole transcript from scratch
    (transcript_state_core / the scalar FiatShamir) at every length and
    absorb pattern the provers use — it carries every device challenge."""

    def test_sponge_matches_full_rehash_all_tail_lengths(self):
        for L in [1, 8, 16, 24, 31, 32, 33, 40, 64, 96, 112, 288, 289]:
            t = RNG.integers(0, 256, size=L, dtype=np.uint8)
            td = jnp.asarray(t)
            ref = np.stack(
                [
                    np.asarray(r)[0]
                    for r in HB.transcript_state_core(
                        td[None, :], rolled=True
                    )
                ]
            )
            st, pend = HB.sponge_from_bytes(td)
            got = np.asarray(HB.sponge_state(st, pend))
            np.testing.assert_array_equal(got, ref, err_msg=f"L={L}")

    def test_incremental_absorb_chain_matches_scalar_challenges(self):
        """Replay the prover's draw-absorb-draw pattern (8-byte digests,
        32-byte roots) against the scalar FiatShamir transcript."""
        from stark_tpu.field import FiniteField
        from stark_tpu.transcript import FiatShamir

        field = FiniteField()
        fs = FiatShamir()
        root = RNG.integers(0, 256, size=32, dtype=np.uint8)
        fs.absorb(root.tobytes())
        st, pend = HB.sponge_from_bytes(jnp.asarray(root))
        for step in range(6):
            a_host = fs.challenge(field).value % (2**64)
            stf = HB.sponge_state(st, pend)
            d8 = np.asarray(stf[:8]).tobytes()
            assert d8 == (a_host).to_bytes(8, "little"), step
            # alternate absorbing the digest (challenge chain) and a
            # fresh 32-byte root (FRI round) — both absorb paths.
            if step % 2 == 0:
                fs.absorb(d8)
                st, pend = HB.sponge_absorb(st, pend, stf[:8])
            else:
                r2 = RNG.integers(0, 256, size=32, dtype=np.uint8)
                fs.absorb(r2.tobytes())
                st, pend = HB.sponge_absorb(st, pend, jnp.asarray(r2))

    def test_batched_sponge_matches_per_proof(self):
        B, L = 3, 72
        ts = RNG.integers(0, 256, size=(B, L), dtype=np.uint8)
        st, pend = HB.sponge_from_bytes(jnp.asarray(ts.T))
        alphas = np.asarray(HB.state_alpha(HB.sponge_state(st, pend)))
        want = np.asarray(
            HB.transcript_alpha_core(jnp.asarray(ts), rolled=True)
        )
        np.testing.assert_array_equal(alphas, want)
