"""FRI integration tests: the reference's four prove->serialize->deserialize
->verify round-trips (fri.rs:527-694) plus fold correctness, index-sampling
determinism, and tamper rejection."""

import numpy as np
import pytest

import jax.numpy as jnp

from stark_tpu.field import FiniteField
from stark_tpu.fri import Fri, _test_colinearity_scalar
from stark_tpu.hashfn import Hash
from stark_tpu.ops import ntt as NTT
from stark_tpu.ops.fieldops import P, primitive_nth_root
from stark_tpu.stream import ProofStream
from stark_tpu.transcript import FiatShamir

FIELD = FiniteField()


def coset_codeword(coeffs, n, offset):
    """Evaluate poly(coeffs) on {offset * omega_n^i} (the reference's test
    setup, fri.rs:575-578)."""
    return NTT.naive_eval_domain(coeffs, [
        (offset * pow(primitive_nth_root(n), i, P)) % P for i in range(n)
    ])


def prove_verify_roundtrip(codeword, n, offset, expansion, tests):
    omega = primitive_nth_root(n)
    fri = Fri(omega, offset, n, expansion, tests, field=FIELD)
    stream = ProofStream()
    prover_fs = FiatShamir()
    fri.prove(jnp.asarray(codeword, dtype=jnp.uint32), prover_fs, stream)
    proof = stream.serialize()
    verifier_stream = ProofStream.deserialize(proof, FIELD)
    verifier_fs = FiatShamir()
    values = []
    ok = fri.verify(verifier_stream, verifier_fs, values)
    return ok, proof, values, prover_fs, verifier_fs


class TestFriRoundtrips:
    """The reference's four integration configs (fri.rs:532-693)."""

    def test_constant(self):
        codeword = np.full(32, 5, dtype=np.uint32)
        ok, _, _, pfs, vfs = prove_verify_roundtrip(codeword, 32, 3, 4, 2)
        assert ok

    def test_linear(self):
        codeword = coset_codeword([5, 3], 64, 7)
        ok, _, values, pfs, vfs = prove_verify_roundtrip(codeword, 64, 7, 4, 3)
        assert ok
        # recorded top-level values must match the codeword
        for idx, fe in values:
            assert fe.value == int(codeword[idx])

    def test_quadratic(self):
        codeword = coset_codeword([1, 3, 2], 128, 13)
        ok, *_ = prove_verify_roundtrip(codeword, 128, 13, 4, 4)
        assert ok

    def test_degree7_expansion8(self):
        codeword = coset_codeword([1, 2, 5, 3, 7, 4, 1, 2], 256, 17)
        ok, *_ = prove_verify_roundtrip(codeword, 256, 17, 8, 5)
        assert ok

    def test_prover_verifier_transcripts_equal(self):
        codeword = coset_codeword([5, 3], 64, 7)
        ok, _, _, pfs, vfs = prove_verify_roundtrip(codeword, 64, 7, 4, 3)
        assert ok
        assert bytes(pfs.transcript) == bytes(vfs.transcript)

    def test_proof_deterministic(self):
        codeword = coset_codeword([1, 3, 2], 128, 13)
        _, p1, *_ = prove_verify_roundtrip(codeword, 128, 13, 4, 4)
        _, p2, *_ = prove_verify_roundtrip(codeword, 128, 13, 4, 4)
        assert p1 == p2

    def test_too_high_degree_rejected(self):
        # degree 31 poly, domain 64, expansion 4 -> bound is 15: must fail
        rng = np.random.default_rng(1)
        coeffs = rng.integers(0, P, size=32, dtype=np.uint64).tolist()
        codeword = coset_codeword(coeffs, 64, 7)
        ok, *_ = prove_verify_roundtrip(codeword, 64, 7, 4, 3)
        assert not ok

    def test_tampered_proof_rejected(self):
        codeword = coset_codeword([1, 3, 2], 128, 13)
        ok, proof, *_ = prove_verify_roundtrip(codeword, 128, 13, 4, 4)
        assert ok
        fri = Fri(primitive_nth_root(128), 13, 128, 4, 4, field=FIELD)
        rejected = 0
        for pos in [1, 40, len(proof) // 2, len(proof) - 5]:
            bad = bytearray(proof)
            bad[pos] ^= 0xFF
            stream = ProofStream.deserialize(bytes(bad), FIELD)
            if not fri.verify(stream, FiatShamir(), []):
                rejected += 1
        assert rejected == 4


class TestFold:
    def test_fold_matches_scalar_formula(self):
        # fri.rs:57-91: folded[i] = 2^{-1}((1+a/x)f(i) + (1-a/x)f(half+i))
        n, offset = 64, 7
        omega = primitive_nth_root(n)
        fri = Fri(omega, offset, n, 4, 3, field=FIELD)
        rng = np.random.default_rng(2)
        codeword = rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)
        alpha = int(rng.integers(0, 1 << 64, dtype=np.uint64))  # raw u64
        got = np.asarray(fri.fold_codeword(jnp.asarray(codeword), alpha, 0))
        inv2 = pow(2, P - 2, P)
        half = n // 2
        for i in range(half):
            x = (offset * pow(omega, i, P)) % P
            ax = (alpha * pow(x, P - 2, P)) % P
            a = (1 + ax) % P
            b = (1 - ax) % P
            want = (
                inv2 * ((a * int(codeword[i]) + b * int(codeword[half + i])) % P)
            ) % P
            assert int(got[i]) == want, f"i={i}"

    def test_fold_preserves_low_degree(self):
        # folding a degree-(2d+1) codeword gives the degree-d even/odd mix
        n, offset = 128, 5
        omega = primitive_nth_root(n)
        fri = Fri(omega, offset, n, 4, 4, field=FIELD)
        coeffs = [3, 1, 4, 1, 5, 9, 2, 6]  # degree 7
        codeword = coset_codeword(coeffs, n, offset)
        folded = np.asarray(
            fri.fold_codeword(jnp.asarray(codeword, dtype=jnp.uint32), 12345, 0)
        )
        # folded should be an evaluation of a degree-3 poly on the squared coset
        c = np.asarray(NTT.coset_interp(folded, (offset * offset) % P))
        assert all(int(v) == 0 for v in c[4:])


class TestSampling:
    def test_sample_index_contract(self):
        # fri.rs:168-174: fold bytes into u128, mod size
        h = Hash.from_bytes(b"seed").data
        acc = 0
        for b in h:
            acc = ((acc << 8) ^ b) & ((1 << 128) - 1)
        assert Fri.sample_index(h, 1000) == acc % 1000

    def test_sample_indices_dedup_and_bounds(self):
        fri = Fri(primitive_nth_root(64), 7, 64, 4, 3, field=FIELD)
        seed = Hash.from_bytes(b"s").data
        idx = fri.sample_indices(seed, 32, 8, 8)
        assert len(idx) == 8
        reduced = [i % 8 for i in idx]
        assert len(set(reduced)) == 8  # dedup on reduced index
        assert all(i < 32 for i in idx)
        with pytest.raises(AssertionError):
            fri.sample_indices(seed, 32, 4, 8)  # more than reduced_size

    def test_device_sampler_matches_host(self):
        """The device index sampler (hash_batch.sample_indices_core) must
        reproduce Fri::sample_indices byte-exactly, including the dedup
        walk (fri.rs:176-213)."""
        import jax.numpy as jnp

        from stark_tpu.hashfn import Hash as H
        from stark_tpu.hashfn import hash_bytes
        from stark_tpu.ops import hash_batch as HB

        fri = Fri(primitive_nth_root(64), 7, 64, 4, 3, field=FIELD)
        for trial in range(3):
            t = bytes([trial * 7 + i % 256 for i in range(100)])
            digest = hash_bytes(t)
            seed = H.from_u64(int.from_bytes(digest[:8], "little")).data
            size, reduced, number = 1 << 12, 32, 8
            want = fri.sample_indices(seed, size, reduced, number)
            sd = HB.seed_digest_rows_core(jnp.asarray(bytearray(t)))
            got, cnt = HB.sample_indices_core(
                sd, 2 * number + 32, size, reduced, number
            )
            assert int(cnt) >= number
            assert [int(v) for v in np.asarray(got)] == want

    @pytest.mark.slow
    def test_wide_prefix_chain_is_byte_exact(self, monkeypatch):
        """Force the wide-prefix branch of the chained prove (per-round
        dispatches above FUSE_MAX_WIDTH feeding the fused mega tail) at
        CPU-suite shapes by shrinking the fuse cutover: bytes must equal
        the all-fused default.  (On TPU this branch runs at N >= 2^17;
        the CPU suite's domains are far below that.)  Slow: the shrunken
        cutover compiles ~40 graphs unique to this test (~45 s warm)."""
        import jax.numpy as jnp

        from stark_tpu.ops import hash_batch as HB
        from stark_tpu.ops import ntt as NTT
        from stark_tpu.stream import ProofStream
        from stark_tpu.transcript import FiatShamir

        n = 2048
        rng = np.random.default_rng(11)
        coeffs = np.zeros(n, dtype=np.uint32)
        coeffs[: n // 4] = rng.integers(0, P, size=n // 4, dtype=np.uint32)
        codeword = NTT.coset_eval(coeffs, 3)

        def run():
            fri = Fri(primitive_nth_root(n), 3, n, 4, 8, field=FIELD)
            fs, stream = FiatShamir(), ProofStream()
            fri.prove(jnp.asarray(codeword), fs, stream)
            return stream.serialize()

        good = run()
        monkeypatch.setattr(HB, "FUSE_MAX_WIDTH", 512)  # 2 wide rounds
        assert run() == good

    def test_sampler_shortfall_fallback_is_byte_exact(self, monkeypatch):
        """Force the device candidate pool below the requested count: the
        chained prove must detect the shortfall, re-run the mega graph
        with the host's indices, and emit IDENTICAL bytes."""
        import jax.numpy as jnp

        import stark_tpu.fri as fri_mod
        from stark_tpu.ops import ntt as NTT
        from stark_tpu.stream import ProofStream
        from stark_tpu.transcript import FiatShamir

        n = 256
        rng = np.random.default_rng(5)
        coeffs = np.zeros(n, dtype=np.uint32)
        coeffs[: n // 4] = rng.integers(0, P, size=n // 4, dtype=np.uint32)
        codeword = NTT.coset_eval(coeffs, 3)

        def run():
            fri = Fri(primitive_nth_root(n), 3, n, 4, 8, field=FIELD)
            fs, stream = FiatShamir(), ProofStream()
            fri.prove(jnp.asarray(codeword), fs, stream)
            return stream.serialize()

        good = run()
        # M = 2*number + slack; slack = -15 -> M = 1 < number = 8:
        # the sampler can never fill, so every prove takes the
        # idx_override re-run.
        monkeypatch.setattr(fri_mod, "_SAMPLE_SLACK", -15)
        assert run() == good


class TestColinearity:
    def test_scalar_colinearity(self):
        # y = 3x + 5 at x = 1, 2, 4
        pts = [(1, 8), (2, 11), (4, 17)]
        assert _test_colinearity_scalar(*pts)
        assert not _test_colinearity_scalar((1, 8), (2, 11), (4, 18))

    def test_unreduced_coordinates(self):
        # raw u64 challenge as cx: per-op reduction semantics
        cx = (1 << 63) + 977
        cxr = cx % P
        y_at = lambda x: (3 * x + 5) % P
        assert _test_colinearity_scalar((1, y_at(1)), (2, y_at(2)), (cx, y_at(cxr)))


class TestDeviceChainedCommit:
    def test_chain_matches_classic_commit(self):
        """The zero-sync device commit chain must produce byte-identical
        streams and transcripts to the classic per-round path."""
        import jax.numpy as jnp
        from stark_tpu.ops import ntt as NTT
        from stark_tpu.ops.fieldops import primitive_nth_root
        from stark_tpu.stream import ProofStream
        from stark_tpu.transcript import FiatShamir

        n = 512  # 5 rounds; larger n only adds one-off compile cost
        rng = np.random.default_rng(23)
        coeffs = np.zeros(n, dtype=np.uint32)
        coeffs[: n // 4] = rng.integers(0, P, size=n // 4, dtype=np.uint32)
        codeword = NTT.coset_eval(coeffs, 3)

        def run(chain: bool):
            fri = Fri(
                omega=primitive_nth_root(n),
                offset=3,
                domain_length=n,
                expansion_factor=4,
                num_colinearity_tests=4,
            )
            fri.device_chain = chain
            fs, stream = FiatShamir(), ProofStream()
            fri.prove(jnp.asarray(codeword), fs, stream)
            return stream.serialize(), bytes(fs.transcript)

        p_chain, t_chain = run(True)
        p_classic, t_classic = run(False)
        assert p_chain == p_classic
        assert t_chain == t_classic


    @pytest.mark.slow
    def test_chain_matches_classic_commit_wide(self):
        """Same byte-identity at a width with WIDE (> FUSE_MAX_WIDTH)
        round trees: the classic path's _query_gather_fn must map the
        semirev-stored pre levels exactly like the chained mega does
        (round-5 layout; both paths vs each other pins it)."""
        import jax.numpy as jnp
        from stark_tpu.ops import ntt as NTT
        from stark_tpu.ops import hash_batch as HB
        from stark_tpu.ops.fieldops import primitive_nth_root
        from stark_tpu.stream import ProofStream
        from stark_tpu.transcript import FiatShamir

        n = 2 * HB.FUSE_MAX_WIDTH  # round-0 tree has one semirev level
        rng = np.random.default_rng(29)
        coeffs = np.zeros(n, dtype=np.uint32)
        coeffs[: n // 4] = rng.integers(0, P, size=n // 4, dtype=np.uint32)
        codeword = NTT.coset_eval(coeffs, 3)

        def run(chain: bool):
            fri = Fri(
                omega=primitive_nth_root(n),
                offset=3,
                domain_length=n,
                expansion_factor=4,
                num_colinearity_tests=4,
            )
            fri.device_chain = chain
            fs, stream = FiatShamir(), ProofStream()
            fri.prove(jnp.asarray(codeword), fs, stream)
            return stream.serialize(), bytes(fs.transcript)

        p_chain, t_chain = run(True)
        p_classic, t_classic = run(False)
        assert p_chain == p_classic
        assert t_chain == t_classic
