"""End-to-end STARK tests: Fibonacci AIR prove -> serialize -> verify."""

import numpy as np
import pytest

from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
from stark_tpu.models.trace import Trace
from stark_tpu.ops.fieldops import P
from stark_tpu.stark import StarkConfig, StarkProver, StarkVerifier


class TestTrace:
    def test_fibonacci_reference_contract(self):
        # trace.rs:36-49: single column, a,b <- b,a+b from (1,1)
        t = Trace.fibonacci(10)
        assert t.num_columns == 1
        assert t.get_col(0) == [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]
        assert t.get_row(3) == [3]
        assert t.get(4, 0) == 5
        assert t.get(100, 0) is None

    def test_to_field_elements_truncates_u64(self):
        from stark_tpu.field import FiniteField

        t = Trace([[1], [(1 << 64) + 7]])
        fes = t.to_field_elements(FiniteField())
        assert fes[1][0].value == 7  # i128 -> u64 cast semantics (trace.rs:32)

    def test_mod_p_trace_satisfies_recurrence(self):
        rows = fibonacci_trace_mod_p(200)
        for i in range(198):
            assert rows[i + 2][0] == (rows[i][0] + rows[i + 1][0]) % P


class TestStarkEndToEnd:
    def run_roundtrip(self, T, blowup=4, tests=8):
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=T, blowup=blowup, num_colinearity_tests=tests)
        trace = fibonacci_trace_mod_p(T)
        proof = StarkProver(air, cfg).prove(trace)
        assert StarkVerifier(air, cfg).verify(proof)
        return proof

    def test_small(self):
        self.run_roundtrip(64, tests=4)

    def test_1k(self):
        self.run_roundtrip(1024, tests=8)

    def test_proof_deterministic(self):
        assert self.run_roundtrip(64, tests=4) == self.run_roundtrip(64, tests=4)

    def test_wrong_witness_rejected(self):
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, num_colinearity_tests=8)
        trace = fibonacci_trace_mod_p(64)
        trace[10][0] = (trace[10][0] + 1) % P  # break the recurrence
        proof = StarkProver(air, cfg).prove(trace)
        assert not StarkVerifier(air, cfg).verify(proof)

    def test_wrong_boundary_rejected(self):
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, num_colinearity_tests=8)
        rows = [[2]]  # starts 2,2,4,... satisfies recurrence, breaks boundary
        a, b = 2, 2
        for _ in range(63):
            rows.append([b])
            a, b = b, (a + b) % P
        proof = StarkProver(air, cfg).prove(rows)
        assert not StarkVerifier(air, cfg).verify(proof)

    def test_tampered_proof_rejected(self):
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, num_colinearity_tests=8)
        proof = StarkProver(air, cfg).prove(fibonacci_trace_mod_p(64))
        verifier = StarkVerifier(air, cfg)
        for pos in [5, len(proof) // 3, len(proof) - 10]:
            bad = bytearray(proof)
            bad[pos] ^= 0x55
            assert not verifier.verify(bytes(bad))


class TestTamperMatrix:
    """Targeted corruption classes must all be rejected."""

    def _setup(self):
        from stark_tpu.models.fibonacci import (
            FibonacciAir,
            fibonacci_trace_mod_p,
        )

        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=8)
        proof = StarkProver(air, cfg).prove(fibonacci_trace_mod_p(64))
        return air, cfg, proof

    def test_truncated_proof_rejected(self):
        air, cfg, proof = self._setup()
        v = StarkVerifier(air, cfg)
        for cut in (len(proof) // 2, len(proof) - 40, 10):
            assert not v.verify(proof[:cut]), f"accepted truncation at {cut}"

    def test_flip_every_region_rejected(self):
        air, cfg, proof = self._setup()
        v = StarkVerifier(air, cfg)
        # Sample byte positions across the whole stream (roots, codeword,
        # triples, paths, trace openings).
        for pos in range(1, len(proof), max(1, len(proof) // 13)):
            bad = bytearray(proof)
            bad[pos] ^= 0x40
            assert not v.verify(bytes(bad)), f"accepted flip at {pos}"

    def test_empty_and_garbage_rejected(self):
        air, cfg, _ = self._setup()
        v = StarkVerifier(air, cfg)
        assert not v.verify(b"")
        assert not v.verify(b"\x00" * 100)
        assert not v.verify(bytes(range(256)) * 4)


class TestPhaseTimer:
    def test_prove_with_timer_records_phases(self):
        from stark_tpu.utils.profiling import PhaseTimer

        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, num_colinearity_tests=4)
        timer = PhaseTimer()
        proof = StarkProver(air, cfg).prove(
            fibonacci_trace_mod_p(64), timer=timer
        )
        assert StarkVerifier(air, cfg).verify(proof)
        for phase in (
            "lde",
            "trace_commit",
            "challenges",
            "compose",
            "fri_commit",
            # trace openings and index sampling ride the fused dispatch +
            # single fetch; no separate phases exist for them.
        ):
            assert phase in timer.phases, phase
        # Chained prove: one packed fetch + host emit; classic prove:
        # sample + query phases.  Either decomposition must be present.
        assert {"fri_fetch", "fri_emit"} <= set(timer.phases) or {
            "fri_sample",
            "fri_query",
        } <= set(timer.phases), timer.phases
        assert "total" in timer.report()
        assert set(timer.ms()) == set(timer.phases)

    def test_timer_does_not_change_proof_bytes(self):
        from stark_tpu.utils.profiling import PhaseTimer

        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, num_colinearity_tests=4)
        trace = fibonacci_trace_mod_p(64)
        plain = StarkProver(air, cfg).prove(trace)
        timed = StarkProver(air, cfg).prove(trace, timer=PhaseTimer())
        assert plain == timed


class TestDegreeAndWidthGenerality:
    """Composer generality beyond d<=2/depth<=1 quotients (round-3 weak #2/#3):
    the degree bookkeeping widens the composition target to h*T-1 and runs
    FRI at expansion blowup/h when quotient degrees exceed T-1."""

    def test_cube_air_degree3_roundtrip(self):
        from stark_tpu.models.examples import CubeAir, cube_trace

        air = CubeAir()
        cfg = StarkConfig(trace_length=64, blowup=8, num_colinearity_tests=8)
        prover = StarkProver(air, cfg)
        assert prover.dom.h == 2
        assert prover.fri.expansion_factor == 4
        proof = prover.prove(cube_trace(64))
        assert StarkVerifier(air, cfg).verify(proof)

    def test_cube_air_tamper_rejected(self):
        from stark_tpu.models.examples import CubeAir, cube_trace

        air = CubeAir()
        cfg = StarkConfig(trace_length=64, blowup=8, num_colinearity_tests=8)
        trace = cube_trace(64)
        trace[7][0] = (trace[7][0] + 1) % P
        proof = StarkProver(air, cfg).prove(trace)
        assert not StarkVerifier(air, cfg).verify(proof)

    def test_degree_cap_is_loud(self):
        """blowup too small for the quotient degree: documented ValueError
        naming the supported class, not a bare assert (stark._Domain)."""
        from stark_tpu.models.examples import CubeAir

        with pytest.raises(ValueError, match="blowup >= 8"):
            StarkProver(
                CubeAir(),
                StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4),
            )

    def test_square_air_deep_frame_needs_wider_blowup(self):
        """Degree-2 constraints with frame depth 2 overflow the h=1 budget;
        h=2 at blowup=8 proves them."""
        from stark_tpu.models.air import Air, BoundaryConstraint

        class SquareSkipAir(Air):
            num_registers = 1
            frame_offsets = (0, 2)
            constraint_degree = 2

            def transition_constraints(self, frame, ops):
                return [ops.sub(frame[2][0], ops.mul(frame[0][0], frame[0][0]))]

            def boundary_constraints(self, trace_length):
                return [
                    BoundaryConstraint(row=0, register=0, value=3),
                    BoundaryConstraint(row=1, register=0, value=5),
                ]

        rows, a, b = [], 3, 5
        for _ in range(64):
            rows.append([a])
            a, b = b, (a * a) % P
        air = SquareSkipAir()
        with pytest.raises(ValueError, match="blowup >= 8"):
            StarkProver(air, StarkConfig(trace_length=64, blowup=4))
        cfg = StarkConfig(trace_length=64, blowup=8, num_colinearity_tests=8)
        proof = StarkProver(air, cfg).prove(rows)
        assert StarkVerifier(air, cfg).verify(proof)

    def test_mds_wide_trace_roundtrip(self):
        from stark_tpu.models.examples import MdsSquareAir, mds_square_trace

        air = MdsSquareAir()
        cfg = StarkConfig(trace_length=128, blowup=4, num_colinearity_tests=8)
        rows = mds_square_trace(128)
        proof = StarkProver(air, cfg).prove(rows)
        assert StarkVerifier(air, cfg).verify(proof)

    def test_mds_wide_trace_tamper_rejected(self):
        from stark_tpu.models.examples import MdsSquareAir, mds_square_trace

        air = MdsSquareAir()
        cfg = StarkConfig(trace_length=128, blowup=4, num_colinearity_tests=8)
        rows = mds_square_trace(128).copy()
        rows[31, 4] = (int(rows[31, 4]) + 1) % P
        proof = StarkProver(air, cfg).prove(rows)
        assert not StarkVerifier(air, cfg).verify(proof)

    @pytest.mark.slow
    def test_mds_wide_trace_large(self):
        """Flagship wide workload at scale: c=8 registers, T=2^14 — the
        multi-chunk row-hash absorption path at a realistic STARK shape."""
        from stark_tpu.models.examples import MdsSquareAir, mds_square_trace

        air = MdsSquareAir()
        cfg = StarkConfig(
            trace_length=1 << 14, blowup=4, num_colinearity_tests=16
        )
        rows = mds_square_trace(1 << 14)
        proof = StarkProver(air, cfg).prove(rows)
        assert StarkVerifier(air, cfg).verify(proof)


class TestVerifyBatch:
    """Amortized batch verification (round-3 item 8): one native path-
    authentication call across proofs, per-proof results exact."""

    def _proofs(self, n=4, T=64):
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=8)
        trace = fibonacci_trace_mod_p(T)
        prover = StarkProver(air, cfg)
        return air, cfg, [prover.prove(trace) for _ in range(n)]

    def test_honest_batch_all_accepted(self):
        air, cfg, proofs = self._proofs()
        v = StarkVerifier(air, cfg)
        assert v.verify_batch(proofs) == [True] * len(proofs)

    def test_mixed_batch_exact_per_proof_results(self):
        air, cfg, proofs = self._proofs()
        v = StarkVerifier(air, cfg)
        bad_struct = bytearray(proofs[1])
        bad_struct[5] ^= 0x55            # early corruption: structural reject
        bad_path = bytearray(proofs[2])
        bad_path[-10] ^= 0x40            # tail corruption: a path byte
        mixed = [proofs[0], bytes(bad_struct), bytes(bad_path), proofs[3]]
        got = v.verify_batch(mixed)
        want = [v.verify(p) for p in mixed]
        assert got == want
        assert got[0] and got[3] and not got[1] and not got[2]

    def test_verify_batch_matches_single_on_all_tampered(self):
        air, cfg, proofs = self._proofs(n=2)
        v = StarkVerifier(air, cfg)
        allbad = []
        for p in proofs:
            b = bytearray(p)
            b[len(b) // 2] ^= 1
            allbad.append(bytes(b))
        assert v.verify_batch(allbad) == [v.verify(p) for p in allbad]


class TestLastRowBoundary:
    def test_boundary_on_final_row(self):
        """Boundary constraints may pin ANY row, including the last one —
        the boundary zerofier x - w^row is independent of the transition
        enforcement range (which excludes trailing rows)."""
        from stark_tpu.models.air import Air, BoundaryConstraint
        from stark_tpu.models.fibonacci import fibonacci_trace_mod_p

        rows = fibonacci_trace_mod_p(64)
        last = rows[-1][0]

        class PinnedFibAir(Air):
            num_registers = 1
            frame_offsets = (0, 1, 2)
            constraint_degree = 1

            def transition_constraints(self, frame, ops):
                return [
                    ops.sub(frame[2][0], ops.add(frame[0][0], frame[1][0]))
                ]

            def boundary_constraints(self, trace_length):
                return [
                    BoundaryConstraint(row=0, register=0, value=1),
                    BoundaryConstraint(row=1, register=0, value=1),
                    BoundaryConstraint(
                        row=trace_length - 1, register=0, value=last
                    ),
                ]

        air = PinnedFibAir()
        cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=8)
        proof = StarkProver(air, cfg).prove(rows)
        assert StarkVerifier(air, cfg).verify(proof)
        # A trace whose final value differs must be rejected.
        bad = [list(r) for r in rows]
        bad[-1][0] = (bad[-1][0] + 1) % P
        # keep the recurrence intact up to the enforcement range by
        # breaking only the final (transition-excluded) row
        proof_bad = StarkProver(air, cfg).prove(bad)
        assert not StarkVerifier(air, cfg).verify(proof_bad)
