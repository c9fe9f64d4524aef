"""Fault-injection tests for the device/host transcript-integrity ties.

The single-fetch provers trust the device to compute Fiat-Shamir
challenges; the host REPLAYS the transcript byte-exactly from the fetched
roots and raises RuntimeError on any divergence (fri._prove_chained,
stark._prefix_replay, batch._prove_batch_mega).  These raises are
load-bearing — they are what makes the device-chained transcript
trustworthy (SURVEY §5 race-detection analogue) — so each one is pinned
here by corrupting one fetched device value and asserting the tie fires.

Injection point: stark_tpu.fri._unpack_u8 (the single host-side decode of
the packed device fetch) — corrupting its output is indistinguishable from
the device having computed a wrong challenge/digest.
"""

import numpy as np
import pytest

import stark_tpu.fri as fri_mod
from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
from stark_tpu.stark import StarkConfig, StarkProver


def _corrupting_unpack(monkeypatch, mutate):
    """Wrap fri._unpack_u8 so the FIRST call's output is mutated."""
    real = fri_mod._unpack_u8
    state = {"done": False}

    def wrapper(buf, spec):
        out = real(buf, spec)
        if not state["done"]:
            state["done"] = True
            mutate(out)
        return out

    monkeypatch.setattr(fri_mod, "_unpack_u8", wrapper)


class TestIntegrityTies:
    def test_fri_round_alpha_divergence_raises(self, monkeypatch):
        """Corrupt one device FRI round challenge -> fri._prove_chained's
        replay check raises (fri.py 'device/host transcript divergence')."""
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4)
        trace = fibonacci_trace_mod_p(64)
        prover = StarkProver(air, cfg)
        prover.prove(trace)  # warm: compiles + proves honestly

        def mutate(out):
            # out = [extras, roots, alphas, last, idx, count, q, extra]
            out[2][0] = np.uint32(int(out[2][0]) ^ 1)

        _corrupting_unpack(monkeypatch, mutate)
        with pytest.raises(RuntimeError, match="transcript divergence"):
            prover.prove(trace)

    def test_stark_constraint_challenge_divergence_raises(self, monkeypatch):
        """Corrupt one device constraint-challenge digest byte ->
        stark._prefix_replay raises.  Needs the upstream device chain
        (full-device trace tree: N >= 1024)."""
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=256, blowup=4, num_colinearity_tests=4)
        trace = fibonacci_trace_mod_p(256)
        prover = StarkProver(air, cfg)
        prover.prove(trace)

        def mutate(out):
            # out[0] = extras = [trace_root (32,) u8, digs (2n, 8) u8]
            digs = out[0][1].copy()
            digs[0, 0] ^= 1
            out[0][1] = digs

        _corrupting_unpack(monkeypatch, mutate)
        with pytest.raises(
            RuntimeError, match="divergence \\(constraint challenges\\)"
        ):
            prover.prove(trace)

    def test_batch_round_alpha_divergence_raises(self, monkeypatch):
        """Corrupt one device per-proof FRI alpha -> the batch mega replay
        raises (batch.py round-alpha tie)."""
        from stark_tpu.batch import BatchStarkProver

        # B*reduced >= 256 engages the batch MEGA path (batch.prove_batch
        # gate); rounds=2 at k=16.
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=16)
        traces = [fibonacci_trace_mod_p(64)] * 4
        bp = BatchStarkProver(air, cfg, 4)
        bp.prove_batch(traces)

        def mutate(out):
            # out = (troots, digs, roots, alphas, last, idx, count, q, ...)
            a0 = out[3][0].copy()
            a0[0] ^= 1
            out[3][0] = a0

        _corrupting_unpack(monkeypatch, mutate)
        with pytest.raises(RuntimeError, match="transcript divergence"):
            bp.prove_batch(traces)

    def test_batch_constraint_digest_divergence_raises(self, monkeypatch):
        """Corrupt one device constraint-challenge digest in the batch
        fetch -> the per-proof replay raises."""
        from stark_tpu.batch import BatchStarkProver

        # B*reduced >= 256 engages the batch MEGA path (batch.prove_batch
        # gate); rounds=2 at k=16.
        air = FibonacciAir()
        cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=16)
        traces = [fibonacci_trace_mod_p(64)] * 4
        bp = BatchStarkProver(air, cfg, 4)
        bp.prove_batch(traces)

        def mutate(out):
            digs = out[1].copy()
            digs[1, 0, 0] ^= 1
            out[1] = digs

        _corrupting_unpack(monkeypatch, mutate)
        with pytest.raises(
            RuntimeError, match="divergence \\(constraint challenges\\)"
        ):
            bp.prove_batch(traces)
