"""Batched prover: B proofs in one pipeline must be byte-identical to B
single-prover runs, and all must verify."""

import numpy as np

from stark_tpu import StarkConfig, StarkProver, StarkVerifier
from stark_tpu.batch import BatchStarkProver
from stark_tpu.models.fibonacci import FibonacciAir
from stark_tpu.ops.fieldops import P


def _traces(B: int, T: int):
    out = []
    rng = np.random.default_rng(4)
    for b in range(B):
        a, c = 1 + b, 1
        rows = []
        for _ in range(T):
            rows.append([a])
            a, c = c, (a + c) % P
        out.append(rows)
    return out


class VariantFibAir(FibonacciAir):
    """Fibonacci with per-trace initial value boundary left open except
    row 1 (so distinct traces all satisfy it)."""

    def boundary_constraints(self, trace_length: int):
        from stark_tpu.models.air import BoundaryConstraint

        return [BoundaryConstraint(row=1, register=0, value=1)]


def test_batch_matches_singles():
    # T=64 (N=256) keeps the wide row-major forest layout exercised
    # (B*N = 512 = 4 lane tiles) while sharing the single-prover graphs
    # with test_stark's T=64 configs (suite wall-time budget, VERDICT r2
    # item 3).  B*reduced < 256 pins the CLASSIC batch path; the mega
    # path has its own gate-pinned test below.
    B, T = 2, 64
    air = VariantFibAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=4)
    traces = _traces(B, T)
    batch = BatchStarkProver(air, cfg, B).prove_batch(traces)
    single = StarkProver(air, cfg)
    verifier = StarkVerifier(air, cfg)
    for b in range(B):
        assert batch[b] == single.prove(traces[b]), f"proof {b} differs"
        assert verifier.verify(batch[b])


def test_batch_mega_single_fetch_matches_singles():
    """Shapes chosen to pass the single-fetch mega gate (B*reduced >=
    2*128): the whole batch proves through _prove_batch_mega and must be
    byte-identical to single-prover runs."""
    from stark_tpu.batch import _BATCH_MEGA_CACHE

    B, T = 4, 64
    air = VariantFibAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    traces = _traces(B, T)
    before = len(_BATCH_MEGA_CACHE)
    batch = BatchStarkProver(air, cfg, B).prove_batch(traces)
    assert len(_BATCH_MEGA_CACHE) > before, "mega path not taken"
    single = StarkProver(air, cfg)
    verifier = StarkVerifier(air, cfg)
    for b in range(B):
        assert batch[b] == single.prove(traces[b]), f"proof {b} differs"
        assert verifier.verify(batch[b])


import pytest


@pytest.mark.slow
def test_batch_mega_wide_prelevels_match_singles(monkeypatch):
    """Force the batch mega's wide pre-level branch (B*N above the fuse
    cutover: unrolled forest levels feeding the tail loop, and the
    pre-level slots of _forest_path_gather) at CPU-suite shapes by
    shrinking FUSE_MAX_WIDTH.  On TPU this branch runs at B*N >= 2^17
    (the bench's B=8/T=2^14 takes it); bytes must equal single runs."""
    from stark_tpu.ops import hash_batch as HB

    monkeypatch.setattr(HB, "FUSE_MAX_WIDTH", 256)
    B, T = 4, 64  # B*N = 1024 > 256 -> 2 wide pre levels per forest
    air = VariantFibAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    traces = _traces(B, T)
    batch = BatchStarkProver(air, cfg, B).prove_batch(traces)
    single = StarkProver(air, cfg)
    for b in range(B):
        assert batch[b] == single.prove(traces[b]), f"proof {b} differs"


def test_prove_many_pipelined_matches_singles():
    """prove_many (depth-2 pipelined dispatch) over 6 traces with B=4:
    one full batch + one padded partial batch, in flight together.  Bytes
    must equal single-prover runs; pad proofs must be dropped.  Shapes
    shared with the mega test above (same compiled graphs)."""
    B, T, n = 4, 64, 6
    air = VariantFibAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    traces = _traces(n, T)
    bp = BatchStarkProver(air, cfg, B)
    assert bp._mega_ok()
    proofs = bp.prove_many(traces, depth=2)
    assert len(proofs) == n
    single = StarkProver(air, cfg)
    for b in range(n):
        assert proofs[b] == single.prove(traces[b]), f"proof {b} differs"


def test_prove_many_classic_fallback():
    """prove_many on shapes that fail the mega gate (B*reduced < 2 lane
    tiles) must fall back to sequential classic batches and still match
    single-prover bytes, including the padded remainder."""
    B, T, n = 2, 64, 3
    air = VariantFibAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=4)
    traces = _traces(n, T)
    bp = BatchStarkProver(air, cfg, B)
    assert not bp._mega_ok()
    proofs = bp.prove_many(traces)
    assert len(proofs) == n
    single = StarkProver(air, cfg)
    for b in range(n):
        assert proofs[b] == single.prove(traces[b]), f"proof {b} differs"


def test_tiny_batch_narrow_trees():
    """N = 64 < 128 lanes per proof: the forest must keep per-proof (B, w)
    layout (regression for the narrow-tree gather)."""
    B, T = 2, 16
    air = VariantFibAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=2)
    traces = _traces(B, T)
    batch = BatchStarkProver(air, cfg, B).prove_batch(traces)
    single = StarkProver(air, cfg)
    verifier = StarkVerifier(air, cfg)
    for b in range(B):
        assert batch[b] == single.prove(traces[b]), f"proof {b} differs"
        assert verifier.verify(batch[b])


def test_batch_sharded_matches_singles():
    """Batched x sharded composition: B proofs on the 8-device virtual
    mesh, domain axis sharded, byte-identical to single-device
    single-proof runs (VERDICT round 1, item 7)."""
    from stark_tpu.parallel.mesh import make_mesh

    B, T = 2, 128
    air = VariantFibAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=4)
    traces = _traces(B, T)
    mesh = make_mesh()
    batch = BatchStarkProver(air, cfg, B, mesh=mesh).prove_batch(traces)
    single = StarkProver(air, cfg)
    verifier = StarkVerifier(air, cfg)
    for b in range(B):
        assert batch[b] == single.prove(traces[b]), f"proof {b} differs"
        assert verifier.verify(batch[b])


def test_batch_mesh_mega_batch_sharded():
    """Round-4: D | B engages the single-fetch batch mega BATCH-SHARDED
    over the mesh (each device proves B/D proofs, zero cross-device
    communication until the packed fetch) — bytes identical to
    single-device single-proof runs."""
    from stark_tpu.batch import _BATCH_MEGA_CACHE
    from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
    from stark_tpu.parallel.mesh import make_mesh

    B, T = 8, 64
    air = FibonacciAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    traces = [fibonacci_trace_mod_p(T)] * B
    before = len(_BATCH_MEGA_CACHE)
    bp = BatchStarkProver(air, cfg, B, mesh=make_mesh())
    got = bp.prove_batch(traces)
    assert len(_BATCH_MEGA_CACHE) > before, "mega path not taken on mesh"
    want = StarkProver(air, cfg).prove(traces[0])
    assert all(g == want for g in got)

    # Pipelined serving on the mesh: two batch-sharded megas in flight
    # (12 = B + padded partial) must produce the same bytes.
    many = bp.prove_many(traces + traces[:4], depth=2)
    assert len(many) == 12 and all(m == want for m in many)


def test_batch_mixed_width_airs_same_shape():
    """Companion to test_models.test_mixed_width_airs_same_shape_both_orders
    (round-4 spec cache-key collision): two BatchStarkProvers with
    different trace widths but identical (T, blowup, k) in one process,
    BOTH orders, each byte-identical to single-prover runs.  batch.py's
    cache key carries (air qualname, c) so this pins that it stays so."""
    from stark_tpu.models.examples import (
        SquareAir,
        TwoRegisterFibonacciAir,
        square_trace,
        two_register_fibonacci_trace,
    )

    B, T = 4, 64
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=4)

    def run(air_cls, tracer):
        air = air_cls()
        traces = [tracer(T)] * B
        batch = BatchStarkProver(air, cfg, B).prove_batch(traces)
        single = StarkProver(air, cfg).prove(traces[0])
        for b in range(B):
            assert batch[b] == single
        # prove_many shares the same caches; must agree too.
        many = BatchStarkProver(air, cfg, B).prove_many(traces, depth=2)
        assert all(p == single for p in many)
        return batch[0]

    a_wide = run(TwoRegisterFibonacciAir, two_register_fibonacci_trace)
    a_narrow = run(SquareAir, square_trace)
    assert run(SquareAir, square_trace) == a_narrow
    assert run(TwoRegisterFibonacciAir, two_register_fibonacci_trace) == a_wide


def test_batch_device_cols_matches_rows():
    """Serving the flagship: prove_batch/prove_many accept device-resident
    (c, T) column witnesses (traces_cols) and must be byte-identical to
    the host-rows ingestion and to single-prover runs."""
    from stark_tpu.models.examples import (
        MdsSquareAir,
        mds_square_trace,
        mds_square_trace_cols_device,
    )

    B, T = 4, 64
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=4)
    air = MdsSquareAir()
    rows = mds_square_trace(T)
    cols = mds_square_trace_cols_device(T, block=16)

    single = StarkProver(air, cfg).prove(trace_cols=cols)
    bp = BatchStarkProver(air, cfg, B)
    via_cols = bp.prove_batch(traces_cols=[cols] * B)
    via_rows = bp.prove_batch([rows] * B)
    assert via_cols == via_rows
    assert all(p == single for p in via_cols)
    many = bp.prove_many(traces_cols=[cols] * (B + 2), depth=2)
    assert len(many) == B + 2 and all(p == single for p in many)
    assert StarkVerifier(air, cfg).verify(via_cols[0])
