"""AIR generality: multi-register and degree-2 constraint systems prove and
verify end-to-end, and cheating witnesses are rejected."""

import pytest

from stark_tpu import StarkConfig, StarkProver, StarkVerifier
from stark_tpu.models.examples import (
    SquareAir,
    TwoRegisterFibonacciAir,
    square_trace,
    two_register_fibonacci_trace,
)


@pytest.mark.parametrize(
    "air_cls,tracer",
    [
        (TwoRegisterFibonacciAir, two_register_fibonacci_trace),
        (SquareAir, square_trace),
    ],
)
def test_prove_verify_roundtrip(air_cls, tracer):
    cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4)
    air = air_cls()
    proof = StarkProver(air, cfg).prove(tracer(64))
    assert StarkVerifier(air, cfg).verify(proof)


def test_device_trace_generator_matches_host():
    """fibonacci_trace_cols_device == fibonacci_trace_mod_p (the witness
    never leaves the device in the large-config path; trace.rs:36-49
    contract preserved through the rank-2 block decomposition)."""
    import numpy as np

    from stark_tpu.models.fibonacci import (
        fibonacci_trace_cols_device,
        fibonacci_trace_mod_p,
    )

    for T in (1, 2, 3, 64, 1000, 4096):
        host = fibonacci_trace_mod_p(T)[:, 0]
        dev = np.asarray(fibonacci_trace_cols_device(T))[0]
        assert np.array_equal(host, dev), T


def test_device_trace_cols_prove_bytes_match_rows():
    from stark_tpu import StarkConfig, StarkProver
    from stark_tpu.models.fibonacci import (
        FibonacciAir,
        fibonacci_trace_cols_device,
        fibonacci_trace_mod_p,
    )

    cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4)
    air = FibonacciAir()
    a = StarkProver(air, cfg).prove(fibonacci_trace_mod_p(64))
    b = StarkProver(air, cfg).prove(trace_cols=fibonacci_trace_cols_device(64))
    assert a == b


def test_mds_device_trace_generator_matches_host():
    """mds_square_trace_cols_device == mds_square_trace.T for lengths on
    and off the block boundary (the block-seed upload + device re-expand
    must reproduce the host chain exactly)."""
    import numpy as np

    from stark_tpu.models.examples import (
        mds_square_trace,
        mds_square_trace_cols_device,
    )

    for T, block in ((1, 64), (63, 16), (64, 16), (65, 16), (512, 64)):
        host = mds_square_trace(T).T
        dev = np.asarray(mds_square_trace_cols_device(T, block=block))
        assert dev.shape == host.shape, (T, block)
        assert np.array_equal(host, dev), (T, block)


def test_mds_device_trace_cols_prove_bytes_match_rows():
    from stark_tpu import StarkConfig, StarkProver
    from stark_tpu.models.examples import (
        MdsSquareAir,
        mds_square_trace,
        mds_square_trace_cols_device,
    )

    cfg = StarkConfig(trace_length=128, blowup=4, num_colinearity_tests=4)
    air = MdsSquareAir()
    a = StarkProver(air, cfg).prove(mds_square_trace(128))
    b = StarkProver(air, cfg).prove(
        trace_cols=mds_square_trace_cols_device(128, block=32)
    )
    assert a == b


def test_cheating_witness_rejected():
    cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=8)
    air = TwoRegisterFibonacciAir()
    trace = two_register_fibonacci_trace(64)
    trace[13][1] = (trace[13][1] + 1) % 998244353
    proof = StarkProver(air, cfg).prove(trace)
    assert not StarkVerifier(air, cfg).verify(proof)


def test_wrong_boundary_rejected():
    cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=8)
    air = SquareAir()
    trace = square_trace(64)
    trace[0][0] = 5  # boundary says 3
    proof = StarkProver(air, cfg).prove(trace)
    assert not StarkVerifier(air, cfg).verify(proof)


def test_trace_out_of_bounds_matches_reference_option():
    """trace.rs:17-27: get_row/get return Option -> None OOB; negative
    indices are OOB (usize), not Python tail indexing."""
    from stark_tpu.models.trace import Trace

    t = Trace.fibonacci(4)
    assert t.get_row(4) is None
    assert t.get_row(-1) is None
    assert t.get(3, 0) == 3
    assert t.get(-1, 0) is None
    assert t.get(0, -1) is None
    assert t.get(0, 1) is None


def test_mixed_width_airs_same_shape_both_orders():
    """Regression (round-4): the mega-prove host unpack spec was cached
    without the trace width, so two AIRs with identical (N, blowup,
    frame_offsets, k) but different register counts collided — the second
    prover crashed in _unpack_u8.  Prove wide-then-narrow AND
    narrow-then-wide in one process; every proof must round-trip and be
    byte-identical to itself regardless of what proved before it."""
    cfg = StarkConfig(trace_length=64, blowup=4, num_colinearity_tests=4)

    def prove(air_cls, tracer):
        air = air_cls()
        proof = StarkProver(air, cfg).prove(tracer(64))
        assert StarkVerifier(air, cfg).verify(proof)
        return proof

    # Wide (c=2) first, then narrow (c=1): the original crash ordering.
    a_wide = prove(TwoRegisterFibonacciAir, two_register_fibonacci_trace)
    a_narrow = prove(SquareAir, square_trace)
    # Reverse order in the same process: caches are now warm for both
    # widths; bytes must match the first pass exactly.
    b_narrow = prove(SquareAir, square_trace)
    b_wide = prove(TwoRegisterFibonacciAir, two_register_fibonacci_trace)
    assert a_wide == b_wide
    assert a_narrow == b_narrow


def test_mds_device_trace_pure_device_fallback_matches_host():
    """The no-native-engine path (pure-device seed scan,
    _mds_device_trace_fn) must produce the same columns as the host walk
    — it is the fallback when the C engine can't build."""
    import numpy as np

    from stark_tpu.models.examples import (
        _MDS_W,
        _mds_device_trace_fn,
        mds_square_trace,
    )
    import jax.numpy as jnp

    for T, block in ((64, 16), (65, 16), (96, 32)):
        nb = (T + block - 1) // block
        s0 = jnp.asarray(np.arange(1, _MDS_W + 1, dtype=np.uint32))
        dev = np.asarray(_mds_device_trace_fn(block, nb)(s0)[:, :T])
        assert np.array_equal(mds_square_trace(T).T, dev), (T, block)
