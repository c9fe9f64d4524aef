"""Fused multi-stage Pallas NTT (ops/ntt_fused.py) vs the Stockham oracle.

The Pallas kernels run here in interpreter mode (tests force the CPU
backend); real-chip equality at 2^22 is exercised by bench.py on TPU.
Oracle: ops/ntt.py's _ntt_jit/_intt_jit (themselves pinned against the
scalar reference contract in test_ntt.py).
"""

import numpy as np
import pytest

from stark_tpu.ops import ntt as NTT
from stark_tpu.ops.fieldops import P
from stark_tpu.ops.ntt_fused import _MIN_FUSED, fused_available, fused_ntt

RNG = np.random.default_rng(7)


def _rand(n):
    return RNG.integers(0, P, size=n, dtype=np.uint32)


@pytest.mark.parametrize("n", [1 << 16, 1 << 17])
def test_fused_matches_stockham_forward(n):
    # 2^16 exercises the square split (n1 == n2); 2^17 the asymmetric one.
    x = _rand(n)
    ref = np.asarray(NTT._ntt_jit(x, n))
    got = np.asarray(fused_ntt(x, interpret=True))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("n", [1 << 16])
def test_fused_matches_stockham_inverse(n):
    x = _rand(n)
    ref = np.asarray(NTT._intt_jit(x, n))
    got = np.asarray(fused_ntt(x, inverse=True, interpret=True))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("inverse", [False, True])
def test_lazy_butterflies_bit_identical(inverse):
    # Harvey [0, 2p)-range butterflies must produce byte-identical output
    # to the strict kernels (the final reductions restore [0, p)).
    n = 1 << 16
    x = _rand(n)
    strict = np.asarray(
        fused_ntt(x, inverse=inverse, interpret=True, lazy=False)
    )
    lazy = np.asarray(fused_ntt(x, inverse=inverse, interpret=True, lazy=True))
    assert np.array_equal(strict, lazy)
    assert lazy.max() < P


def test_lazy_butterflies_extreme_values():
    # Stress the [0, 2p) range analysis: inputs at the top of the field
    # (p-1 everywhere) plus a spike pattern maximizes the lazy residues.
    n = 1 << 16
    for x in (
        np.full(n, P - 1, dtype=np.uint32),
        np.where(np.arange(n) % 2 == 0, P - 1, 0).astype(np.uint32),
    ):
        ref = np.asarray(NTT._ntt_jit(x, n))
        got = np.asarray(fused_ntt(x, interpret=True, lazy=True))
        assert np.array_equal(ref, got)


def test_fused_roundtrip():
    n = 1 << 16
    x = _rand(n)
    back = np.asarray(
        fused_ntt(fused_ntt(x, interpret=True), inverse=True, interpret=True)
    )
    assert np.array_equal(back, x)


def test_dispatch_gating():
    # CPU backend in tests: the fused path must never be selected by the
    # public ntt()/intt() entry points here.
    assert not fused_available(_MIN_FUSED, (_MIN_FUSED,))
    # Batched and small shapes are always Stockham regardless of backend.
    assert not fused_available(_MIN_FUSED, (2, _MIN_FUSED))
    assert not fused_available(1 << 10, (1 << 10,))
