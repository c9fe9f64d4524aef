"""NTT unit tests: contract equality vs the reference's dense-polynomial
semantics (eval_domain / interpolate_domain on smooth coset domains) and
algebraic round-trips at multiple sizes."""

import numpy as np

from stark_tpu.ops import fieldops as F
from stark_tpu.ops import ntt
from stark_tpu.ops.fieldops import P, primitive_nth_root

RNG = np.random.default_rng(42)


def rand_poly(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)


def omega_domain(n, offset=1):
    w = primitive_nth_root(n)
    return [(offset * pow(w, i, P)) % P for i in range(n)]


class TestNTT:
    def test_ntt_matches_naive_eval(self):
        for n in [1, 2, 4, 8, 32, 256]:
            c = rand_poly(n)
            got = np.asarray(ntt.ntt(c))
            want = ntt.naive_eval_domain(c, omega_domain(n))
            np.testing.assert_array_equal(got, want, err_msg=f"n={n}")

    def test_intt_roundtrip(self):
        for n in [1, 2, 16, 1024, 4096]:
            c = rand_poly(n)
            np.testing.assert_array_equal(np.asarray(ntt.intt(ntt.ntt(c))), c)
            np.testing.assert_array_equal(np.asarray(ntt.ntt(ntt.intt(c))), c)

    def test_coset_eval_matches_eval_domain(self):
        # Contract: univariate/eval.rs:16-21 on {offset * omega^i}.
        for n, off in [(8, 3), (32, 7), (128, 13), (256, 17)]:
            c = rand_poly(n)
            got = np.asarray(ntt.coset_eval(c, off))
            want = ntt.naive_eval_domain(c, omega_domain(n, off))
            np.testing.assert_array_equal(got, want)

    def test_coset_interp_matches_interpolate_domain(self):
        # Contract: univariate/interpolate.rs:6-44 — interpolation recovers
        # the unique degree < n polynomial through the points.
        for n, off in [(8, 3), (64, 7)]:
            c = rand_poly(n)
            vals = ntt.naive_eval_domain(c, omega_domain(n, off))
            got = np.asarray(ntt.coset_interp(vals, off))
            np.testing.assert_array_equal(got, c)

    def test_lde(self):
        n, blowup, off = 16, 4, 5
        c = rand_poly(n)
        got = np.asarray(ntt.lde(c, blowup, off))
        want = ntt.naive_eval_domain(c, omega_domain(n * blowup, off))
        np.testing.assert_array_equal(got, want)

    def test_batched(self):
        n, batch = 64, 5
        c = np.stack([rand_poly(n) for _ in range(batch)])
        got = np.asarray(ntt.ntt(c))
        for b in range(batch):
            np.testing.assert_array_equal(
                got[b], ntt.naive_eval_domain(c[b], omega_domain(n))
            )

    def test_poly_mul_via_ntt(self):
        # NTT-based multiply equals schoolbook (mul.rs:6-29 contract).
        a = rand_poly(5)
        b = rand_poly(4)
        n = 8
        fa = ntt.ntt(np.pad(a, (0, n - len(a))))
        fb = ntt.ntt(np.pad(b, (0, n - len(b))))
        got = np.asarray(ntt.intt(F.mulmod(fa, fb)))[: len(a) + len(b) - 1]
        want = np.zeros(len(a) + len(b) - 1, dtype=np.uint64)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                want[i + j] = (want[i + j] + int(ai) * int(bj)) % P
        np.testing.assert_array_equal(got, want.astype(np.uint32))

    def test_large_size_smoke(self):
        n = 1 << 16
        c = rand_poly(n)
        back = np.asarray(ntt.intt(ntt.ntt(c)))
        np.testing.assert_array_equal(back, c)


def test_host_engine_matches_device():
    rng = np.random.default_rng(77)
    x = rng.integers(0, P, size=128, dtype=np.uint32)
    from stark_tpu.ops.ntt import (
        coset_eval,
        coset_interp,
        host_coset_eval,
        host_coset_interp,
    )

    assert np.array_equal(host_coset_eval(x, 3), np.asarray(coset_eval(x, 3)))
    ev = host_coset_eval(x, 3)
    assert np.array_equal(
        host_coset_interp(ev, 3), np.asarray(coset_interp(ev, 3))
    )
    assert np.array_equal(host_coset_interp(ev, 3), x)
