"""Field-kernel unit tests: algebraic laws + edge cases vs exact-int oracles.

Mirrors the reference's field test pyramid (src/ff.rs:283-791): construction
and equality, each op including modular wrap-around, algebraic laws, inverse
round-trips, exponentiation edges, generator/root-of-unity order checks, and
sample determinism/sensitivity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stark_tpu.field import FieldElement, FiniteField
from stark_tpu.ops import fieldops as F
from stark_tpu.ops.fieldops import P

RNG = np.random.default_rng(0)


def rand_u32(n, lo=0, hi=P):
    return RNG.integers(lo, hi, size=n, dtype=np.uint64).astype(np.uint32)


EDGE = np.array([0, 1, 2, 3, P - 1, P - 2, P // 2, 1 << 23, 119], dtype=np.uint32)


def pairs():
    a = np.concatenate([EDGE.repeat(len(EDGE)), rand_u32(4096)])
    b = np.concatenate([np.tile(EDGE, len(EDGE)), rand_u32(4096)])
    return a, b


class TestVectorOps:
    def test_mulhi32(self):
        a = np.concatenate([EDGE, rand_u32(4096, 0, 1 << 32)])
        b = np.concatenate([EDGE[::-1], rand_u32(4096, 0, 1 << 32)])
        got = np.asarray(F.mulhi32(jnp.asarray(a), jnp.asarray(b)))
        want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_addmod_submod_negmod(self):
        a, b = pairs()
        np.testing.assert_array_equal(
            np.asarray(F.addmod(jnp.asarray(a), jnp.asarray(b))),
            ((a.astype(np.uint64) + b) % P).astype(np.uint32),
        )
        np.testing.assert_array_equal(
            np.asarray(F.submod(jnp.asarray(a), jnp.asarray(b))),
            ((P + a.astype(np.int64) - b) % P).astype(np.uint32),
        )
        np.testing.assert_array_equal(
            np.asarray(F.negmod(jnp.asarray(a))),
            ((P - a.astype(np.uint64)) % P).astype(np.uint32),
        )

    def test_mont_mul_roundtrip_and_mulmod(self):
        a, b = pairs()
        got = np.asarray(F.mulmod(jnp.asarray(a), jnp.asarray(b)))
        want = ((a.astype(np.uint64) * b.astype(np.uint64)) % P).astype(np.uint32)
        np.testing.assert_array_equal(got, want)
        # to_mont/from_mont round-trip
        am = F.to_mont(jnp.asarray(a))
        np.testing.assert_array_equal(np.asarray(F.from_mont(am)), a)

    def test_shoup_mul(self):
        a = np.concatenate([EDGE, rand_u32(4096, 0, 1 << 32)])  # any u32
        for w in [0, 1, 3, P - 1, 123456789, F.R1]:
            ws = int(F.shoup_precompute(w))
            got = np.asarray(
                F.shoup_mul(jnp.asarray(a), jnp.uint32(w), jnp.uint32(ws))
            )
            want = ((a.astype(np.uint64) * w) % P).astype(np.uint32)
            np.testing.assert_array_equal(got, want)

    def test_powmod_and_invmod(self):
        a = np.concatenate([EDGE, rand_u32(512)])
        for e in [0, 1, 2, 3, 7, P - 1, P - 2, (1 << 23)]:
            got = np.asarray(F.powmod(jnp.asarray(a), e))
            want = np.array([pow(int(x), e, P) for x in a], dtype=np.uint32)
            np.testing.assert_array_equal(got, want)
        nz = a[a % P != 0]
        inv = np.asarray(F.invmod(jnp.asarray(nz)))
        np.testing.assert_array_equal(
            ((nz.astype(np.uint64) * inv) % P).astype(np.uint32),
            np.ones_like(nz) % P,
        )

    def test_powers(self):
        got = np.asarray(F.powers(3, 100, scale=7))
        want = np.array([(7 * pow(3, i, P)) % P for i in range(100)], np.uint32)
        np.testing.assert_array_equal(got, want)


class TestScalarField:
    """Contract tests for the host FiniteField/FieldElement (ff.rs surface)."""

    f = FiniteField()

    def test_unreduced_new_element_and_raw_equality(self):
        # ff.rs:113-118 — new_element does not reduce; ff.rs:50-58 — equality
        # compares raw values.
        big = self.f.new_element(P + 5)
        assert big.value == P + 5
        assert big != self.f.new_element(5)
        # arithmetic still reduces per-op
        assert (big * self.f.one()).value == 5

    def test_ops_wraparound(self):
        a = self.f.new_element(P - 1)
        b = self.f.new_element(2)
        assert (a + b).value == 1
        assert (b - a).value == 3
        assert (a * a).value == pow(P - 1, 2, P)
        assert (-a).value == 1

    def test_inverse_roundtrip_and_div(self):
        for v in [1, 2, 3, P - 1, 12345, P + 7]:
            e = self.f.new_element(v)
            assert (e * self.f.inv(e)).value == 1
            assert self.f.div(self.f.new_element(10), e).value == (
                10 * pow(v, P - 2, P)
            ) % P

    def test_inv_zero_panics(self):
        with pytest.raises(AssertionError):
            self.f.inv(self.f.zero())
        with pytest.raises(AssertionError):
            self.f.div(self.f.one(), self.f.zero())

    def test_exp_edges(self):
        assert self.f.exp(self.f.zero(), 0).value == 1  # ff.rs quirk
        assert self.f.exp(self.f.zero(), 5).value == 0
        assert self.f.exp(self.f.new_element(3), P - 1).value == 1
        assert (self.f.new_element(2) ^ 10).value == 1024

    def test_generator_and_roots_of_unity(self):
        g = self.f.g()
        assert g.value == 3
        for logn in [1, 2, 5, 10, 23]:
            n = 1 << logn
            w = self.f.prim_nth_root(n)
            assert self.f.exp(w, n).value == 1
            assert self.f.exp(w, n // 2).value != 1  # primitive
        with pytest.raises(AssertionError):
            self.f.prim_nth_root(3)
        with pytest.raises(AssertionError):
            self.f.prim_nth_root(1 << 24)

    def test_sample(self):
        # ff.rs:225-232 contract, determinism + sensitivity
        s1 = self.f.sample(b"hello")
        s2 = self.f.sample(b"hello")
        s3 = self.f.sample(b"hallo")
        assert s1 == s2 and s1 != s3
        acc = 0
        for b in b"hello":
            acc = ((acc << 8) % P ^ b) % P
        assert s1.value == acc

    def test_algebraic_laws(self):
        f = self.f
        xs = [f.new_element(v) for v in [0, 1, 7, P - 3, 998, P + 11]]
        for a in xs:
            for b in xs:
                assert (a + b).value == (b + a).value
                assert (a * b).value == (b * a).value
                for c in xs:
                    assert ((a + b) + c).value == (a + (b + c)).value
                    assert (a * (b + c)).value == (a * b + a * c).value


def test_invmod_zero_is_zero_documented_divergence():
    """invmod(0) = 0 (Fermat ladder) where the reference panics
    (ff.rs:169-178) — pinned as the PARITY.md-documented divergence; the
    scalar surface keeps the reference's raise."""
    import jax.numpy as jnp
    import numpy as np

    from stark_tpu.field import FiniteField
    from stark_tpu.ops import fieldops as F

    assert int(np.asarray(F.invmod(jnp.asarray([0], jnp.uint32)))[0]) == 0
    with pytest.raises(Exception):
        FiniteField().inv(FiniteField().new_element(0))
