"""Polynomial layer test pyramid, mirroring the reference's ~90 inline
univariate tests (add.rs:129-157, sub.rs:124-151, mul.rs:121-195,
div.rs:205-226, exp.rs:141-149, eval.rs, interpolate.rs:60-163,
mod.rs:196-638) against stark_tpu.poly.Polynomial, plus adversarial
cross-checks against the independent oracle transliteration.
"""

import numpy as np
import pytest

import ref_oracle as R

from stark_tpu.field import FiniteField
from stark_tpu.ops.fieldops import P
from stark_tpu.poly import Polynomial, _NTT_MUL_CROSSOVER

FIELD = FiniteField()
RNG = np.random.default_rng(7)


def rand_poly(n):
    return Polynomial(RNG.integers(0, P, size=n, dtype=np.uint64).tolist(), FIELD)


def to_oracle(poly):
    f = R.FiniteField()
    return R.Polynomial([f.new_element(c % P) for c in poly.coeffs], f)


def from_oracle(op):
    return [c.value for c in op.coeffs]


# -- structure (mod.rs:54-68, 196-302) --------------------------------------


class TestStructure:
    def test_deg_zero_poly(self):
        assert Polynomial([], FIELD).deg() == -1
        assert Polynomial([0, 0, 0], FIELD).deg() == -1
        assert Polynomial([P, 2 * P], FIELD).deg() == -1  # unreduced zeros

    def test_deg_trailing_zeros(self):
        assert Polynomial([1, 2, 0, 0], FIELD).deg() == 1
        assert Polynomial([0, 0, 5], FIELD).deg() == 2

    def test_eq_normalizes_trailing_zeros(self):
        assert Polynomial([1, 2], FIELD) == Polynomial([1, 2, 0, 0], FIELD)
        assert Polynomial([], FIELD) == Polynomial([0, 0], FIELD)
        assert Polynomial([1, 2], FIELD) != Polynomial([1, 3], FIELD)
        assert Polynomial([1], FIELD) != Polynomial([1, 1], FIELD)

    def test_eq_compares_mod_p(self):
        assert Polynomial([P + 1, 2], FIELD) == Polynomial([1, 2], FIELD)

    def test_is_zero(self):
        assert Polynomial([], FIELD).is_zero()
        assert Polynomial([0], FIELD).is_zero()
        assert not Polynomial([1], FIELD).is_zero()

    def test_leading_coeff(self):
        assert Polynomial([1, 2, 3], FIELD).leading_coeff() == 3
        assert Polynomial([7, 5, 0], FIELD).leading_coeff() == 5

    def test_leading_coeff_zero_poly_raises(self):
        # mod.rs:126-131 panics.
        with pytest.raises(AssertionError):
            Polynomial([], FIELD).leading_coeff()

    def test_constructors(self):
        assert Polynomial.zero_poly(FIELD).deg() == -1
        assert Polynomial.constant_poly(FIELD, 5).coeffs == [5]
        assert Polynomial.linear_poly(FIELD, 3, 4).coeffs == [3, 4]


# -- add / sub / neg (add.rs, sub.rs, mod.rs:70-75) -------------------------


class TestAddSub:
    def test_add_commutative(self):
        a, b = rand_poly(9), rand_poly(5)
        assert a + b == b + a

    def test_add_associative(self):
        a, b, c = rand_poly(4), rand_poly(7), rand_poly(3)
        assert (a + b) + c == a + (b + c)

    def test_add_identity(self):
        a = rand_poly(6)
        assert a + Polynomial([], FIELD) == a
        assert Polynomial([], FIELD) + a == a

    def test_add_different_lengths_pads(self):
        a = Polynomial([1, 2, 3], FIELD)
        b = Polynomial([10], FIELD)
        assert (a + b).coeffs == [11, 2, 3]

    def test_add_wraps_mod_p(self):
        a = Polynomial([P - 1], FIELD)
        b = Polynomial([2], FIELD)
        assert (a + b).coeffs == [1]

    def test_sub_anticommutative(self):
        a, b = rand_poly(8), rand_poly(8)
        assert a - b == -(b - a)

    def test_sub_self_is_zero(self):
        a = rand_poly(10)
        assert (a - a).is_zero()

    def test_neg_is_add_inverse(self):
        a = rand_poly(12)
        assert (a + (-a)).is_zero()

    def test_add_matches_oracle(self):
        a, b = rand_poly(6), rand_poly(9)
        got = (a + b).coeffs
        want = from_oracle(R.Polynomial.add(to_oracle(a), to_oracle(b)))
        assert got == want

    def test_sub_matches_oracle(self):
        a, b = rand_poly(9), rand_poly(6)
        got = (a - b).coeffs
        want = from_oracle(R.Polynomial.sub(to_oracle(a), to_oracle(b)))
        assert got == want


# -- mul (mul.rs:6-29, 121-195) ---------------------------------------------


class TestMul:
    def test_mul_commutative(self):
        a, b = rand_poly(5), rand_poly(9)
        assert a * b == b * a

    def test_mul_associative(self):
        a, b, c = rand_poly(3), rand_poly(4), rand_poly(5)
        assert (a * b) * c == a * (b * c)

    def test_mul_distributes_over_add(self):
        a, b, c = rand_poly(4), rand_poly(6), rand_poly(5)
        assert a * (b + c) == a * b + a * c

    def test_mul_zero_annihilates(self):
        a = rand_poly(7)
        assert (a * Polynomial([], FIELD)).is_zero()
        assert (Polynomial([0], FIELD) * a).is_zero()

    def test_mul_identity(self):
        a = rand_poly(7)
        assert a * Polynomial([1], FIELD) == a

    def test_mul_degrees_add(self):
        a, b = rand_poly(5), rand_poly(9)
        if a.deg() >= 0 and b.deg() >= 0:
            assert (a * b).deg() == a.deg() + b.deg()

    def test_mul_result_length(self):
        # mul.rs:14 — result length l + r - 1
        a, b = Polynomial([1, 2, 3], FIELD), Polynomial([4, 5], FIELD)
        assert len((a * b).coeffs) == 4

    def test_mul_sparse_skips_zero_coeffs(self):
        # mul.rs:17-19: zero lhs coefficients skipped — same product
        a = Polynomial([0, 1, 0, 0, 2], FIELD)
        b = Polynomial([3, 0, 4], FIELD)
        want = from_oracle(R.Polynomial.mul(to_oracle(a), to_oracle(b)))
        assert (a * b).coeffs == want

    def test_mul_overflow_values(self):
        a = Polynomial([P - 1, P - 2], FIELD)
        b = Polynomial([P - 3], FIELD)
        want = from_oracle(R.Polynomial.mul(to_oracle(a), to_oracle(b)))
        assert (a * b).coeffs == want

    @pytest.mark.parametrize(
        "la,lb",
        [
            (_NTT_MUL_CROSSOVER - 1, _NTT_MUL_CROSSOVER - 1),  # schoolbook
            (_NTT_MUL_CROSSOVER, _NTT_MUL_CROSSOVER),          # NTT path
            (_NTT_MUL_CROSSOVER + 1, _NTT_MUL_CROSSOVER - 1),  # mixed
            (_NTT_MUL_CROSSOVER + 37, _NTT_MUL_CROSSOVER + 3), # NTT, odd sizes
        ],
    )
    def test_mul_crossover_boundary_matches_oracle(self, la, lb):
        """The schoolbook<->NTT crossover must be invisible (VERDICT item 4:
        both sides of the boundary)."""
        a, b = rand_poly(la), rand_poly(lb)
        want = from_oracle(R.Polynomial.mul(to_oracle(a), to_oracle(b)))
        assert (a * b).coeffs == want


# -- div (div.rs:6-69, 205-226) ---------------------------------------------


class TestDiv:
    def test_reconstruction(self):
        # div.rs:205-226 — q*d + r == n
        n, d = rand_poly(12), rand_poly(5)
        q, r = divmod(n, d)
        assert q * d + r == n
        assert r.deg() < d.deg()

    def test_exact_division(self):
        a, b = rand_poly(6), rand_poly(4)
        prod = a * b
        assert prod.intdiv(b) == a
        assert prod / b == a
        assert (prod % b).is_zero()

    def test_numer_smaller_than_denom(self):
        n, d = rand_poly(3), rand_poly(6)
        q, r = divmod(n, d)
        assert q.is_zero()
        assert r == n

    def test_divide_by_self(self):
        a = rand_poly(5)
        q, r = divmod(a, a)
        assert q == Polynomial([1], FIELD)
        assert r.is_zero()

    def test_division_by_zero_raises(self):
        # div.rs:8 panics.
        with pytest.raises(AssertionError):
            divmod(rand_poly(4), Polynomial([], FIELD))

    def test_intdiv_nonzero_remainder_raises(self):
        # div.rs:43-47 asserts zero remainder.
        n = Polynomial([1, 0, 1], FIELD)
        d = Polynomial([1, 1], FIELD)
        with pytest.raises(AssertionError):
            n.intdiv(d)

    def test_div_matches_oracle(self):
        n, d = rand_poly(9), rand_poly(4)
        oq, orem = R.Polynomial.div(to_oracle(n), to_oracle(d))
        q, r = divmod(n, d)
        assert q == Polynomial(from_oracle(oq), FIELD)
        assert r == Polynomial(from_oracle(orem), FIELD)


# -- exp (exp.rs:6-42, 141-149) ---------------------------------------------


class TestExp:
    def test_exp_vs_repeated_mul(self):
        a = rand_poly(3)
        manual = Polynomial([1], FIELD)
        for e in range(6):
            assert a.exp(e) == manual
            assert (a ^ e) == manual
            manual = manual * a

    def test_exp_zero_exponent_is_one(self):
        assert rand_poly(5).exp(0) == Polynomial([1], FIELD)
        # exp.rs:7-12: 0^0 = 1 even for the zero polynomial
        assert Polynomial([], FIELD).exp(0) == Polynomial([1], FIELD)

    def test_exp_of_zero_poly(self):
        assert Polynomial([], FIELD).exp(3).is_zero()

    def test_exp_matches_oracle(self):
        a = rand_poly(4)
        for e in (1, 2, 5):
            want = from_oracle(R.Polynomial.exp(to_oracle(a), e))
            assert a.exp(e) == Polynomial(want, FIELD)


# -- eval (eval.rs) ----------------------------------------------------------


class TestEval:
    def test_eval_constant(self):
        assert Polynomial([42], FIELD).eval(999) == 42

    def test_eval_linear(self):
        # f(x) = 3x + 5
        f = Polynomial([5, 3], FIELD)
        assert f.eval(10) == 35
        assert f.eval(0) == 5

    def test_eval_zero_poly(self):
        assert Polynomial([], FIELD).eval(7) == 0

    def test_eval_domain_matches_oracle(self):
        a = rand_poly(8)
        of = R.FiniteField()
        domain = [3, 14, 159, P - 1, 0]
        want = [
            e.value
            for e in to_oracle(a).eval_domain([of.new_element(x) for x in domain])
        ]
        assert a.eval_domain(domain) == want

    def test_eval_accepts_field_elements(self):
        a = rand_poly(5)
        assert a.eval(FIELD.new_element(17)) == a.eval(17)


# -- interpolate (interpolate.rs:6-44, 60-163) -------------------------------


class TestInterpolate:
    def test_values_match(self):
        xs = [1, 2, 5, 7]
        ys = [3, 1, 4, 1]
        f = Polynomial.interpolate_domain(xs, ys, FIELD)
        assert [f.eval(x) for x in xs] == ys
        assert f.deg() <= 3

    def test_exact_coefficients_linear(self):
        # through (0,5), (1,8) -> 3x + 5
        f = Polynomial.interpolate_domain([0, 1], [5, 8], FIELD)
        assert f == Polynomial([5, 3], FIELD)

    def test_exact_coefficients_quadratic(self):
        # x^2 at 0,1,2 -> [0, 0, 1]
        f = Polynomial.interpolate_domain([0, 1, 2], [0, 1, 4], FIELD)
        assert f == Polynomial([0, 0, 1], FIELD)

    def test_single_point(self):
        f = Polynomial.interpolate_domain([9], [13], FIELD)
        assert f == Polynomial([13], FIELD)

    def test_duplicate_x_raises(self):
        # interpolate.rs would field.inv(0) -> panic "no inverse"
        with pytest.raises(AssertionError):
            Polynomial.interpolate_domain([1, 1], [2, 3], FIELD)

    def test_matches_oracle_random(self):
        n = 9
        xs = RNG.permutation(np.arange(1, 100))[:n].tolist()
        ys = RNG.integers(0, P, size=n, dtype=np.uint64).tolist()
        f = R.FiniteField()
        op = R.Polynomial.interpolate_domain(
            [f.new_element(int(x)) for x in xs],
            [f.new_element(int(y)) for y in ys],
        )
        got = Polynomial.interpolate_domain(xs, ys, FIELD)
        assert got == Polynomial(from_oracle(op), FIELD)

    def test_roundtrip_with_eval(self):
        a = rand_poly(6)
        xs = list(range(2, 8))
        ys = a.eval_domain(xs)
        assert Polynomial.interpolate_domain(xs, ys, FIELD) == a


# -- zerofier / scale / colinearity (mod.rs:77-113, 145-152, 319-638) --------


class TestZerofierScaleColinearity:
    def test_zerofier_roots(self):
        domain = [2, 3, 5, 8]
        z = Polynomial.zerofier(domain, FIELD)
        assert z.deg() == len(domain)
        assert all(z.eval(x) == 0 for x in domain)
        assert z.eval(7) != 0
        assert z.leading_coeff() == 1

    def test_zerofier_matches_oracle(self):
        domain = [11, 22, 33]
        f = R.FiniteField()
        oz = R.Polynomial.zerofier([f.new_element(d) for d in domain])
        assert Polynomial.zerofier(domain, FIELD) == Polynomial(
            from_oracle(oz), FIELD
        )

    def test_scale_is_f_of_cx(self):
        # mod.rs:458-488 — scale(c).eval(x) == f.eval(c*x)
        a = rand_poly(7)
        c = 12345
        scaled = a.scale(c)
        for x in (0, 1, 5, 99):
            assert scaled.eval(x) == a.eval((c * x) % P)

    def test_scale_matches_oracle(self):
        a = rand_poly(5)
        f = R.FiniteField()
        want = from_oracle(to_oracle(a).scale(f.new_element(77)))
        assert a.scale(77) == Polynomial(want, FIELD)

    def test_colinearity_true(self):
        # y = 3x + 5
        pts = [(1, 8), (2, 11), (4, 17)]
        assert Polynomial.test_colinearity(pts, FIELD)

    def test_colinearity_false(self):
        pts = [(1, 8), (2, 11), (4, 18)]
        assert not Polynomial.test_colinearity(pts, FIELD)

    def test_colinearity_two_points_always_true(self):
        assert Polynomial.test_colinearity([(1, 5), (9, 2)], FIELD)

    def test_colinearity_vertical_line_raises(self):
        # mod.rs:562-638 — duplicate x panics inside interpolation
        with pytest.raises(AssertionError):
            Polynomial.test_colinearity([(1, 5), (1, 9)], FIELD)

    def test_colinearity_fewer_than_two_points_raises(self):
        with pytest.raises(AssertionError):
            Polynomial.test_colinearity([(1, 5)], FIELD)
