"""Transliteration of reference `src/univariate/` — dense coefficient
polynomials with the reference's exact (slow) algorithms: O(n^2) schoolbook
multiply, O(n*m) long division, O(n^3) Lagrange interpolation.
"""


class Polynomial:
    """univariate/mod.rs:7-11."""

    __slots__ = ("coeffs", "field")

    def __init__(self, coeffs, field):
        self.coeffs = list(coeffs)
        self.field = field

    # -- mod.rs ----------------------------------------------------------

    def deg(self):
        # mod.rs:54-68 — -1 for (all-)zero; index of last nonzero coeff.
        if not self.coeffs:
            return -1
        if all(c == c.field.zero() for c in self.coeffs):
            return -1
        maxidx = 0
        for i, k in enumerate(self.coeffs):
            if k != k.field.zero():
                maxidx = i
        return maxidx

    def __eq__(self, other):
        # mod.rs:13-44 — degree-normalized coefficient comparison.
        if self.deg() != other.deg():
            return False
        if self.deg() == -1:
            return True
        for i in range(self.deg() + 1):
            sc = self.coeffs[i] if i < len(self.coeffs) else self.field.zero()
            oc = other.coeffs[i] if i < len(other.coeffs) else other.field.zero()
            if sc != oc:
                return False
        return True

    @staticmethod
    def neg(poly):
        # mod.rs:70-75.
        return Polynomial([-c for c in poly.coeffs], poly.field)

    @staticmethod
    def zerofier(domain):
        # mod.rs:77-96 — incremental product of (x - d).
        field = domain[0].field
        x = Polynomial([field.zero(), field.one()], field)
        acc = Polynomial([field.one()], field)
        for d in domain:
            acc = Polynomial.mul(acc, Polynomial.sub(x, Polynomial([d], field)))
        return acc

    def scale(self, factor):
        # mod.rs:99-113 — f(c*X) via per-coeff factor^i.
        coeffs = [
            self.field.mul(self.field.exp(factor, i), c)
            for i, c in enumerate(self.coeffs)
        ]
        return Polynomial(coeffs, self.field)

    def is_zero(self):
        return self.deg() == -1

    def leading_coeff(self):
        # mod.rs:126-131.
        if self.is_zero():
            raise ValueError("Zero polynomial has no leading coefficient")
        return self.coeffs[self.deg()]

    @staticmethod
    def zero_poly(field):
        return Polynomial([], field)

    @staticmethod
    def constant_poly(field, value):
        return Polynomial([field.new_element(value)], field)

    @staticmethod
    def linear_poly(field, a, b):
        return Polynomial([field.new_element(a), field.new_element(b)], field)

    @staticmethod
    def test_colinearity(points):
        # mod.rs:145-152 — interpolate and check deg <= 1.
        assert len(points) >= 2, "At least 2 points to test colinearity"
        xs = [p[0] for p in points]
        ys = [p[1] for p in points]
        return Polynomial.interpolate_domain(xs, ys).deg() <= 1

    # -- add.rs / sub.rs -------------------------------------------------

    @staticmethod
    def add(lhs, rhs):
        # add.rs:6-32.
        if lhs.deg() == -1:
            return Polynomial(rhs.coeffs, rhs.field)
        if rhs.deg() == -1:
            return Polynomial(lhs.coeffs, lhs.field)
        zero = lhs.coeffs[0].field.zero()
        n = max(len(lhs.coeffs), len(rhs.coeffs))
        coeffs = []
        for i in range(n):
            left = lhs.coeffs[i] if i < len(lhs.coeffs) else zero
            right = rhs.coeffs[i] if i < len(rhs.coeffs) else zero
            coeffs.append(left + right)
        return Polynomial(coeffs, lhs.field)

    @staticmethod
    def sub(lhs, rhs):
        # sub.rs:8-34.
        if lhs.deg() == -1:
            return Polynomial.neg(rhs)
        if rhs.deg() == -1:
            return Polynomial(lhs.coeffs, lhs.field)
        zero = lhs.coeffs[0].field.zero()
        n = max(len(lhs.coeffs), len(rhs.coeffs))
        coeffs = []
        for i in range(n):
            left = lhs.coeffs[i] if i < len(lhs.coeffs) else zero
            right = rhs.coeffs[i] if i < len(rhs.coeffs) else zero
            coeffs.append(left - right)
        return Polynomial(coeffs, lhs.field)

    def __add__(self, other):
        return Polynomial.add(self, other)

    def __sub__(self, other):
        return Polynomial.sub(self, other)

    # -- mul.rs ----------------------------------------------------------

    @staticmethod
    def mul(lhs, rhs):
        # mul.rs:6-29 — schoolbook double loop, zero-lhs-coeff skip.
        if lhs.is_zero() or rhs.is_zero():
            return Polynomial([], lhs.field)
        zero = lhs.coeffs[0].field.zero()
        coeffs = [zero] * (len(lhs.coeffs) + len(rhs.coeffs) - 1)
        for i, a in enumerate(lhs.coeffs):
            if a.value == 0:
                continue
            for j, b in enumerate(rhs.coeffs):
                coeffs[i + j] = coeffs[i + j] + a * b
        return Polynomial(coeffs, lhs.field)

    def __mul__(self, other):
        return Polynomial.mul(self, other)

    # -- div.rs ----------------------------------------------------------

    @staticmethod
    def div(numer, denom):
        # div.rs:6-41 — long division; returns (quotient, remainder).
        if denom.deg() == -1:
            raise ZeroDivisionError("No division by zero")
        if numer.deg() < denom.deg():
            return (Polynomial([], numer.field), Polynomial(numer.coeffs, numer.field))
        field = denom.coeffs[0].field
        q = [field.zero()] * (numer.deg() - denom.deg() + 1)
        r = Polynomial(numer.coeffs, numer.field)
        while r.deg() >= denom.deg():
            coeff = r.leading_coeff() / denom.leading_coeff()
            shift = r.deg() - denom.deg()
            subtractee = Polynomial.mul(
                Polynomial([field.zero()] * shift + [coeff], numer.field), denom
            )
            q[shift] = coeff
            r = Polynomial.sub(r, subtractee)
        return (Polynomial(q, numer.field), r)

    @staticmethod
    def intdiv(numer, denom):
        # div.rs:43-47.
        q, r = Polynomial.div(numer, denom)
        assert r.is_zero()
        return q

    @staticmethod
    def modulo(numer, denom):
        # div.rs:49-52.
        return Polynomial.div(numer, denom)[1]

    # -- eval.rs ---------------------------------------------------------

    def eval(self, x):
        # eval.rs:6-14 — ascending-power accumulation.
        xi = x.field.one()
        val = x.field.zero()
        for c in self.coeffs:
            val = val + c * xi
            xi = xi * x
        return val

    def eval_domain(self, domain):
        # eval.rs:16-21.
        return [self.eval(x) for x in domain]

    # -- exp.rs ----------------------------------------------------------

    @staticmethod
    def exp(base, exp):
        # exp.rs:6-33.
        if exp == 0:
            return Polynomial([base.field.one()], base.field)
        if base.is_zero():
            return Polynomial([], base.field)
        result = Polynomial([base.field.one()], base.field)
        bpower = Polynomial(base.coeffs, base.field)
        while exp != 0:
            if exp & 1:
                result = Polynomial.mul(result, bpower)
            bpower = Polynomial.mul(bpower, bpower)
            exp >>= 1
        return result

    def __xor__(self, exp):
        return Polynomial.exp(self, exp)

    # -- interpolate.rs --------------------------------------------------

    @staticmethod
    def interpolate_domain(domain, values):
        # interpolate.rs:6-44 — textbook O(n^3) Lagrange.
        assert len(domain) == len(values)
        assert len(domain) > 0
        field = domain[0].field
        x = Polynomial([field.zero(), field.one()], field)
        acc = Polynomial([field.zero()], field)
        for i in range(len(domain)):
            prod = Polynomial([values[i]], field)
            for j in range(len(domain)):
                if j == i:
                    continue
                xj = Polynomial([domain[j]], field)
                denom = field.inv(domain[i] - domain[j])
                prod = Polynomial.mul(prod, Polynomial.sub(x, xj))
                prod = Polynomial(
                    [c * denom for c in prod.coeffs], field
                )
            acc = Polynomial.add(acc, prod)
        return acc
