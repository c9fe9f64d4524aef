"""Transliteration of reference `src/utils.rs` + `src/ff.rs`.

Faithfulness notes:
* `new_element` stores the value UNREDUCED (ff.rs:113-118).
* Equality compares raw value + modulus (ff.rs:50-58).
* `sub` computes (p + l - r) % p in u128 arithmetic (ff.rs:154-160); for
  adversarial unreduced r > p + l the u128 subtraction wraps mod 2^128
  (release mode), reproduced here explicitly.
* `neg` computes (p - value) % p on u64 (ff.rs:162-167); wrapping mod 2^64
  for unreduced inputs.
* `exp` is LSB-first square-and-multiply through field.mul (ff.rs:200-213);
  exp(x, 0) == 1 for every x including 0.
"""

_U128 = (1 << 128) - 1
_U64 = (1 << 64) - 1


def xgcd(x, y):
    """utils.rs:3-13 — recursive Bezout; returns (gcd, x, y)."""
    if y == 0:
        return (x, 1, 0)
    gcd, x1, y1 = xgcd(y, x % y)
    x2 = y1
    y2 = x1 - (x // y) * y1
    return (gcd, x2, y2)


class FiniteField:
    """ff.rs:10-12, 108-233."""

    def __init__(self, p=998244353):
        self.p = p

    def __eq__(self, other):
        return isinstance(other, FiniteField) and self.p == other.p

    def new_element(self, value):
        # ff.rs:113-118 — NO reduction mod p.
        return FieldElement(value & _U64, self)

    def modulus(self):
        return self.p

    def one(self):
        return FieldElement(1, self)

    def zero(self):
        return FieldElement(0, self)

    def mul(self, l, r):
        # ff.rs:138-144 — widen to u128, reduce.
        return FieldElement(((l.value * r.value) & _U128) % self.p, self)

    def add(self, l, r):
        # ff.rs:146-152.
        return FieldElement(((l.value + r.value) & _U128) % self.p, self)

    def sub(self, l, r):
        # ff.rs:154-160 — u128 (p + l - r) % p; wraps mod 2^128 if negative.
        return FieldElement(((self.p + l.value - r.value) & _U128) % self.p, self)

    def neg(self, op):
        # ff.rs:162-167 — u64 (p - value) % p; wraps mod 2^64 if value > p.
        return FieldElement(((self.p - op.value) & _U64) % self.p, self)

    def inv(self, op):
        # ff.rs:169-178.
        g, x, _ = xgcd(op.value, self.p)
        assert g == 1, "no inverse"
        return FieldElement(((x % self.p) + self.p) % self.p, self)

    def div(self, l, r):
        # ff.rs:181-189.
        assert r.value != 0, "no division by zero"
        rinv = self.inv(r)
        return FieldElement(((l.value * rinv.value) & _U128) % self.p, self)

    def g(self):
        # ff.rs:191-197.
        assert self.p == 998244353
        return FieldElement(3, self)

    def exp(self, base, exp):
        # ff.rs:200-213 — LSB-first square-and-multiply via self.mul.
        res = self.one()
        b = FieldElement(base.value, self)
        e = exp
        while e > 0:
            if e % 2 == 1:
                res = self.mul(res, b)
            b = self.mul(b, b)
            e >>= 1
        return res

    def prim_nth_root(self, n):
        # ff.rs:215-223.
        assert self.p == 998244353
        assert (n & (n - 1)) == 0, "n must be a power of two"
        assert n <= (1 << 23), "n > 2^23 not supported by this modulus"
        return self.exp(self.g(), (self.p - 1) // n)

    def sample(self, salt):
        # ff.rs:225-232.
        acc = self.zero()
        for b in salt:
            acc.value = ((acc.value << 8) & _U128) % self.p
            acc.value = ((acc.value ^ b) & _U128) % self.p
        return acc


class FieldElement:
    """ff.rs:24-28 with operator impls ff.rs:30-100, 235-281."""

    __slots__ = ("value", "field")

    def __init__(self, value, field):
        self.value = value
        self.field = field

    def __eq__(self, other):
        # ff.rs:50-58 — raw value + modulus comparison.
        return (
            isinstance(other, FieldElement)
            and self.value == other.value
            and self.field == other.field
        )

    def __hash__(self):
        return hash((self.value, self.field.p))

    def __add__(self, other):
        return self.field.add(self, other)

    def __sub__(self, other):
        return self.field.sub(self, other)

    def __mul__(self, other):
        return self.field.mul(self, other)

    def __truediv__(self, other):
        return self.field.div(self, other)

    def __neg__(self):
        return self.field.neg(self)

    def __xor__(self, exp):
        # BitXor = exponentiation (ff.rs:94-100).
        return self.field.exp(self, exp)

    def pow(self, exp):
        return self.field.exp(self, exp)

    def __repr__(self):
        return f"FieldElement({self.value})"
