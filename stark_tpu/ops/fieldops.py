"""Vectorized prime-field arithmetic over F_p, p = 998244353 = 119*2^23 + 1.

TPU-native design notes
-----------------------
The reference implements scalar field ops with u128 widening and `% p`
(reference src/ff.rs:138-189).  TPUs have no native 64-bit integer multiply,
so this module expresses *all* modular arithmetic in pure uint32 lane math
that lowers cleanly onto the VPU (8x128 lanes):

* ``mulhi32``      — full 32x32 -> high-32 product via 16-bit limb schoolbook
                     (6 u32 multiplies, no carries outside uint32 range).
* ``mont_mul``     — Montgomery REDC with R = 2^32 for *generic* products.
* ``shoup_mul``    — Shoup's precomputed-quotient multiply for products by
                     *constants* (NTT twiddles, fold ladders): ~3 multiplies
                     plus one mulhi.  This is the hot-loop primitive.
* ``powmod``       — fixed 30-step square-and-multiply ladder (Fermat
                     inverses are ``powmod(x, p-2)``) — branch-free,
                     fully batched, no host round-trips.

Everything operates on ``jnp.uint32`` arrays with values in [0, p).  The
reference's *unreduced* u64 values (Fiat-Shamir challenges, see
src/fiat_shamir.rs:19-25 and src/ff.rs:113-118) never enter the array world
unreduced: scalars are reduced exactly on host (Python ints) first — the
reduction is a no-op for every modular operation's *result*, and the raw
u64 is only consumed by host-side hashing.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Field constants (computed, not hardcoded magic).
# ---------------------------------------------------------------------------

P = 998244353  # 119 * 2^23 + 1, 2-adicity 23, generator g = 3 (ff.rs:191-197)
GENERATOR = 3
TWO_ADICITY = 23

R1 = (1 << 32) % P            # 2^32 mod p  (Montgomery R mod p)
R2 = (1 << 64) % P            # 2^64 mod p  (Montgomery conversion constant)
PINV_NEG = (-pow(P, -1, 1 << 32)) % (1 << 32)   # -p^{-1} mod 2^32

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def _c(x: int) -> jnp.ndarray:
    """uint32 scalar constant."""
    return jnp.uint32(x)


# ---------------------------------------------------------------------------
# Wide multiply building block.
# ---------------------------------------------------------------------------

def mulhi32(a, b):
    """High 32 bits of the full 64-bit product of two uint32 arrays.

    16-bit limb schoolbook; every partial product and carry fits in uint32.
    """
    a = a.astype(_U32)
    b = b.astype(_U32)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo = a0 * b0
    mid1 = a1 * b0
    mid2 = a0 * b1
    hi = a1 * b1
    carry = ((lo >> 16) + (mid1 & _MASK16) + (mid2 & _MASK16)) >> 16
    return hi + (mid1 >> 16) + (mid2 >> 16) + carry


# ---------------------------------------------------------------------------
# Modular add / sub / neg  (contract: ff.rs:146-167).
# ---------------------------------------------------------------------------

def addmod(a, b):
    """(a + b) mod p for a, b in [0, p).  a+b < 2p < 2^31: no u32 overflow."""
    s = a + b
    return jnp.where(s >= _c(P), s - _c(P), s)


def submod(a, b):
    """(a - b) mod p for a, b in [0, p)."""
    d = a - b  # wraps if a < b
    return jnp.where(a >= b, d, d + _c(P))


def negmod(a):
    """(-a) mod p for a in [0, p)."""
    return jnp.where(a == _c(0), a, _c(P) - a)


# ---------------------------------------------------------------------------
# Montgomery multiplication (generic runtime x runtime products).
# ---------------------------------------------------------------------------

def mont_mul(a, b):
    """REDC(a*b) = a*b*2^{-32} mod p, for a, b in [0, p).

    Result in [0, p).  ~12 uint32 multiplies.
    """
    lo = a * b                       # wrapping low product
    hi = mulhi32(a, b)
    m = lo * _c(PINV_NEG)            # wrapping
    mp_hi = mulhi32(m, _c(P))
    # (lo + m*p) mod 2^32 == 0 by construction of m; carry out is 1 iff lo != 0.
    carry = (lo != _c(0)).astype(_U32)
    u = hi + mp_hi + carry           # < 2p < 2^31: no overflow
    return jnp.where(u >= _c(P), u - _c(P), u)


def to_mont(a):
    """a -> a * 2^32 mod p (Montgomery form)."""
    return mont_mul(a, _c(R2))


def from_mont(a):
    """a * 2^32 mod p -> a."""
    return mont_mul(a, _c(1))


def mulmod(a, b):
    """(a * b) mod p for arrays in standard form.

    Two REDCs: mont_mul(mont_mul(a, b), R2) = a*b*R^{-1} * R^2 * R^{-1} = a*b.
    """
    return mont_mul(mont_mul(a, b), _c(R2))


# ---------------------------------------------------------------------------
# Shoup multiplication by precomputed constants (the NTT hot-loop primitive).
# ---------------------------------------------------------------------------

def shoup_precompute(w):
    """Companion constant w' = floor(w * 2^32 / p) for Shoup multiplication.

    Host-side (numpy uint64); w must be in [0, p).
    """
    w = np.asarray(w, dtype=np.uint64)
    return ((w << np.uint64(32)) // np.uint64(P)).astype(np.uint32)


def shoup_mul(a, w, w_shoup):
    """(a * w) mod p where w < p is a constant with companion w_shoup.

    Valid for any a < 2^32.  Result in [0, p).
    q = floor(a * w' / 2^32);  r = a*w - q*p  in [0, 2p).
    """
    q = mulhi32(a, w_shoup)
    r = a * w - q * _c(P)            # wrapping arithmetic; true value in [0, 2p)
    return jnp.where(r >= _c(P), r - _c(P), r)


# ---------------------------------------------------------------------------
# Exponentiation / inversion.
# ---------------------------------------------------------------------------

def powmod(a, e: int):
    """a^e mod p elementwise, e a static Python int >= 0.

    Fixed unrolled square-and-multiply in Montgomery form (LSB-first, matching
    the reference ladder semantics ff.rs:200-213 — exp(0,0) = 1).
    """
    e = int(e)
    if e == 0:
        return jnp.full(jnp.shape(a), 1, dtype=_U32)
    am = to_mont(a.astype(_U32))
    acc = None
    while e > 0:
        if e & 1:
            acc = am if acc is None else mont_mul(acc, am)
        e >>= 1
        if e:
            am = mont_mul(am, am)
    return from_mont(acc)


def invmod(a):
    """a^{-1} mod p elementwise via Fermat (a^{p-2}).

    Contract matches ff.rs:169-178 for a != 0 (mod p); inv(0) is undefined
    (the reference panics) — here it returns 0.
    """
    return powmod(a, P - 2)


# ---------------------------------------------------------------------------
# Host-side exact scalar helpers (Python ints — used by the control plane).
# ---------------------------------------------------------------------------

def host_pow(base: int, e: int, p: int = P) -> int:
    return pow(base % p, e, p)


def host_inv(v: int, p: int = P) -> int:
    return pow(v % p, p - 2, p)


@functools.lru_cache(maxsize=64)
def primitive_nth_root(n: int, p: int = P) -> int:
    """w_n = g^((p-1)/n); contract: ff.rs:215-223 (n a power of two <= 2^23)."""
    assert n & (n - 1) == 0, "n must be a power of two"
    assert n <= (1 << TWO_ADICITY), "n > 2^23 not supported by this modulus"
    return pow(GENERATOR, (p - 1) // n, p)


def host_powers(base: int, n: int, scale: int = 1, p: int = P) -> np.ndarray:
    """[scale * base^i mod p for i in range(n)] as numpy uint32.

    Log-doubling: O(log n) vectorized numpy passes (products < 2^60 fit u64).
    """
    base %= p
    scale %= p
    out = np.array([scale], dtype=np.uint64)
    step = base % p
    while len(out) < n:
        out = np.concatenate([out, (out * np.uint64(step)) % np.uint64(p)])
        step = (step * step) % p
    return out[:n].astype(np.uint32)


def powers(base: int, n: int, scale: int = 1):
    """Device uint32 array of scale * base^i, i in [0, n)."""
    return jnp.asarray(host_powers(base, n, scale))
