"""Number-theoretic transform over F_p (p = 998244353, 2-adicity 23).

Replaces the reference's dense-polynomial hot loops — O(n^2) schoolbook
multiply (src/univariate/mul.rs:6-29), O(n*d) evaluation
(src/univariate/eval.rs:16-21) and O(n^3) Lagrange interpolation
(src/univariate/interpolate.rs:6-44) — with an O(n log n) radix-2 NTT whose
input/output *contract* matches those functions exactly on power-of-two
smooth (coset) domains:

    ntt(coeffs)[i]        == poly.eval(omega^i)
    coset_eval(c, off)[i] == poly.eval(off * omega^i)   (eval_domain contract)
    coset_interp(vals)    == interpolate_domain(off * omega^i, vals)

Algorithm: Stockham autosort decimation-in-time.  No bit-reversal
permutation, no scatter/gather — every stage is a (reshape, broadcast
multiply, add/sub, concat) over contiguous blocks, which XLA lowers to
VPU-friendly strided vector code on TPU.  Twiddle products use Shoup
multiplication (the twiddles are compile-time constants of the plan).

Stage invariant: at step t the array has shape (L, r) with L = 2^t,
r = n / L, and X_t[j, q] = (L-point NTT of the subsequence a[q::r])[j].
The butterfly merges column q (even subsequence) with column q + r/2
(odd subsequence) using twiddles w_{2L}^j = omega^(j * n/(2L)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.ops import fieldops as F
from stark_tpu.ops.fieldops import P, primitive_nth_root


class NTTPlan:
    """Precomputed twiddles (+ Shoup companions) for a size-n (i)NTT.

    Stored as host numpy so the (lru-cached) plan never captures traced
    values; they enter the computation as jit-time constants.
    """

    def __init__(self, n: int, inverse: bool = False):
        assert n & (n - 1) == 0 and n >= 1, "NTT size must be a power of two"
        assert n <= (1 << F.TWO_ADICITY)
        self.n = n
        self.inverse = inverse
        self.log2n = n.bit_length() - 1
        omega = primitive_nth_root(n) if n > 1 else 1
        if inverse:
            omega = pow(omega, P - 2, P)
        self.omega = omega
        # Full power table omega^0..omega^{n-1}; stage twiddles are strided
        # views: stage t uses omega^(j * (n >> (t+1))) for j in [0, 2^t).
        pow_table = F.host_powers(omega, n)
        self.stage_w = []
        self.stage_ws = []
        for t in range(self.log2n):
            w = pow_table[:: (n >> (t + 1))][: (1 << t)].copy()
            self.stage_w.append(w)
            self.stage_ws.append(F.shoup_precompute(w))
        if inverse:
            n_inv = pow(n, P - 2, P)
            self.n_inv = n_inv
            self.n_inv_shoup = int(F.shoup_precompute(n_inv))


@functools.lru_cache(maxsize=None)
def get_plan(n: int, inverse: bool = False) -> NTTPlan:
    return NTTPlan(n, inverse)


def _ntt_core(x, plan: NTTPlan):
    """x: (..., n) uint32 in [0, p).  Returns (..., n) NTT in natural order."""
    n = plan.n
    batch = x.shape[:-1]
    x = x.reshape(batch + (1, n))
    for t in range(plan.log2n):
        half = x.shape[-1] // 2
        even = x[..., :half]
        odd = x[..., half:]
        w = jnp.asarray(plan.stage_w[t])[:, None]  # (L, 1) broadcast over cols
        ws = jnp.asarray(plan.stage_ws[t])[:, None]
        tw = F.shoup_mul(odd, w, ws)
        x = jnp.concatenate([F.addmod(even, tw), F.submod(even, tw)], axis=-2)
    x = x.reshape(batch + (n,))
    if plan.inverse:
        x = F.shoup_mul(x, jnp.uint32(plan.n_inv), jnp.uint32(plan.n_inv_shoup))
    return x


@functools.partial(jax.jit, static_argnames=("n",))
def _ntt_jit(x, n: int):
    return _ntt_core(x, get_plan(n, inverse=False))


@functools.partial(jax.jit, static_argnames=("n",))
def _intt_jit(x, n: int):
    return _ntt_core(x, get_plan(n, inverse=True))


def _fused_dispatch(x, inverse: bool):
    """Route (…, n) transforms through the fused Pallas engine where it
    applies: 1-D directly; small-batch 2-D (the trace-column LDE shape)
    row-by-row — rows are independent transforms and c is tiny (a few
    registers), so c fused chains beat c extra Stockham HBM sweeps.
    Returns None when the fused engine does not apply."""
    from stark_tpu.ops import ntt_fused as NTF

    n = x.shape[-1]
    if NTF.fused_available(n, x.shape):
        return NTF.fused_ntt(x, inverse=inverse)
    if (
        x.ndim == 2
        and x.shape[0] <= 8
        and NTF.fused_available(n, x.shape[-1:])
    ):
        return jnp.stack([NTF.fused_ntt(row, inverse=inverse) for row in x])
    return None


def ntt(coeffs):
    """Forward NTT: coeffs (..., n) -> evaluations at omega^i, natural order.

    Large transforms on TPU dispatch to the fused multi-stage Pallas
    engine (ops/ntt_fused.py — identical values, ~4 HBM passes instead of
    log2 n); everything else takes the XLA Stockham chain."""
    coeffs = jnp.asarray(coeffs, dtype=jnp.uint32)
    fused = _fused_dispatch(coeffs, inverse=False)
    if fused is not None:
        return fused
    return _ntt_jit(coeffs, coeffs.shape[-1])


def intt(evals):
    """Inverse NTT: evaluations at omega^i -> coefficients."""
    evals = jnp.asarray(evals, dtype=jnp.uint32)
    fused = _fused_dispatch(evals, inverse=True)
    if fused is not None:
        return fused
    return _intt_jit(evals, evals.shape[-1])


# ---------------------------------------------------------------------------
# Coset evaluation / interpolation (the LDE primitives).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "offset"))
def _coset_scale_fwd(coeffs, n: int, offset: int):
    scale = F.powers(offset, n)
    return F.mulmod(coeffs, scale)


@functools.partial(jax.jit, static_argnames=("n", "offset"))
def _coset_scale_inv(coeffs, n: int, offset: int):
    inv_off = pow(offset % P, P - 2, P)
    scale = F.powers(inv_off, n)
    return F.mulmod(coeffs, scale)


def coset_eval(coeffs, offset: int):
    """Evaluate the polynomial on {offset * omega^i}: contract eval.rs:16-21.

    coeffs: (..., n) uint32.  f(off * x) has coefficients c_k * off^k; then a
    plain NTT evaluates on the omega-domain.
    """
    coeffs = jnp.asarray(coeffs, dtype=jnp.uint32)
    n = coeffs.shape[-1]
    if offset % P == 1:
        return ntt(coeffs)
    return ntt(_coset_scale_fwd(coeffs, n, offset % P))


def coset_interp(values, offset: int):
    """Interpolate values on {offset * omega^i}: contract interpolate.rs:6-44.

    iNTT gives coefficients of g(x) = f(off * x); undo the scale.
    """
    values = jnp.asarray(values, dtype=jnp.uint32)
    n = values.shape[-1]
    c = intt(values)
    if offset % P == 1:
        return c
    return _coset_scale_inv(c, n, offset % P)


def lde(coeffs, blowup: int, offset: int):
    """Low-degree extension: zero-pad coeffs (..., n) to n*blowup and
    evaluate on the size-(n*blowup) coset {offset * Omega^i}."""
    coeffs = jnp.asarray(coeffs, dtype=jnp.uint32)
    n = coeffs.shape[-1]
    assert blowup & (blowup - 1) == 0
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n * blowup - n)]
    return coset_eval(jnp.pad(coeffs, pad), offset)


# ---------------------------------------------------------------------------
# Host (numpy) engine — exact same algorithm, no XLA.  Used where the data
# is tiny and a device dispatch (or a cold-process compile) would dominate:
# the verifier's last-codeword low-degree check (fri.rs:360-397 replacement)
# touches <= ~hundreds of points.
# ---------------------------------------------------------------------------

def _host_ntt_core(x: np.ndarray, plan: NTTPlan) -> np.ndarray:
    n = plan.n
    a = x.astype(np.uint64).reshape(1, n)
    for t in range(plan.log2n):
        half = a.shape[-1] // 2
        even, odd = a[..., :half], a[..., half:]
        tw = (odd * plan.stage_w[t].astype(np.uint64)[:, None]) % P
        # (even + P - tw): keep the uint64 subtraction non-wrapping.
        a = np.concatenate(
            [(even + tw) % P, (even + np.uint64(P) - tw) % P], axis=-2
        )
    a = a.reshape(n)
    if plan.inverse:
        a = (a * np.uint64(plan.n_inv)) % P
    return a.astype(np.uint32)


def host_coset_interp(values: np.ndarray, offset: int) -> np.ndarray:
    """numpy coset interpolation (same contract as coset_interp)."""
    values = np.asarray(values, dtype=np.uint32)
    n = values.shape[-1]
    c = _host_ntt_core(values, get_plan(n, inverse=True))
    if offset % P != 1:
        inv_off = pow(offset % P, P - 2, P)
        c = (c.astype(np.uint64) * F.host_powers(inv_off, n).astype(np.uint64)) % P
    return c.astype(np.uint32)


def host_coset_eval(coeffs: np.ndarray, offset: int) -> np.ndarray:
    """numpy coset evaluation (same contract as coset_eval)."""
    coeffs = np.asarray(coeffs, dtype=np.uint32)
    n = coeffs.shape[-1]
    if offset % P != 1:
        coeffs = (
            coeffs.astype(np.uint64)
            * F.host_powers(offset % P, n).astype(np.uint64)
        ) % P
    return _host_ntt_core(coeffs.astype(np.uint32), get_plan(n, inverse=False))


# ---------------------------------------------------------------------------
# Scalar oracle (host, exact) — used by unit tests only.
# ---------------------------------------------------------------------------

def naive_eval_domain(coeffs, domain):
    """O(n*d) reference oracle matching eval.rs:6-21 (ascending-power Horner)."""
    out = []
    for x in domain:
        xi, val = 1, 0
        for c in coeffs:
            val = (val + int(c) * xi) % P
            xi = (xi * int(x)) % P
        out.append(val)
    return np.array(out, dtype=np.uint32)
