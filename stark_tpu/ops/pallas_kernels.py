"""Pallas TPU kernels for the elementwise hot ops.

Scope note (measured on this Mosaic/axon toolchain): u8 vector ops and
lane-strided slices fail to compile, which blocks a fused Merkle-subtree
kernel — the XLA-fused row-tuple hash path (ops/hash_batch.py) remains the
production hash engine.  Pure-u32 elementwise kernels compile fine, so the
FRI fold (reference src/fri.rs:57-91, re-algorithmized as
``2^{-1} * ((a+b) + alpha/x * (a-b))`` with a precomputed Montgomery-form
1/x ladder) is provided here as a single-pass Pallas kernel.

Enabled with ``STARK_TPU_PALLAS=1`` on a TPU backend; the jnp fold
(fri._fold_kernel) is the default and the bit-exactness oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.ops.fieldops import P

_MASK16 = 0xFFFF
_LANES = 128
_SUBLANES = 512  # (512, 128) u32 block = 256 KB/operand; ~1.3 MB live VMEM
_BLOCK = _SUBLANES * _LANES


def _mulhi32(a, b):
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


def _fold_body(a_ref, b_ref, invx_ref, s_ref, o_ref):
    """One tile of the fold; s_ref holds the 4 scalar constants
    (alpha, alpha_shoup, inv2, inv2_shoup) in SMEM."""
    a = a_ref[:]
    b = b_ref[:]
    invx = invx_ref[:]
    alpha_w = s_ref[0]
    alpha_ws = s_ref[1]
    inv2_w = s_ref[2]
    inv2_ws = s_ref[3]

    p = jnp.uint32(P)
    s = a + b
    s = jnp.where(s >= p, s - p, s)
    d = a - b
    d = jnp.where(a >= b, d, d + p)
    # t = alpha * invx (Shoup: invx is the variable, alpha the constant —
    # roles are symmetric for the identity, and invx is already in
    # Montgomery form so the later mont-mul lands in standard form)
    q = _mulhi32(invx, alpha_ws)
    t = invx * alpha_w - q * p
    t = jnp.where(t >= p, t - p, t)
    # u = REDC(t * d)
    lo = t * d
    hi = _mulhi32(t, d)
    m = lo * jnp.uint32(_PINV_NEG)
    mp_hi = _mulhi32(m, p)
    carry = (lo != jnp.uint32(0)).astype(jnp.uint32)
    u = hi + mp_hi + carry
    u = jnp.where(u >= p, u - p, u)
    su = s + u
    su = jnp.where(su >= p, su - p, su)
    q2 = _mulhi32(su, inv2_ws)
    r = su * inv2_w - q2 * p
    o_ref[:] = jnp.where(r >= p, r - p, r)


_PINV_NEG = (-pow(P, -1, 1 << 32)) % (1 << 32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fold_pallas(a, b, inv_x_mont, scalars, interpret=False):
    """a, b, inv_x_mont: (half,) uint32; scalars: (4,) uint32
    (alpha, alpha_shoup, inv2, inv2_shoup).  Returns the folded codeword.
    half must be a multiple of 128 (LANES)."""
    half = a.shape[0]
    assert half % _LANES == 0, half
    sub = min(_SUBLANES, half // _LANES)
    block = sub * _LANES
    assert half % block == 0, (
        f"half={half} not a multiple of the {block}-lane block; "
        "pad or use the jnp fold"
    )
    grid = (half // block,)
    shaped = lambda x: x.reshape(half // _LANES, _LANES)
    spec = pl.BlockSpec(
        (sub, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _fold_body,
        grid=grid,
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((half // _LANES, _LANES), jnp.uint32),
        interpret=interpret,
    )(shaped(a), shaped(b), shaped(inv_x_mont), scalars)
    return out.reshape(half)


def pallas_enabled() -> bool:
    if os.environ.get("STARK_TPU_PALLAS", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
