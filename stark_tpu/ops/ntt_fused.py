"""Fused multi-stage Pallas NTT (four-step / Bailey decomposition).

The default NTT engine (ops/ntt.py) is a radix-2 Stockham chain: XLA fuses
the elementwise work per stage, but every one of the log2(n) stages is a
full HBM read+write of the array — at 2^22 that is 22 x 32 MB ~ 700 MB of
traffic for a 16 MB array, pinning the op at the per-stage bandwidth
roofline (~1.04 ms measured, BASELINE.md).

This module keeps a tile resident in VMEM for *half* the stages at a time
(classic FFT blocking).  With n = n1 * n2 (both powers of two), index the
input n = n2*i1 + i2 and the output k = k1 + n1*k2:

    X[k1 + n1*k2] = sum_{i2} w^{i2*k1} * w2^{i2*k2}
                        * ( sum_{i1} x[n2*i1 + i2] * w1^{i1*k1} )

with w1 = w^{n2} (primitive n1-th root), w2 = w^{n1}.  The flow:

  pass 1   column NTTs of length n1 on the (n1, n2) C-order view, fused
           with the inter-pass twiddle w^{k1*i2} — ONE Pallas kernel, one
           HBM read + write; log2(n1) butterfly stages run in VMEM.
  gather+T row bit-reversal permutation + one XLA transpose.
  pass 2   column NTTs of length n2 — the same kernel; a final row
           bit-reversal + reshape is the natural-order result.

HBM traffic: ~4 read+write passes of n words (~128 MB at 2^22) vs 22.

Kernel design notes (everything here is driven by Mosaic vector-layout
constraints, measured on this toolchain):

* The column NTT is an IN-PLACE radix-2 DIF: natural input, bit-reversed
  output, and — critically — every butterfly reads and writes the same
  rows.  A Stockham formulation needs a per-stage sub-tile compaction
  ((L, r, T)[:, :r/2] with r < 8) whose relayout made the last three
  stages cost 2.3x the other eight (measured: 0.30 of 0.43 ms).
* Partner rows are fetched with two ``pltpu.roll`` sublane rotations and
  an iota mask — uniform across ALL stages, no reshapes, no layout casts.
* Per-stage twiddles are packed dense and COLUMN-oriented as (n, lg)
  uint32 (+ Shoup companions); stage s is the static width-1 lane slice
  [:, s:s+1], a sublane vector that broadcasts across lanes.
* The bit-reversed row order of pass 1 is ABSORBED into the precomputed
  inter-pass twiddle (its rows are permuted host-side, free); the
  remaining row permutations ride the XLA gather/transpose between the
  kernels (row gathers move contiguous 512-byte rows — bandwidth, not
  shuffles).  The inverse transform's 1/n scale folds into the same
  twiddle, so forward and inverse share all kernels.
* The inter-pass twiddle is stored in Montgomery form and applied with
  one in-kernel REDC — one (n1, n2) matrix read instead of a Shoup pair.
* Stages ping-pong between the output block and one VMEM scratch block:
  a value-chain across stages overflows Mosaic's stack at 2^22 (22 MB
  measured); with ping-pong + an explicit 100 MB vmem_limit_bytes the
  v5e compiles and runs it.

Replaces (with ops/ntt.py) the reference's O(n^2)/O(n^3) polynomial
multiply & interpolation hot loops (src/univariate/mul.rs:6-29,
interpolate.rs:6-44); the evaluation contract is identical to
ops/ntt.ntt — same values, natural order — which tests assert exactly.

Enabled by default on the TPU backend for 1-D inputs with
n >= _MIN_FUSED; set STARK_TPU_FUSED_NTT=0 to force the Stockham path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_tpu.ops.fieldops import P, primitive_nth_root, shoup_precompute

_LANES = 128
#: Lane widths of the butterfly blocks (pass 1, pass 2).  A full sweep at
#: 2^22 put every {128,256}^2 combo within relay timing noise
#: (0.64-0.70 ms end-to-end); (128, 256) measured best.  512 regresses
#: clearly (VMEM pressure defeats double-buffering).
_T_PASS1 = 128
_T_PASS2 = 256
_MIN_FUSED = 1 << 16
_VMEM_LIMIT = 100 * 1024 * 1024
#: Harvey-style lazy butterflies: values live in [0, 2p) across stages, the
#: subtract drops its select (x - y + 2p) and the Shoup multiply drops its
#: final conditional correction (valid for any t < 2^32 since
#: ws = floor(w*2^32/p) gives r = w*t - floor(ws*t/2^32)*p in [0, 2p)).
#: Pass 1's REDC absorbs [0,2p) inputs (a*b + m*p < 2p*p + 2^32*p so
#: u < 2p); pass 2 adds one final conditional subtract per element.
#: ~17% fewer VPU ops on a compute-bound kernel.  Default OFF until
#: A/B-measured on the TPU (flip via STARK_TPU_LAZY_NTT=1).
_LAZY_DEFAULT = os.environ.get("STARK_TPU_LAZY_NTT", "0") == "1"


def _host_pow_row(base: int, start: int, step: int, count: int) -> np.ndarray:
    """[start * base^(i*step) mod p for i in range(count)] as uint64."""
    out = np.empty(count, dtype=np.uint64)
    acc = start % P
    mul = pow(base, step, P)
    for i in range(count):
        out[i] = acc
        acc = (acc * mul) % P
    return out


def _bitrev_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation of [0, n) (an involution)."""
    lg = n.bit_length() - 1
    perm = np.zeros(n, dtype=np.int32)
    for bit in range(lg):
        perm |= ((np.arange(n) >> bit) & 1) << (lg - 1 - bit)
    return perm


class FusedNTTPlan:
    """Host-side constants for one (n, inverse) fused transform."""

    def __init__(self, n: int, inverse: bool):
        assert n & (n - 1) == 0 and n >= 4
        lg = n.bit_length() - 1
        lg1 = lg // 2
        env = os.environ.get("STARK_TPU_NTT_LG1")
        if env:
            # Split-tuning knob (A/B harness; bounded to valid splits).
            # Read ONCE per (n, inverse) — plans are lru-cached, so set it
            # before the first transform of a given size (fresh process
            # per split in an A/B).  Measured at 2^22: lg//2 wins
            # (NOTES.md round-4); the knob exists for future shapes.
            try:
                lg1 = max(2, min(int(env), lg - 7))
            except ValueError:
                raise ValueError(
                    f"STARK_TPU_NTT_LG1 must be an integer, got {env!r}"
                ) from None
        n1, n2 = 1 << lg1, n >> lg1
        assert n2 % _LANES == 0, (n, n1, n2)
        self.n, self.n1, self.n2 = n, n1, n2
        omega = primitive_nth_root(n)
        if inverse:
            omega = pow(omega, P - 2, P)
        self.omega = omega
        self.stages1 = self._dif_stage_tables(pow(omega, n2, P), n1)
        self.stages2 = self._dif_stage_tables(pow(omega, n1, P), n2)
        self.perm1 = _bitrev_perm(n1)
        self.perm2 = _bitrev_perm(n2)
        # Inter-pass twiddle, Montgomery form, rows PERMUTED to pass 1's
        # bit-reversed output order: Wm[rev(k1), i2] = scale *
        # omega^(k1*i2) * 2^32 mod p, (n1, n2) — consumed via in-kernel
        # REDC.  The inverse transform's 1/n folds into `scale`.
        scale = pow(n, P - 2, P) if inverse else 1
        wm = np.empty((n1, n2), dtype=np.uint32)
        col = np.full(n1, (scale * ((1 << 32) % P)) % P, dtype=np.uint64)
        step = _host_pow_row(omega, 1, 1, n1)  # omega^k1
        for d in range(n2):
            wm[:, d] = col
            col = (col * step) % P
        self.wm = np.ascontiguousarray(wm[self.perm1])

    @staticmethod
    def _dif_stage_tables(w: int, n: int):
        """Dense per-row DIF twiddles, column-oriented (n, lg) uint32
        (+ Shoup companions).  Stage s (block size m = n >> s) multiplies
        the second half of each block by w^(j * 2^s), j = row mod m - m/2;
        first-half rows hold 1 (multiplied then discarded by the select).
        Column-oriented so the kernel reads stage s as a static width-1
        lane slice [:, s:s+1] — no layout cast."""
        lg = n.bit_length() - 1
        rows = np.arange(n)
        packed = np.ones((n, lg), dtype=np.uint32)
        pow_table = _host_pow_row(w, 1, 1, n).astype(np.uint32)
        for s in range(lg):
            m = n >> s
            half = m >> 1
            j = (rows % m) - half
            second = j >= 0
            packed[second, s] = pow_table[(j[second] << s) % n]
        return packed, shoup_precompute(packed)


@functools.lru_cache(maxsize=None)
def _get_plan(n: int, inverse: bool) -> FusedNTTPlan:
    return FusedNTTPlan(n, inverse)


# -- in-kernel u32 field primitives (pure lane math, see ops/fieldops) ------

def _addmod(a, b):
    s = a + b
    return jnp.where(s >= jnp.uint32(P), s - jnp.uint32(P), s)


def _submod(a, b):
    d = a - b
    return jnp.where(a >= b, d, d + jnp.uint32(P))


def _mulhi32(a, b):
    m16 = jnp.uint32(0xFFFF)
    a0 = a & m16
    a1 = a >> 16
    b0 = b & m16
    b1 = b >> 16
    lo = a0 * b0
    mid1 = a1 * b0
    mid2 = a0 * b1
    hi = a1 * b1
    carry = ((lo >> 16) + (mid1 & m16) + (mid2 & m16)) >> 16
    return hi + (mid1 >> 16) + (mid2 >> 16) + carry


def _shoup(a, w, ws):
    q = _mulhi32(a, ws)
    r = a * w - q * jnp.uint32(P)
    return jnp.where(r >= jnp.uint32(P), r - jnp.uint32(P), r)


# -- lazy ([0, 2p)-range) variants, see _LAZY_DEFAULT ----------------------

_TWO_P = 2 * P  # 1996488706 < 2^31


def _addmod_lazy(a, b):
    """a + b with a, b in [0, 2p) -> [0, 2p); sum < 4p < 2^32."""
    s = a + b
    return jnp.where(s >= jnp.uint32(_TWO_P), s - jnp.uint32(_TWO_P), s)


def _sub_lazy(a, b):
    """a - b + 2p with a, b in [0, 2p) -> (0, 4p); no select."""
    return a - b + jnp.uint32(_TWO_P)


def _shoup_lazy(a, w, ws):
    """w*a mod p + {0, p}, any a < 2^32, w < p; no final correction."""
    q = _mulhi32(a, ws)
    return a * w - q * jnp.uint32(P)


_PINV_NEG = (-pow(P, -1, 1 << 32)) % (1 << 32)


def _mont_mul(a, b):
    """REDC(a*b) for a, b in [0, p) — see ops/fieldops.mont_mul."""
    lo = a * b
    hi = _mulhi32(a, b)
    m = lo * jnp.uint32(_PINV_NEG)
    mp_hi = _mulhi32(m, jnp.uint32(P))
    carry = (lo != jnp.uint32(0)).astype(jnp.uint32)
    u = hi + mp_hi + carry
    return jnp.where(u >= jnp.uint32(P), u - jnp.uint32(P), u)


def _dif_col_stages(x_ref, o_ref, scratch_ref, stw_ref, stws_ref, lazy=False):
    """In-place radix-2 DIF column NTT along axis 0 of the (N, T) block in
    ``x_ref``; result (rows bit-reversed) written to ``o_ref``.

    Stage s, block size m = N >> s, half = m/2: row i pairs with i^half.
    Two formulations, both writing the same in-place DIF layout:

    * half >= 8 (sublane-aligned): reshape the value to (2^s, m, T) —
      a free leading-dim split — and slice the block halves contiguously.
      The butterfly then does the add on the top half and the sub+Shoup
      multiply on the bottom half ONLY: 0.5 twiddle muls per element per
      stage, versus 1.0 for the masked scheme below (which evaluates the
      multiply everywhere and selects).  The kernel is VPU-compute-bound
      (~20 ops/element/stage, dominated by the 16x16-limb mulhi), so this
      halves the hot path for all but the last three stages.
    * half < 8: sub-sublane slicing would force Mosaic relayouts; partner
      rows arrive via two sublane rotations (roll +-half) and the iota
      mask selects — uniform, no reshapes.

    Stages ping-pong o_ref/scratch_ref so peak VMEM stays ~2 blocks of
    temporaries regardless of log2(N).
    """
    N, T = x_ref.shape
    lg = N.bit_length() - 1
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    refs = [o_ref, scratch_ref] if lg % 2 == 0 else [scratch_ref, o_ref]
    add = _addmod_lazy if lazy else _addmod
    sub = _sub_lazy if lazy else _submod
    twmul = _shoup_lazy if lazy else _shoup
    src = x_ref
    for s in range(lg):
        half = (N >> s) >> 1
        a = src[:]
        dst = refs[(s + 1) % 2]
        if half >= 8:
            bs, m = 1 << s, N >> s
            a3 = a.reshape(bs, m, T)
            u = a3[:, :half, :]
            v = a3[:, half:, :]
            # Block 0's bottom rows of the dense table hold w^(j*2^s).
            w = stw_ref[half : 2 * half, s : s + 1].reshape(1, half, 1)
            ws = stws_ref[half : 2 * half, s : s + 1].reshape(1, half, 1)
            top = add(u, v)
            bot = twmul(sub(u, v), w, ws)
            dst[:] = jnp.concatenate([top, bot], axis=1).reshape(N, T)
        else:
            down = pltpu.roll(a, N - half, axis=0)  # a[i+half] -> row i
            up = pltpu.roll(a, half, axis=0)        # a[i-half] -> row i
            sel = (ii & half) == 0
            u = jnp.where(sel, a, up)
            v = jnp.where(sel, down, a)
            tw = twmul(
                sub(u, v), stw_ref[:, s : s + 1], stws_ref[:, s : s + 1]
            )
            dst[:] = jnp.where(sel, add(u, v), tw)
        src = dst


def _pass1_body(x_ref, stw_ref, stws_ref, wm_ref, o_ref, scratch_ref, lazy=False):
    _dif_col_stages(x_ref, o_ref, scratch_ref, stw_ref, stws_ref, lazy=lazy)
    # REDC absorbs the lazy [0, 2p) range (u < 1.47p before its final
    # select), so pass 1's output is fully reduced either way.
    o_ref[:] = _mont_mul(o_ref[:], wm_ref[:])


def _pass2_body(x_ref, stw_ref, stws_ref, o_ref, scratch_ref, lazy=False):
    _dif_col_stages(x_ref, o_ref, scratch_ref, stw_ref, stws_ref, lazy=lazy)
    if lazy:  # one final conditional subtract brings [0, 2p) -> [0, p)
        o = o_ref[:]
        o_ref[:] = jnp.where(o >= jnp.uint32(P), o - jnp.uint32(P), o)


def _transpose_body(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


def _pallas_transpose(y, interpret: bool):
    """(a, b) -> (b, a) via square VMEM blocks.

    XLA's u32 transpose runs at ~64 GB/s effective (measured ~0.5 ms for
    2048^2); square 512-blocks through the XLU hit ~0.1 ms — near HBM
    bandwidth.  Wide-slab in-kernel transposes ((128, 2048)) are ~9x
    slower than square blocks: keep blocks square."""
    a, b = y.shape
    blk = min(512, a, b)
    if a % blk or b % blk:
        return y.T  # fallback: shapes outside the supported grid
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    )
    return pl.pallas_call(
        _transpose_body,
        grid=(a // blk, b // blk),
        in_specs=[
            pl.BlockSpec((blk, blk), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (blk, blk), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, a), y.dtype),
        compiler_params=params,
        interpret=interpret,
    )(y)


@functools.partial(
    jax.jit, static_argnames=("n", "inverse", "interpret", "lazy")
)
def _fused_ntt_jit(
    x, n: int, inverse: bool, interpret: bool = False, lazy: bool = False
):
    plan = _get_plan(n, inverse)
    n1, n2 = plan.n1, plan.n2
    lg1 = n1.bit_length() - 1
    lg2 = n2.bit_length() - 1
    x2 = x.reshape(n1, n2)
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    )
    t1 = min(_T_PASS1, n2)
    t2 = min(_T_PASS2, n1)

    vec = pl.BlockSpec((n1, t1), lambda j: (0, j), memory_space=pltpu.VMEM)
    stspec1 = pl.BlockSpec(
        (n1, lg1), lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    y = pl.pallas_call(
        functools.partial(_pass1_body, lazy=lazy),
        grid=(n2 // t1,),
        in_specs=[vec, stspec1, stspec1, vec],
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((n1, t1), jnp.uint32)],
        compiler_params=params,
        interpret=interpret,
    )(
        x2,
        jnp.asarray(plan.stages1[0]),
        jnp.asarray(plan.stages1[1]),
        jnp.asarray(plan.wm),
    )

    # Undo pass 1's bit-reversal (row gather: contiguous rows, bandwidth
    # cost only) and transpose to (n2, n1) for the second pass.
    yt = _pallas_transpose(
        jnp.take(y, jnp.asarray(plan.perm1), axis=0), interpret
    )

    vec2 = pl.BlockSpec((n2, t2), lambda j: (0, j), memory_space=pltpu.VMEM)
    stspec2 = pl.BlockSpec(
        (n2, lg2), lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    z = pl.pallas_call(
        functools.partial(_pass2_body, lazy=lazy),
        grid=(n1 // t2,),
        in_specs=[vec2, stspec2, stspec2],
        out_specs=vec2,
        out_shape=jax.ShapeDtypeStruct((n2, n1), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((n2, t2), jnp.uint32)],
        compiler_params=params,
        interpret=interpret,
    )(yt, jnp.asarray(plan.stages2[0]), jnp.asarray(plan.stages2[1]))
    # Undo pass 2's bit-reversal; the (n2, n1) C-order IS the natural
    # output: out[k1 + n1*k2] = Z[k1, k2].
    return jnp.take(z, jnp.asarray(plan.perm2), axis=0).reshape(n)


def fused_ntt(
    x,
    inverse: bool = False,
    interpret: bool = False,
    lazy: bool | None = None,
):
    """(n,) uint32 in [0, p) -> length-n (i)NTT, natural order.

    Same contract as ops/ntt.ntt / ops/ntt.intt (which are the oracle).
    ``lazy`` selects the Harvey [0, 2p)-range butterflies (bit-identical
    output; see _LAZY_DEFAULT)."""
    x = jnp.asarray(x, dtype=jnp.uint32)
    if lazy is None:
        lazy = _LAZY_DEFAULT
    return _fused_ntt_jit(x, x.shape[-1], inverse, interpret, lazy)


def fused_available(n: int, shape) -> bool:
    """True when the fused engine should handle this transform."""
    if os.environ.get("STARK_TPU_FUSED_NTT", "1") != "1":
        return False
    if len(shape) != 1 or n < _MIN_FUSED:
        return False
    if n & (n - 1) != 0 or (n >> ((n.bit_length() - 1) >> 1)) % _LANES != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False
