"""Mesh-sharded NTT: the four-step (transpose) algorithm over ICI.

The reference has no NTT at all — its polynomial multiply is O(n^2)
schoolbook (reference src/univariate/mul.rs:6-29) and interpolation O(n^3)
Lagrange (interpolate.rs:6-44), single-threaded.  The single-chip
replacement is :mod:`stark_tpu.ops.ntt`; this module scales it across a
1-D device mesh with the classic four-step decomposition, the
"Ulysses-style" sequence-parallel analogue called for by SURVEY §5:

With n = R*C, j = C*j1 + j2, k = R*k2 + k1 and w the n-th root:

    X[R*k2 + k1] = NTT_C over j2 [ w^(j2*k1) * NTT_R over j1 [ M[j1, j2] ] ]

so a size-n transform becomes two batches of *local* size-R / size-C
transforms (the cached Stockham kernels of ops/ntt.py) separated by
``all_to_all`` transposes that ride ICI.  Data stays contiguously sharded:
device d holds global indices [d*n/D, (d+1)*n/D) on input AND output, so
sharded codewords flow directly into sharded leaf hashing / folding with no
resharding.

Cost per transform: 3 all_to_alls of n/D elements each + 2 local NTT passes
— the local passes are (n/D)*log(n) work, giving the >=80% scaling
efficiency target headroom (BASELINE.md config 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from stark_tpu.ops import fieldops as F
from stark_tpu.ops.fieldops import P as PRIME
from stark_tpu.ops.ntt import _ntt_core, get_plan
from stark_tpu.parallel.mesh import AXIS


@functools.lru_cache(maxsize=None)
def _fourstep_consts(n: int, inverse: bool):
    """(R, C, twiddle (C, R) uint32, shoup companions (C, R) uint32).

    T[j2, k1] = w^(±j2*k1); exponents j2*k1 < C*R = n index a length-n
    power table directly.
    """
    log2n = n.bit_length() - 1
    R = 1 << ((log2n + 1) // 2)
    C = n // R
    from stark_tpu.ops.fieldops import primitive_nth_root

    w = primitive_nth_root(n)
    if inverse:
        w = pow(w, PRIME - 2, PRIME)
    pow_table = F.host_powers(w, n)  # uint32 (n,)
    j2 = np.arange(C, dtype=np.int64)[:, None]
    k1 = np.arange(R, dtype=np.int64)[None, :]
    tw = pow_table[(j2 * k1)]  # (C, R)
    tws = F.shoup_precompute(tw)
    return R, C, tw, tws


def _local_fourstep(x, tw, tws, *, R: int, C: int, D: int, inverse: bool):
    """Per-device body (under shard_map): x is this device's contiguous
    (..., n/D) chunk; tw/tws are this device's (C/D, R) twiddle rows."""
    batch = x.shape[:-1]
    nb = len(batch)
    x = x.reshape(batch + (R // D, C))
    # transpose 1: row-shards -> column-shards        [j1, j2_local]
    if D > 1:
        x = jax.lax.all_to_all(
            x, AXIS, split_axis=nb + 1, concat_axis=nb, tiled=True
        )
    # local size-R NTT over j1 (root w^C == primitive R-th root)
    x = _ntt_core(jnp.swapaxes(x, nb, nb + 1), get_plan(R, inverse))
    x = F.shoup_mul(x, tw, tws)                       # twiddle w^(j2*k1)
    # transpose 2: column-shards -> k1-shards          [j2, k1_local]
    if D > 1:
        x = jax.lax.all_to_all(
            x, AXIS, split_axis=nb + 1, concat_axis=nb, tiled=True
        )
    # local size-C NTT over j2 (root w^R == primitive C-th root)
    x = _ntt_core(jnp.swapaxes(x, nb, nb + 1), get_plan(C, inverse))
    # transpose 3: back to natural contiguous order of X[R*k2 + k1]
    x = jnp.swapaxes(x, nb, nb + 1)                   # [k2, k1_local]
    if D > 1:
        x = jax.lax.all_to_all(
            x, AXIS, split_axis=nb, concat_axis=nb + 1, tiled=True
        )
    return x.reshape(batch + (R * C // D,))           # (..., n/D) chunk of X


import os

#: Number of independent (exchange -> butterfly) chains each four-step
#: phase is split into (comm/compute overlap, BASELINE.md config 5's
#: ">=80% requires overlap" accounting).  1 = the monolithic variant.
#: Clamped per transform so every chunk keeps >= 1 column per device.
try:
    OVERLAP_CHUNKS = max(1, int(os.environ.get("STARK_TPU_NTT_OVERLAP", "4")))
except ValueError:
    OVERLAP_CHUNKS = 4


def _local_fourstep_overlap(x, tw, tws, *, R: int, C: int, D: int,
                            inverse: bool, K: int):
    """Chunked four-step body: BIT-IDENTICAL to :func:`_local_fourstep`,
    but every phase's single blocking ``all_to_all`` becomes ``K``
    INDEPENDENT (exchange -> local butterflies) chains, so XLA's async
    collective scheduler can hide chunk i+1's exchange under chunk i's
    NTT work (a monolithic all_to_all has nothing concurrent to hide
    behind — the whole pipeline stalls for the wire).

    Layout invariant: chunk slices are STRIDED — the exchanged axis is
    viewed as (D, K, sub) and chunk k takes [:, k, :] — so each chunked
    exchange still lands every device with a contiguous span of its
    global range, and concatenating chunks in order reproduces the
    monolithic layout exactly (same values, same order => same bytes
    all the way to the proof).  Phases 2 and 3 pipeline PER CHUNK
    (exchange -> size-C NTT -> exchange), overlapping the third
    transpose with other chunks' butterflies; a final local (K, D)
    axis transpose restores k1 order.
    """
    batch = x.shape[:-1]
    nb = len(batch)
    Csub, Rsub = C // (D * K), R // (D * K)
    # -- phase 1: j2-chunked [transpose 1 + size-R NTT + twiddle] -------
    x = x.reshape(batch + (R // D, D, K, Csub))
    cols = []
    for k in range(K):
        sl = x[..., :, :, k, :].reshape(batch + (R // D, D * Csub))
        if D > 1:
            sl = jax.lax.all_to_all(
                sl, AXIS, split_axis=nb + 1, concat_axis=nb, tiled=True
            )
        sl = _ntt_core(jnp.swapaxes(sl, nb, nb + 1), get_plan(R, inverse))
        cols.append(
            F.shoup_mul(
                sl,
                tw[k * Csub : (k + 1) * Csub],
                tws[k * Csub : (k + 1) * Csub],
            )
        )
    x = jnp.concatenate(cols, axis=nb)                # (batch, C/D, R)
    # -- phases 2+3: k1-chunked [transpose 2 + size-C NTT + transpose 3]
    x = x.reshape(batch + (C // D, D, K, Rsub))
    outs = []
    for k in range(K):
        sl = x[..., :, :, k, :].reshape(batch + (C // D, D * Rsub))
        if D > 1:
            sl = jax.lax.all_to_all(
                sl, AXIS, split_axis=nb + 1, concat_axis=nb, tiled=True
            )
        sl = _ntt_core(jnp.swapaxes(sl, nb, nb + 1), get_plan(C, inverse))
        sl = jnp.swapaxes(sl, nb, nb + 1)             # (batch, C, Rsub)
        if D > 1:
            sl = jax.lax.all_to_all(
                sl, AXIS, split_axis=nb, concat_axis=nb + 1, tiled=True
            )
        outs.append(sl.reshape(batch + (C // D, D, Rsub)))
    # chunk k's last axis holds k1 = e*R/D + k*Rsub + r: stack to
    # (C/D, K, D, Rsub) and swap (K, D) -> (D, K) for natural k1 order.
    x = jnp.stack(outs, axis=nb + 1)                  # (batch, C/D, K, D, Rsub)
    x = jnp.swapaxes(x, nb + 1, nb + 2)               # (batch, C/D, D, K, Rsub)
    return x.reshape(batch + (R * C // D,))           # (..., n/D) chunk of X


@functools.lru_cache(maxsize=None)
def _sharded_ntt_fn(mesh: Mesh, n: int, inverse: bool, nb: int, K: int):
    D = mesh.devices.size
    assert n % (D * D) == 0, (
        f"sharded NTT needs D^2 | n (n={n}, D={D}); gather smaller transforms"
    )
    R, C, tw, tws = _fourstep_consts(n, inverse)
    K = max(1, min(K, min(R, C) // D))
    if K > 1:
        body = functools.partial(
            _local_fourstep_overlap, R=R, C=C, D=D, inverse=inverse, K=K
        )
    else:
        body = functools.partial(
            _local_fourstep, R=R, C=C, D=D, inverse=inverse
        )
    batch_spec = (None,) * nb
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(*batch_spec, AXIS), P(AXIS, None), P(AXIS, None)),
        out_specs=P(*batch_spec, AXIS),
    )
    jfn = jax.jit(fn)
    tw_j = jax.device_put(jnp.asarray(tw), jax.NamedSharding(mesh, P(AXIS, None)))
    tws_j = jax.device_put(jnp.asarray(tws), jax.NamedSharding(mesh, P(AXIS, None)))
    return lambda x: jfn(x, tw_j, tws_j)


def sharded_ntt(x, mesh: Mesh, overlap: int | None = None):
    """Forward NTT of a (..., n) uint32 array sharded on its last axis.

    ``overlap`` chunks each transpose into that many independent
    exchange/compute chains (default :data:`OVERLAP_CHUNKS`); bytes are
    identical for every value."""
    K = OVERLAP_CHUNKS if overlap is None else overlap
    return _sharded_ntt_fn(mesh, x.shape[-1], False, x.ndim - 1, K)(x)


def sharded_intt(x, mesh: Mesh, overlap: int | None = None):
    """Inverse NTT (includes the 1/n scale, split as 1/R * 1/C locally)."""
    K = OVERLAP_CHUNKS if overlap is None else overlap
    return _sharded_ntt_fn(mesh, x.shape[-1], True, x.ndim - 1, K)(x)


# ---------------------------------------------------------------------------
# Coset evaluation / interpolation / LDE (sharded).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _coset_scale_arrays(mesh: Mesh, n: int, offset: int, invert: bool):
    off = pow(offset % PRIME, PRIME - 2, PRIME) if invert else offset % PRIME
    ladder = F.host_powers(off, n)
    sh = jax.NamedSharding(mesh, P(AXIS))
    return (
        jax.device_put(jnp.asarray(ladder), sh),
        jax.device_put(jnp.asarray(F.shoup_precompute(ladder)), sh),
    )


@jax.jit
def _scale(x, w, ws):
    return F.shoup_mul(x, w, ws)


def sharded_coset_eval(coeffs, offset: int, mesh: Mesh):
    """Evaluate on {offset * omega^i}: sharded analogue of ops.ntt.coset_eval."""
    n = coeffs.shape[-1]
    if offset % PRIME != 1:
        w, ws = _coset_scale_arrays(mesh, n, offset, False)
        coeffs = _scale(coeffs, w, ws)
    return sharded_ntt(coeffs, mesh)


def sharded_coset_interp(values, offset: int, mesh: Mesh):
    """Interpolate values on {offset * omega^i}: sharded coset iNTT."""
    n = values.shape[-1]
    c = sharded_intt(values, mesh)
    if offset % PRIME != 1:
        w, ws = _coset_scale_arrays(mesh, n, offset, True)
        c = _scale(c, w, ws)
    return c


def sharded_lde(coeffs, blowup: int, offset: int, mesh: Mesh):
    """Zero-pad (..., n) coefficients to n*blowup and coset-evaluate, sharded.

    The padded array is laid out contiguously across the mesh; the pad is
    materialized with the target sharding so no gather of the coefficient
    array is needed beyond XLA's own resharding of the small prefix.
    """
    n = coeffs.shape[-1]
    N = n * blowup
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, N - n)]
    sh = jax.NamedSharding(mesh, P(*((None,) * (coeffs.ndim - 1)), AXIS))
    padded = jax.jit(lambda c: jnp.pad(c, pad), out_shardings=sh)(coeffs)
    return sharded_coset_eval(padded, offset, mesh)
