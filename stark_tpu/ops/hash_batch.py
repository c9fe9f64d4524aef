"""Device-vectorized commitment hash: N leaves hashed in parallel.

Bit-exact with the scalar engine (stark_tpu/hashfn.py, itself bit-exact with
reference src/hash.rs).  The 32-byte state is laid out as a (32, N) uint32
array — state byte positions along the sublane axis, leaves along the lane
axis — so every hash step is a full-width VPU op across all leaves:

* sbox / XOR-group mixing / round constants: single elementwise ops;
* the reference's sequential in-place neighbor diffusion (hash.rs:77-81)
  is algebraically a prefix sum mod 256 and becomes one ``cumsum``;
* only the absorb XOR-chain (hash.rs:14-23) is inherently sequential —
  it is unrolled (8 steps per leaf word, 32 per digest chunk), each step
  still vectorized across all N leaves.

The same code runs under numpy (for small widths, avoiding per-shape XLA
compiles at the top of Merkle trees) and jax.numpy (jitted, for the wide
levels): pass ``xp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.hashfn import PRIMES, ROUND_CONSTANTS

_MASK8 = 0xFF


def _rotl8(xp, x, n: int):
    return ((x << n) | (x >> (8 - n))) & _MASK8


def _sbox(xp, x):
    # hash.rs:88-94 — mul 251 (mod 256), rotl 1, xor 0x63
    return _rotl8(xp, (x * 251) & _MASK8, 1) ^ 0x63


def _mix(xp, state):
    """(32, N) -> (32, N), one mix round (hash.rs:59-86)."""
    s = _sbox(xp, state)
    g = s.reshape(8, 4, -1)
    t0, t1, t2, t3 = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    s = xp.stack(
        [t0 ^ t1 ^ t3, t0 ^ t2 ^ t3, t0 ^ t1 ^ t2, t1 ^ t2 ^ t3], axis=1
    ).reshape(32, -1)
    # Neighbor diffusion == prefix sum (see hashfn._mix_state derivation).
    d = xp.concatenate(
        [(s[0] + s[1] + s[31])[None], s[1:31] + s[2:32]], axis=0
    )  # (31, N); values < 3*255*31 << 2^32: safe in uint32
    new = xp.cumsum(d, axis=0)
    last = (s[31] + new[0] + new[30])[None]
    s = xp.concatenate([new, last], axis=0) & _MASK8
    rc = ROUND_CONSTANTS.astype(np.uint32)[:, None]
    return (s + rc) & _MASK8


def _init_state(xp, n, dtype):
    init = np.tile(PRIMES, 2).astype(np.uint32)  # hash.rs:10-12
    return xp.broadcast_to(xp.asarray(init, dtype=dtype)[:, None], (32, n))


def _absorb_rows(xp, state, rows):
    """Absorb one <=32-byte chunk given as a list of (N,) byte rows.

    Unrolled hash.rs:14-23: state rows are kept as a Python list so each
    sequential step is a pure (N,)-vector op with no scatter.
    """
    s = [state[i] for i in range(32)]
    for i, byte in enumerate(rows):
        s[i] = _rotl8(xp, (s[i] + byte) & _MASK8, 3)
        s[(i + 7) % 32] = s[(i + 7) % 32] ^ s[i]
    return xp.stack(s, axis=0)


def _leaf_rows(xp, values):
    """8 LE byte rows of u64(values); values are reduced (< p < 2^32), so the
    top four bytes are zero — matching Hash::from_field_elements of a single
    value (hash.rs:32-35)."""
    v = values.astype(jnp.uint32) if xp is jnp else values.astype(np.uint32)
    zero = xp.zeros_like(v)
    return [
        v & _MASK8,
        (v >> 8) & _MASK8,
        (v >> 16) & _MASK8,
        (v >> 24) & _MASK8,
        zero,
        zero,
        zero,
        zero,
    ]


def leaf_hash_core(xp, values):
    """(N,) uint32 field values -> (32, N) digests.

    Equals Hash::from_field_elements(&[v]) per leaf: one 8-byte chunk,
    one mix, then 8 final mixes (hash.rs:7-30).
    """
    dtype = values.dtype
    state = _init_state(xp, values.shape[0], dtype)
    state = _absorb_rows(xp, state, _leaf_rows(xp, values))
    for _ in range(1 + 8):
        state = _mix(xp, state)
    return state


def combine_core(xp, left, right):
    """(32, N) x (32, N) digests -> (32, N) combined digests.

    Equals Hash::combine per lane: 64-byte input = two 32-byte chunks,
    mix after each, plus 8 final mixes (hash.rs:41-46 + 7-30).
    """
    state = _init_state(xp, left.shape[1], left.dtype)
    state = _absorb_rows(xp, state, [left[i] for i in range(32)])
    state = _mix(xp, state)
    state = _absorb_rows(xp, state, [right[i] for i in range(32)])
    for _ in range(1 + 8):
        state = _mix(xp, state)
    return state


def row_hash_core(xp, values):
    """(c, N) uint32 field values -> (32, N) digests.

    Equals Hash::from_field_elements(row) per lane: the row's c values as
    LE u64s (8c bytes), absorbed in 32-byte chunks with a mix after each
    chunk, plus 8 final mixes (hash.rs:7-35).
    """
    c, n = values.shape
    dtype = values.dtype
    byte_rows = []
    for r in range(c):
        byte_rows.extend(_leaf_rows(xp, values[r]))
    state = _init_state(xp, n, dtype)
    for start in range(0, len(byte_rows), 32):
        state = _absorb_rows(xp, state, byte_rows[start : start + 32])
        state = _mix(xp, state)
    for _ in range(8):
        state = _mix(xp, state)
    return state


# -- jitted device entry points --------------------------------------------

leaf_hash = jax.jit(functools.partial(leaf_hash_core, jnp))
row_hash = jax.jit(functools.partial(row_hash_core, jnp))
combine = jax.jit(functools.partial(combine_core, jnp))


@jax.jit
def merkle_level(nodes):
    """(32, N) node digests -> (32, N/2) parent digests (pairwise combine)."""
    return combine_core(jnp, nodes[:, 0::2], nodes[:, 1::2])


def merkle_level_np(nodes: np.ndarray) -> np.ndarray:
    return combine_core(np, nodes[:, 0::2], nodes[:, 1::2])


def leaf_hash_np(values: np.ndarray) -> np.ndarray:
    return leaf_hash_core(np, values.astype(np.uint32))


def digests_to_bytes(digests) -> np.ndarray:
    """(32, N) uint32 byte-value digests -> (N, 32) uint8 array."""
    return np.asarray(digests, dtype=np.uint32).astype(np.uint8).T.copy()


def bytes_to_digests(arr: np.ndarray):
    """(N, 32) uint8 -> (32, N) uint32."""
    return arr.astype(np.uint32).T.copy()
