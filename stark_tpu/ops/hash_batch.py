"""Device-vectorized commitment hash: N leaves hashed in parallel.

Bit-exact with the scalar engine (stark_tpu/hashfn.py, itself bit-exact with
reference src/hash.rs).  The 32-byte state is carried as a Python list of 32
``(N,)`` uint8 rows (mod-256 wrapping IS the hash arithmetic, and int8
lanes are 4x denser on the VPU) — leaves along the lane axis — so every hash step is a
full-width VPU op across all leaves AND the whole multi-round computation is
a single fuseable elementwise chain (no (32, N) stacking, no cumsum: XLA
fuses the ~1000-op graph into a handful of kernels that read the leaf
values once and write the 32 digest rows once, which is the HBM
speed-of-light for this op).

* sbox / XOR-group mixing / round constants: elementwise per row;
* the reference's sequential in-place neighbor diffusion (hash.rs:77-81)
  is an unrolled 31-step add chain over rows (loop-carried but elementwise,
  so it fuses);
* the absorb XOR-chain (hash.rs:14-23) is likewise unrolled per byte row.

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


def _rotl8(x, n: int):
    return ((x << n) | (x >> (8 - n))) & _MASK8


def _sbox(x):
    # hash.rs:88-94 — mul 251 (mod 256), rotl 1, xor 0x63
    return _rotl8((x * 251) & _MASK8, 1) ^ 0x63


def _mix_rows(s):
    """One mix round (hash.rs:59-86) on a list of 32 (N,) rows."""
    s = [_sbox(r) for r in s]
    # 4-byte-group XOR mixing (hash.rs:63-75)
    out = []
    for g in range(8):
        t0, t1, t2, t3 = s[4 * g : 4 * g + 4]
        out += [t0 ^ t1 ^ t3, t0 ^ t2 ^ t3, t0 ^ t1 ^ t2, t1 ^ t2 ^ t3]
    s = out
    # Neighbor diffusion (hash.rs:77-81): the reference mutates in place,
    # i = 0..31: s[i] += s[i+1 mod 32] + s[i-1 wrapping already-updated],
    # i.e. new[0] = old0+old1+old31; new[i] = new[i-1]+old[i]+old[i+1]
    # (1<=i<=30); new[31] = old31+new[0]+new[30].  Unrolled; uint8 wrapping
    # IS the mod-256 the reference applies, so no masking is needed.
    new = [None] * 32
    new[0] = s[0] + s[1] + s[31]
    for i in range(1, 31):
        new[i] = new[i - 1] + s[i] + s[i + 1]
    new[31] = s[31] + new[0] + new[30]
    # Round constants (hash.rs:83-85), wrapping add
    rc = ROUND_CONSTANTS
    return [(new[i] + int(rc[i])) & _MASK8 for i in range(32)]


# ---------------------------------------------------------------------------
# Stacked-state mix: the 32 byte rows carried as ONE (32, ...) u8 array.
#
# The row-list mix (~250 tiny ops) is the right shape for the WIDE
# bandwidth-bound kernels, where XLA fuses the unrolled chain into a few
# HBM passes.  But on the LATENCY-bound paths — the fused tree tails, the
# device transcript hashes, the index sampler — each round's cost is op
# ISSUE, not bytes: ~250 sequential VPU ops on near-empty vectors.
# Stacking the state makes every mix step one full-array op:
#
# * sbox: 3 ops on the whole (32, ...) array (mul-251/rotl/xor);
# * the 4-byte-group XOR mixing (hash.rs:63-75): reshape to (8, 4, ...),
#   4 stacked combinations, reshape back — ~8 ops;
# * the sequential neighbor diffusion (hash.rs:77-81) is a PREFIX SUM:
#   new[i] = new[i-1] + s[i] + s[i+1] telescopes to cumsum(v) with
#   v[0] = s[0]+s[1]+s[31], v[i] = s[i]+s[i+1] — one u8 cumsum along the
#   byte axis (log-depth in XLA) instead of 31 chained adds, with the
#   special-cased new[31] = s[31] + new[0] + new[30] appended;
# * round constants: one broadcast add.
#
# ~20 ops per mix, ~12x fewer than the row-list form; uint8 wrapping IS
# the hash's mod-256 arithmetic throughout (cumsum mod 256 is associative,
# so XLA's log-step scan computes the same bytes).
# ---------------------------------------------------------------------------

def _rc_for(s):
    rc = jnp.asarray(ROUND_CONSTANTS, dtype=jnp.uint8)
    return rc.reshape((32,) + (1,) * (s.ndim - 1))


def _mix_stacked(s):
    """One mix round (hash.rs:59-86) on a stacked (32, ...) u8 state."""
    x = _rotl8(s * jnp.uint8(251), 1) ^ jnp.uint8(0x63)
    t = x.reshape((8, 4) + x.shape[1:])
    t0, t1, t2, t3 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    g = jnp.stack(
        [t0 ^ t1 ^ t3, t0 ^ t2 ^ t3, t0 ^ t1 ^ t2, t1 ^ t2 ^ t3], axis=1
    ).reshape(x.shape)
    v = g + jnp.roll(g, -1, axis=0)
    v = v.at[0].add(g[31])
    c = jnp.cumsum(v, axis=0, dtype=jnp.uint8)
    last = g[31] + c[0] + c[30]
    out = jnp.concatenate([c[:31], last[None]], axis=0)
    return out + _rc_for(s)


def _absorb_stacked(s, chunk):
    """Absorb one <=32-byte chunk (hash.rs:14-23) on a stacked state.
    ``chunk``: (k, ...) u8, k <= 32.  The absorb recurrence feeds forward
    (s[i+7] ^= s[i] affects a later read), so it stays sequential — but
    it is only ~2 ops per byte, unlike the mix."""
    k = chunk.shape[0]
    for i in range(k):
        s = s.at[i].set(_rotl8(s[i] + chunk[i], 3))
        j = (i + 7) % 32
        s = s.at[j].set(s[j] ^ s[i])
    return s


def _mix_stacked_loop(s, n: int):
    if n <= 0:
        return s
    s = _mix_stacked(s)  # keeps the carry type-stable under shard_map
    return jax.lax.fori_loop(0, n - 1, lambda i, a: _mix_stacked(a), s)


def _combine_stacked(left, right):
    """Hash::combine on stacked (32, ...) u8 digests (hash.rs:41-46):
    two 32-byte chunks, a mix after each, plus 8 final mixes — all in
    stacked form (the latency-optimal shape for narrow widths)."""
    s = _init_stacked(left.shape[1:])
    s = _absorb_stacked(s, left)
    s = _mix_stacked(s)
    s = _absorb_stacked(s, right)
    return _mix_stacked_loop(s, 1 + 8)


def _init_stacked(shape):
    init = jnp.asarray(np.tile(PRIMES, 2), dtype=jnp.uint8)
    return jnp.broadcast_to(
        init.reshape((32,) + (1,) * len(shape)), (32,) + tuple(shape)
    )


def _mix_rows_loop(s, n: int):
    """``n`` identical mix rounds on a LIST of 32 rows, routed through the
    stacked-state mix (one stack + n low-op-count rounds + 32 slices) —
    the row-list API kept for the absorb-side callers.

    The mix round is data-independent — hash.rs:59-86 applies the SAME
    constants table every round — so the body is traced once; stacking
    also makes the fori_loop carry type-stable under shard_map (every
    row rides one varying array)."""
    if n == 0:
        return list(s)
    st = _mix_stacked_loop(jnp.stack(list(s), axis=0), n)
    return [st[i] for i in range(32)]


def _init_rows(xp, shape):
    if isinstance(shape, int):
        shape = (shape,)
    init = np.tile(PRIMES, 2)  # hash.rs:10-12
    return [xp.full(shape, int(init[i]), dtype=np.uint8) for i in range(32)]


def _absorb_rows(s, rows):
    """Absorb one <=32-byte chunk given as a list of (N,) byte rows.

    Unrolled hash.rs:14-23; each sequential step is a pure (N,)-vector op.
    """
    s = list(s)
    for i, byte in enumerate(rows):
        s[i] = _rotl8((s[i] + byte) & _MASK8, 3)
        s[(i + 7) % 32] = s[(i + 7) % 32] ^ s[i]
    return s


def _value_rows(values):
    """8 LE byte rows of u64(values) as uint8; values are reduced
    (< p < 2^32), so the top four bytes are zero — matching
    Hash::from_field_elements of a single value (hash.rs:32-35)."""
    v = values
    b = np.uint8 if isinstance(v, np.ndarray) else jnp.uint8
    zero = (v & 0).astype(b)
    return [
        (v & _MASK8).astype(b),
        ((v >> 8) & _MASK8).astype(b),
        ((v >> 16) & _MASK8).astype(b),
        ((v >> 24) & _MASK8).astype(b),
        zero,
        zero,
        zero,
        zero,
    ]


def _stack(xp, rows):
    return xp.stack(rows, axis=0)


def _final_mixes(xp, state, n_rounds: int, rolled: bool):
    if rolled and xp is jnp:
        return _mix_rows_loop(state, n_rounds)
    for _ in range(n_rounds):
        state = _mix_rows(state)
    return state


def leaf_hash_core(xp, values, rolled: bool = False):
    """(N,) uint32 field values -> (32, N) digests.

    Equals Hash::from_field_elements(&[v]) per leaf: one 8-byte chunk,
    one mix, then 8 final mixes (hash.rs:7-30).
    """
    values = values.astype(np.uint32) if xp is np else values
    state = _init_rows(xp, values.shape[0])
    state = _absorb_rows(state, _value_rows(values))
    state = _final_mixes(xp, state, 1 + 8, rolled)
    return _stack(xp, state)


def combine_core(xp, left, right, rolled: bool = False):
    """(32, N) x (32, N) digests -> (32, N) combined digests.

    Equals Hash::combine per lane: 64-byte input = two 32-byte chunks,
    mix after each, plus 8 final mixes (hash.rs:41-46 + 7-30).
    """
    state = _init_rows(xp, left.shape[1])
    state = _absorb_rows(state, [left[i] for i in range(32)])
    state = _mix_rows(state)
    state = _absorb_rows(state, [right[i] for i in range(32)])
    state = _final_mixes(xp, state, 1 + 8, rolled)
    return _stack(xp, state)


def row_hash_core(xp, values, rolled: bool = False):
    """(c, N) uint32 field values -> (32, N) digests.

    Equals Hash::from_field_elements(row) per lane: the row's c values as
    LE u64s (8c bytes), absorbed in 32-byte chunks with a mix after each
    chunk, plus 8 final mixes (hash.rs:7-35).
    """
    c, n = values.shape
    byte_rows = []
    for r in range(c):
        byte_rows.extend(_value_rows(values[r]))
    state = _init_rows(xp, n)
    for start in range(0, len(byte_rows), 32):
        state = _absorb_rows(state, byte_rows[start : start + 32])
        state = _mix_rows(state)
    state = _final_mixes(xp, state, 8, rolled)
    return _stack(xp, state)


# ---------------------------------------------------------------------------
# Tile-native digest representation: a tuple of 32 (N/128, 128) u8 arrays.
#
# The stacked (32, N) layout is hostile to TPU tiling — every row extraction
# is a sublane gather, making tree levels ~25x slower than leaf hashing.
# Carrying each digest byte row as its own (N/128, 128) array keeps every
# hash step a full-tile elementwise op; a Merkle level's even/odd
# deinterleave is a cheap lane-strided slice + sublane-merge reshape.
# Node j's digest byte i lives at rows[i][j // 128, j % 128].
# ---------------------------------------------------------------------------

LANE = 128


def leaf_hash_rows_core(values2d, rolled: bool = False):
    """(R, 128) uint32 values -> tuple of 32 (R, 128) u8 digest rows."""
    state = _init_rows(jnp, values2d.shape)
    state = _absorb_rows(state, _value_rows(values2d))
    if rolled:
        return tuple(_mix_rows_loop(state, 1 + 8))
    for _ in range(1 + 8):
        state = _mix_rows(state)
    return tuple(state)


def row_hash_rows_core(cols, rolled: bool = False):
    """(c, R, 128) uint32 -> tuple of 32 (R, 128) u8 digest rows
    (leaf j = Hash::from_field_elements of the c values at lane j)."""
    c = cols.shape[0]
    byte_rows = []
    for r in range(c):
        byte_rows.extend(_value_rows(cols[r]))
    if rolled:
        st = _init_stacked(cols.shape[1:])
        for start in range(0, len(byte_rows), 32):
            chunk = jnp.stack(byte_rows[start : start + 32], axis=0)
            st = _mix_stacked(_absorb_stacked(st, chunk))
        st = _mix_stacked_loop(st, 8)
        return tuple(st[i] for i in range(32))
    state = _init_rows(jnp, cols.shape[1:])
    for start in range(0, len(byte_rows), 32):
        state = _absorb_rows(state, byte_rows[start : start + 32])
        state = _mix_rows(state)
    for _ in range(8):
        state = _mix_rows(state)
    return tuple(state)


def combine_rows_core(left, right, rolled: bool = False):
    """Two row-tuples -> combined row-tuple (Hash::combine per lane)."""
    if rolled:
        st = _combine_stacked(
            jnp.stack(list(left), axis=0), jnp.stack(list(right), axis=0)
        )
        return tuple(st[i] for i in range(32))
    state = _init_rows(jnp, left[0].shape)
    state = _absorb_rows(state, list(left))
    state = _mix_rows(state)
    state = _absorb_rows(state, list(right))
    for _ in range(1 + 8):
        state = _mix_rows(state)
    return tuple(state)


def level_rows_core(rows, rolled: bool = False):
    """One Merkle level on row-tuples: nodes (R, 128) -> parents (R/2, 128).

    Even/odd deinterleave: pairs (2i, 2i+1) are lane-adjacent; the strided
    lane slice halves each row to (R, 64) and the reshape merges sublane
    pairs back to full (R/2, 128) tiles, preserving node order.  Below one
    full tile (R == 1) the lane axis simply halves: (1, w) -> (1, w/2).
    """
    R = rows[0].shape[0]
    if R == 1:
        left = tuple(r[:, 0::2] for r in rows)
        right = tuple(r[:, 1::2] for r in rows)
    else:
        left = tuple(r[:, 0::2].reshape(R // 2, LANE) for r in rows)
        right = tuple(r[:, 1::2].reshape(R // 2, LANE) for r in rows)
    return combine_rows_core(left, right, rolled=rolled)


def level_rows_halves_core(rows, rolled: bool = False):
    """One Merkle level on BIT-REVERSED-stored row-tuples: combine the two
    CONTIGUOUS halves (zero lane shuffling — the whole point of the
    layout).

    With level nodes stored at position rev(j) (bit-reversal over the
    level's log2-width), a node pair (2i, 2i+1) lands at positions
    (p, p + W/2) where p = rev_{W/2}(i): the pair's LSB becomes the
    stored position's MSB.  So left = first half, right = second half,
    and parent i belongs at position p — the combine output IS the next
    level in ITS bit-reversed order, with no deinterleave anywhere.
    Measured (TPU v5e, W=2^21, chained): 1.75 ms vs 3.65 ms for the
    deinterleaving :func:`level_rows_core` — the stride-2 u8 lane
    shuffle was ~half of every wide level's cost.
    """
    R = rows[0].shape[0]
    if R == 1:
        w = rows[0].shape[1]
        left = tuple(r[:, : w // 2] for r in rows)
        right = tuple(r[:, w // 2 :] for r in rows)
    else:
        left = tuple(r[: R // 2] for r in rows)
        right = tuple(r[R // 2 :] for r in rows)
    return combine_rows_core(left, right, rolled=rolled)


def _rev_bits_host(K: int) -> tuple:
    """Static (2^K,) bit-reversal list (rev is an involution)."""
    return tuple(
        int(format(i, f"0{K}b")[::-1], 2) if K else 0 for i in range(1 << K)
    )


def _semirev_flat(flat, K: int):
    """(n,) array -> partially-bit-reversed order: j = hi*2^K + lo moves
    to position rev_K(lo)*(n/2^K) + hi.  Lowered as ONE (n/2^K, 2^K)
    transpose plus a static 2^K-row reorder — pure tiled data movement,
    NO scattered gather (a full-bit-reversal gather of a 2^22-lane tree
    measured ~2 s on TPU through XLA's elementwise gather; this is
    HBM-bound instead)."""
    n = int(flat.shape[0])
    F = n >> K
    t = flat.reshape(F, 1 << K).T  # (2^K, F): row lo holds {hi}
    return t[jnp.asarray(_rev_bits_host(K), jnp.int32)].reshape(-1)


def semirev_rows_core(rows, K: int):
    """Row-tuple -> the partial-bit-reversed storage the wide halves
    combine wants: only the low K bits (one per wide level) reverse to
    the top; after K halves-combines the cutover level is NATURALLY
    ordered (no un-permute).  Node j of the result's level-l child sits
    at rev position computed by merkle._semirev_pos."""
    R, w = rows[0].shape
    return tuple(
        _semirev_flat(r.reshape(-1), K).reshape(R, w) for r in rows
    )


# ---------------------------------------------------------------------------
# Fused tail-tree builder: ALL Merkle levels below a cutover width in ONE
# dispatch.
#
# Per-level jits cost one device dispatch each (~1.3 ms through the axon
# relay), so a tree's narrow tail — log2(W) levels of trivial compute —
# costs more in dispatch latency than the wide levels cost in HBM traffic.
# Chaining levels into one unrolled jit is a known negative result (XLA
# compile time scales with the ~2k inlined hash ops PER level; see
# NOTES.md).  A lax.fori_loop traces the combine body ONCE and runs it
# log2(W) times over a fixed-width carry: each iteration combines the full
# padded width (garbage lanes beyond the valid prefix are hashed and
# ignored), so shapes stay static.  Wasted compute is L*W/2 lane-combines
# versus W exact — at the 2^16 cutover that is ~0.5 M lanes (< 1 ms)
# replacing 16 dispatches (~20 ms).
#
# Valid-prefix invariant: level nodes are row-major over (R, 128) tiles;
# pairs (2j, 2j+1) are lane-adjacent.  The deinterleave r[:, 0::2]
# .reshape(R//2, 128) maps prefix elements to prefix positions, so a valid
# prefix of w nodes yields a valid prefix of w/2 parents, down to width 1
# at [0, 0].
# ---------------------------------------------------------------------------

#: Tree levels at or below this width are built by the fused tail builder
#: (one dispatch); wider levels use per-level jits (shared across rounds).
FUSE_MAX_WIDTH = 1 << 16


def _tail_levels_core(leaf_rows):
    """Row-tuple at width W -> (levels, root_bytes, stack): every level
    below the input down to width 1 (row-tuple layout, widest first), the
    (32,) u8 root digest, and the raw padded level stack
    ((L, 32, R/2, 128) u8; level i's valid prefix is W >> (i+1) nodes,
    row-major) kept for vectorized path gathers.  Traced inline; one
    fori_loop whose STACKED combine body is traced once — the tail is the
    latency-bound regime, so the state rides the (32, ...) stacked layout
    (~12x fewer sequential ops than the row-list mixes; see _mix_stacked).
    Handles both the tiled (R, 128) layout (R >= 2) and the sub-tile
    (1, w) layout (w >= 2)."""
    R = int(leaf_rows[0].shape[0])
    if R == 1:
        return _tail_levels_narrow(leaf_rows)
    W = R * LANE
    L = W.bit_length() - 1  # levels produced: widths W/2 .. 1
    out = _tail_loop(leaf_rows, L)

    levels = []
    for i in range(L):
        w = W >> (i + 1)
        if w >= LANE:
            levels.append(tuple(out[i, b, : w // LANE, :] for b in range(32)))
        else:
            levels.append(tuple(out[i, b, :1, :w] for b in range(32)))
    root = out[L - 1, :, 0, 0]
    return tuple(levels), root, out


#: Tail-loop segment length: every SEG iterations the carry's padded row
#: count compacts to its valid prefix (free leading-row slice), so the
#: wasted full-padded-width combines cost ~SEG*W instead of log2(W)*W —
#: measured 2.3 ms per 2^16-wide tree tail before segmenting (the
#: dominant device cost of the wide commit rounds, profile_prove.py).
#: Round-5 A/B at the config-4 capstone: SEG=2 -> 56.7 ms device exec
#: union vs SEG=4 -> 58.5 (tighter compaction beats the extra loop
#: boundaries); SEG=8 -> ~2.4x worse on the isolated 2^16 tail.
_TAIL_SEG = 2


def _tail_loop(leaf_rows, L: int):
    """The level loop: 32 x (R, 128) leaf rows (row-tuple) ->
    (L, 32, R/2, 128) padded level stack (level i's valid prefix is
    R*128 >> (i+1) nodes, row-major; bytes beyond a prefix are
    unspecified).  Carry and combine are STACKED; the loop runs in
    _TAIL_SEG-iteration segments with the carry compacted to its valid
    prefix between segments."""
    R = int(leaf_rows[0].shape[0])
    out = jnp.zeros((L, 32, R // 2, LANE), jnp.uint8)
    cur = jnp.stack(list(leaf_rows), axis=0)
    done = 0
    while done < L:
        Rcur = int(cur.shape[1])
        # Below 2 padded rows no further compaction is possible; run the
        # remaining (sub-row-width) iterations in one segment.
        steps = min(_TAIL_SEG, L - done) if Rcur > 2 else (L - done)
        Rh = Rcur // 2

        def body(i, carry, Rh=Rh):
            cur, out = carry  # cur: (32, Rcur, 128)
            left = cur[:, :, 0::2].reshape(32, Rh, LANE)
            right = cur[:, :, 1::2].reshape(32, Rh, LANE)
            par = _combine_stacked(left, right)  # (32, Rh, 128)
            out = jax.lax.dynamic_update_slice(
                out, par[None], (i, 0, 0, 0)
            )
            cur = jnp.concatenate([par, par], axis=1)
            return cur, out

        cur, out = jax.lax.fori_loop(done, done + steps, body, (cur, out))
        done += steps
        rows_next = max(Rcur >> steps, 2)
        if rows_next < Rcur:
            cur = cur[:, :rows_next, :]
    return out


def forest_tail_levels_core(leaf_rows, B: int, n: int):
    """Fused FOREST build: B same-shape trees packed row-major over
    B*n lanes (the batched prover's layout, stark_tpu/batch.py).  One
    fori_loop produces every level down to the per-proof roots — the
    pairing never crosses a proof boundary because per-proof widths stay
    even until width 1, where the loop stops (log2(n) levels, not
    log2(B*n)).  Returns levels in batch.py's convention: (B*w/128, 128)
    row-major while w >= 128, (B, w) per-proof below."""
    L = n.bit_length() - 1
    R = int(leaf_rows[0].shape[0])
    assert R % 2 == 0, (B, n)  # the fixed-width loop halves tile rows
    out = _tail_loop(leaf_rows, L)
    levels = []
    for i in range(L):
        wp = n >> (i + 1)
        wg = B * wp
        if wp >= LANE:
            levels.append(
                tuple(out[i, b, : wg // LANE, :] for b in range(32))
            )
        else:
            levels.append(
                tuple(
                    out[i, b].reshape(-1)[:wg].reshape(B, wp)
                    for b in range(32)
                )
            )
    return levels


def _tail_levels_narrow(leaf_rows):
    """Sub-tile variant: 32 x (1, w) rows, w >= 2 a power of two.
    Stack layout: (L, 32, w/2)."""
    w = int(leaf_rows[0].shape[1])
    L = w.bit_length() - 1
    wh = w // 2

    def body(i, carry):
        cur, out = carry  # cur: (32, w)
        par = _combine_stacked(cur[:, 0::2], cur[:, 1::2])  # (32, wh)
        out = out.at[i].set(par)
        cur = jnp.concatenate([par, par], axis=1)
        return cur, out

    out0 = jnp.zeros((L, 32, wh), jnp.uint8)
    _, out = jax.lax.fori_loop(
        0, L, body, (jnp.stack([r[0] for r in leaf_rows], axis=0), out0)
    )
    levels = tuple(
        tuple(out[i, b, : w >> (i + 1)][None, :] for b in range(32))
        for i in range(L)
    )
    root = out[L - 1, :, 0]
    return levels, root, out


def stack_path_gather(stack, idx, first_level: int, n_levels: int):
    """Vectorized sibling-digest gather from a tail stack (traceable).

    ``stack``: (L, 32, R/2, 128) (wide) or (L, 32, w/2) (narrow) padded
    level stack; ``idx``: (k,) i32 LEAF-level query indices of the tree;
    stack level i holds tree level ``first_level + i``.  Returns
    (n_levels, k, 32) u8 — ONE gather covers every level and every digest
    byte at once (the byte axis rides along densely)."""
    shifts = (
        jnp.arange(n_levels, dtype=jnp.int32)[:, None] + first_level
    )
    sib = (idx[None, :] >> shifts) ^ 1  # (n_levels, k) node siblings
    L3 = jnp.arange(n_levels, dtype=jnp.int32)[:, None, None]
    B3 = jnp.arange(32, dtype=jnp.int32)[None, None, :]
    if stack.ndim == 4:
        rows, cols = sib // LANE, sib % LANE
        return stack[L3, B3, rows[:, :, None], cols[:, :, None]]
    return stack[L3, B3, sib[:, :, None]]


@functools.lru_cache(maxsize=None)
def _tail_levels_fn(shape):
    return jax.jit(_tail_levels_core)


def tail_levels(rows):
    """One-dispatch tail build below a width-W row-tuple (W >= 2)."""
    return _tail_levels_fn(tuple(rows[0].shape))(rows)


@functools.lru_cache(maxsize=None)
def _tail_levels_light_fn(shape):
    """Tail build materializing ONLY (root, stack) as outputs.

    The sliced per-level row-tuples are ~32*log2(W) extra output buffers;
    materializing them measured ~45 ms at W=2^16 (vs ~6 ms for the same
    compute) through this deployment's runtime.  Path gathers read the
    raw stack directly, so full-device trees never need the slices."""

    def fn(rows):
        _levels, root, stack = _tail_levels_core(rows)
        return root, stack

    return jax.jit(fn)


def tail_levels_light(rows):
    return _tail_levels_light_fn(tuple(rows[0].shape))(rows)


@functools.lru_cache(maxsize=None)
def _tree_from_values_fn(shape):
    """Leaf hash + full tail in ONE dispatch: (R, 128) or (1, w) u32
    values -> (leaf_rows, levels, root_bytes)."""

    def fn(v2d):
        leaf = leaf_hash_rows_core(v2d, rolled=True)
        levels, root, stack = _tail_levels_core(leaf)
        return leaf, levels, root, stack

    return jax.jit(fn)


def tree_from_values(v2d):
    return _tree_from_values_fn(tuple(v2d.shape))(v2d)


@functools.lru_cache(maxsize=None)
def _tree_from_values_light_fn(shape):
    """Light variant of :func:`_tree_from_values_fn`: (leaf, root, stack)
    only — no per-level slice outputs (see _tail_levels_light_fn)."""

    def fn(v2d):
        leaf = leaf_hash_rows_core(v2d, rolled=True)
        _levels, root, stack = _tail_levels_core(leaf)
        return leaf, root, stack

    return jax.jit(fn)


def tree_from_values_light(v2d):
    return _tree_from_values_light_fn(tuple(v2d.shape))(v2d)


def stack_level_host_bytes(stack: np.ndarray, i: int, width: int) -> np.ndarray:
    """Valid prefix of padded-stack level ``i`` as (width, 32) host bytes
    (row-major node order; used to reconstruct MerkleTree.levels lazily)."""
    if stack.ndim == 4:
        flat = stack[i].reshape(32, -1)  # (32, Rh*128), node j at column j
    else:
        flat = stack[i]  # (32, wh)
    return np.ascontiguousarray(flat[:, :width].T.astype(np.uint8))


def rows_to_stacked(rows):
    """Row-tuple -> (32, N) u8 (host/compat layout)."""
    return jnp.stack([r.reshape(-1) for r in rows], axis=0)


def stacked_to_rows(digests):
    """(32, N) u8 -> row-tuple of (N/128, 128)."""
    n = digests.shape[1]
    return tuple(digests[i].reshape(n // LANE, LANE) for i in range(32))


# Width-dispatching jitted entry points.  At or below FUSE_MAX_WIDTH
# lanes, the rolled (fori_loop) variants trace/compile ~7x faster and the
# extra loop-boundary traffic is noise; above it, the unrolled chains let
# XLA fuse the whole hash into a few HBM passes (the wide-level
# bandwidth-bound regime).
_leaf_hash_rows = (
    jax.jit(leaf_hash_rows_core),
    jax.jit(functools.partial(leaf_hash_rows_core, rolled=True)),
)
_row_hash_rows = (
    jax.jit(row_hash_rows_core),
    jax.jit(functools.partial(row_hash_rows_core, rolled=True)),
)
_level_rows_halves = (
    jax.jit(level_rows_halves_core),
    jax.jit(functools.partial(level_rows_halves_core, rolled=True)),
)
_semirev_rows_jit = jax.jit(semirev_rows_core, static_argnums=1)


def leaf_hash_rows(values2d):
    n = int(values2d.shape[0]) * int(values2d.shape[1])
    return _leaf_hash_rows[n <= FUSE_MAX_WIDTH](values2d)


def row_hash_rows(cols):
    n = int(cols.shape[1]) * int(cols.shape[2])
    return _row_hash_rows[n <= FUSE_MAX_WIDTH](cols)


def level_rows_halves(rows):
    n = int(rows[0].shape[0]) * int(rows[0].shape[1])
    return _level_rows_halves[n <= FUSE_MAX_WIDTH](rows)


def semirev_rows(rows, K: int):
    return _semirev_rows_jit(rows, K)


@functools.lru_cache(maxsize=None)
def _leaf_hash_semirev_fn(n: int, K: int):
    """Leaf hash with partial-bit-reversed output order, fused as an
    input-value permute (4 B/lane — 8x cheaper than permuting the 32 B
    digest planes)."""

    def fn(v):
        v2d = _semirev_flat(v, K).reshape(n // LANE, LANE)
        return leaf_hash_rows_core(v2d, rolled=n <= FUSE_MAX_WIDTH)

    return jax.jit(fn)


def leaf_hash_rows_semirev(values, K: int):
    """(n,) u32 values -> leaf-digest row-tuple in semirev-K storage
    (see semirev_rows_core); n must be >= 2 lanes."""
    return _leaf_hash_semirev_fn(int(values.shape[0]), K)(values)


@functools.lru_cache(maxsize=None)
def _row_hash_semirev_fn(c: int, n: int, K: int):
    """Row hash with semirev-K output order, fused as a per-register
    value permute — c*4 B/lane moved instead of the 32 digest planes
    (8x less for the c=1 trace-tree capstone)."""

    def fn(cols):  # (c, n) u32
        v3d = jnp.stack(
            [_semirev_flat(cols[r], K) for r in range(c)]
        ).reshape(c, n // LANE, LANE)
        return row_hash_rows_core(v3d, rolled=n <= FUSE_MAX_WIDTH)

    return jax.jit(fn)


def row_hash_rows_semirev(cols2d, K: int):
    """(c, n) u32 trace columns -> row-digest row-tuple in semirev-K
    storage (leaf j = Hash::from_field_elements of column rev-position j)."""
    c, n = cols2d.shape
    return _row_hash_semirev_fn(int(c), int(n), K)(cols2d)


# ---------------------------------------------------------------------------
# Device-resident transcript hashing (the FRI commit chain).
#
# The Fiat-Shamir challenge is H(entire transcript) (fiat_shamir.rs:19-25);
# during FRI commit the transcript is just the concatenation of the round
# roots (fri.rs:131 absorbs only roots).  Hashing it ON DEVICE lets the
# whole commit phase (tree -> root -> challenge -> fold -> next tree) run
# as a dependency chain with ZERO host synchronization — the host replays
# the byte-identical transcript afterwards from one batched root fetch.
# The fold only needs alpha mod p, which fits u32 lanes; the raw-u64
# challenge quirk (SURVEY 3.6.1) lives exclusively on the host side.
# ---------------------------------------------------------------------------


def transcript_state_core(transcripts, rolled: bool = False):
    """(B, length) u8 transcripts -> hash state as a list of 32 (B,) u8
    rows (= Hash::from_bytes of each transcript, hash.rs:7-30).  Traceable
    inline; length is read from the static shape.  Chunking matches
    hash.rs:13-27 (partial last chunk absorbed then mixed).  ``rolled``
    runs everything in the STACKED state layout — full chunks through a
    lax.scan, final mixes through a fori_loop — same bytes, small graph
    AND low sequential op count (this path hashes B=1 transcripts on the
    device commit chain, pure latency)."""
    B, length = transcripts.shape
    assert length > 0
    if rolled:
        state = _init_stacked((B,))
        fc = length // 32
        if fc > 1:
            # (fc, 32, B): chunk-major, byte rows stacked per chunk.
            xs = (
                transcripts[:, : 32 * fc]
                .reshape(B, fc, 32)
                .transpose(1, 2, 0)
            )

            def chunk_body(st, x):
                return _mix_stacked(_absorb_stacked(st, x)), None

            state, _ = jax.lax.scan(chunk_body, state, xs)
            start = 32 * fc
        else:
            start = 0
        for c in range(start, length, 32):
            size = min(32, length - c)
            chunk = transcripts[:, c : c + size].T  # (size, B)
            state = _mix_stacked(_absorb_stacked(state, chunk))
        state = _mix_stacked_loop(state, 8)
        return [state[i] for i in range(32)]
    state = _init_rows(jnp, (B,))
    for c in range(0, length, 32):
        size = min(32, length - c)
        chunk = [transcripts[:, c + i] for i in range(size)]
        state = _absorb_rows(state, chunk)
        state = _mix_rows(state)
    for _ in range(8):
        state = _mix_rows(state)
    return state


# ---------------------------------------------------------------------------
# Incremental transcript sponge.
#
# ``FiatShamir.challenge`` re-hashes the ENTIRE transcript on every draw
# (fiat_shamir.rs:19-25 — the challenge is pure), which on the device
# chain costs one sequential absorb+mix per 32-byte chunk PER DRAW: the
# constraint-challenge chains and per-round FRI alphas re-absorb an
# ever-growing prefix.  But the absorb state after all FULL chunks is a
# pure function of the bytes so far: cache it, keep the <32-byte tail as
# ``pending``, and each draw only (a) partial-absorbs the pending tail and
# runs the 8 final mixes, and (b) folds a completed chunk into the cached
# state when pending crosses 32 bytes.  Chunk boundaries are identical to
# hash.rs:13-27 (full 32-byte chunks, then ONE partial tail chunk), so the
# digests are byte-identical to transcript_state_core — pinned by tests.
#
# All lengths are Python-static (each challenge appends exactly 8 bytes,
# each Merkle root 32), so this traces to fixed shapes under jit.
# ---------------------------------------------------------------------------


def sponge_from_bytes(t):
    """(L,) u8 device bytes -> (state, pending): the cached stacked state
    after absorbing all full 32-byte chunks, plus the <32-byte tail."""
    L = int(t.shape[0])
    state = _init_stacked(t.shape[1:])
    fc = L // 32
    if fc > 1:
        # chunk-major scan, same graph shape as transcript_state_core.
        xs = t[: 32 * fc].reshape((fc, 32) + t.shape[1:])
        state, _ = jax.lax.scan(
            lambda st, x: (_mix_stacked(_absorb_stacked(st, x)), None),
            state,
            xs,
        )
    elif fc == 1:
        state = _mix_stacked(_absorb_stacked(state, t[:32]))
    return state, t[32 * fc :]


def sponge_absorb(state, pending, rows):
    """Append ``rows`` ((m,) u8, m static) to the sponge, folding any
    completed 32-byte chunks into the cached state."""
    pending = jnp.concatenate([pending, rows]) if pending.shape[0] else rows
    while pending.shape[0] >= 32:
        state = _mix_stacked(_absorb_stacked(state, pending[:32]))
        pending = pending[32:]
    return state, pending


def sponge_state(state, pending):
    """Finalized hash state of the absorbed bytes: partial-absorb the
    pending tail (if any) + 8 final mixes.  Equals
    transcript_state_core(bytes)[rolled] as a stacked (32, ...) array."""
    if pending.shape[0]:
        state = _mix_stacked(_absorb_stacked(state, pending))
    return _mix_stacked_loop(state, 8)


def state_alpha(state):
    """First 8 digest bytes as a field value mod p: equals the host's
    u64-LE challenge reduced mod p (fiat_shamir.rs:21-24 + ff.rs:138)."""
    from stark_tpu.ops import fieldops as F
    from stark_tpu.ops.fieldops import P

    acc = jnp.zeros(state[0].shape, jnp.uint32)
    for i in range(8):
        term = F.mulmod(
            state[i].astype(jnp.uint32), jnp.uint32(pow(2, 8 * i, P))
        )
        acc = F.addmod(acc, term)
    return acc


def transcript_alpha_core(transcripts, rolled: bool = False):
    """(B, length) u8 transcripts -> (B,) alpha mod p.  Whole-transcript
    re-hash — the definitional twin the incremental sponge is tested
    against; production challenge paths use sponge_*/state_alpha."""
    return state_alpha(transcript_state_core(transcripts, rolled=rolled))


@functools.lru_cache(maxsize=None)
def _sponge_from_bytes_fn(length: int):
    return jax.jit(sponge_from_bytes)


def device_sponge_from_bytes(t):
    """(L,) u8 device transcript -> (state, pending) sponge, jitted per
    length (one dispatch)."""
    return _sponge_from_bytes_fn(int(t.shape[0]))(t)


@functools.lru_cache(maxsize=None)
def _sponge_root_alpha_fn(q: int):
    def fn(state, pending, root):
        state, pending = sponge_absorb(state, pending, root)
        alpha = state_alpha(sponge_state(state, pending))
        return alpha, state, pending
    return jax.jit(fn)


def device_sponge_root_alpha(state, pending, root):
    """Absorb a 32-byte root and draw the challenge mod p from the
    incremental sponge — the per-FRI-round twin of
    device_transcript_alpha, O(1) in transcript length and ONE compiled
    graph for every round (the pending tail length is invariant under
    32-byte absorbs) instead of one per transcript length."""
    return _sponge_root_alpha_fn(int(pending.shape[0]))(
        state, pending, root
    )


def root_bytes_from_rows(rows):
    """Width-1 row-tuple (32 x (1, 1)) -> (32,) u8 device root digest."""
    return jnp.concatenate([r.reshape(1) for r in rows])


# ---------------------------------------------------------------------------
# Device-resident FRI index sampling (fri.rs:168-213).
#
# The prover's query phase needs the sampled indices only as device gather
# operands; computing them ON DEVICE lets the query gather chain directly
# onto the commit chain with no intervening host fetch.  The host replays
# the sampling byte-exactly afterwards (native engine, ~16 scalar hashes)
# and asserts the device indices agree — the same replay-integrity pattern
# as the commit chain's alpha check (fri.py).
# ---------------------------------------------------------------------------


def seed_digest_rows_core(transcript):
    """(L,) u8 device transcript -> sampling-seed digest as 32 (1,) u8 rows.

    seed = Hash::from_u64(u64::from_le_bytes(H(transcript)[..8]))
    (fri.rs:272 + fiat_shamir.rs:19-25): the u64's LE bytes ARE the
    transcript digest's first 8 bytes, so the seed hashes those 8 bytes
    directly — one partial chunk + mix + 8 final mixes (hash.rs:7-30).
    """
    st = transcript_state_core(transcript[None, :], rolled=True)
    return seed_digest_rows_from_state(jnp.stack(st, axis=0))


def seed_digest_rows_from_state(stf):
    """Sampling-seed rows from an already-finalized transcript digest
    state (stacked (32,) or (32, 1)); the incremental-sponge twin of
    seed_digest_rows_core — same second hash over the digest's first 8
    bytes."""
    if stf.ndim == 1:
        stf = stf[:, None]
    s = _init_stacked(stf.shape[1:])
    s = _absorb_stacked(s, stf[:8])
    s = _mix_stacked_loop(s, 1 + 8)
    return [s[i] for i in range(32)]


def sample_indices_core(
    seed_rows, M: int, size: int, reduced_size: int, number: int
):
    """Device replica of Fri::sample_indices (fri.rs:176-213) over ``M``
    candidate counters, all hashed in one vectorized pass.

    Per candidate c: digest = H(seed32 || c_le_u32) (36 bytes = one full
    chunk + one 4-byte partial, hash.rs:13-27); the byte-fold accumulator's
    value mod a power-of-two ``size`` depends only on the digest's last
    four bytes (each byte lands at its own disjoint 8-bit shift, fri.rs:
    168-174).  Dedup on index % reduced_size mirrors the accept/reject
    walk with a seen-mask scan; candidates past the ``number``-th accept
    are never emitted (the reference stops sampling there).

    Returns (indices (number,) u32, accept_count i32).  A count below
    ``number`` (all M candidates exhausted) means the caller must fall
    back to host sampling — with M ~ 2*number + 32 this is vanishingly
    rare for the reference's number <= reduced_size regime.
    """
    assert size & (size - 1) == 0 and reduced_size & (reduced_size - 1) == 0
    c = jnp.arange(M, dtype=jnp.uint32)
    st = _init_stacked((M,))
    seed_b = jnp.broadcast_to(
        jnp.stack([row[0] for row in seed_rows], axis=0)[:, None], (32, M)
    )
    st = _mix_stacked(_absorb_stacked(st, seed_b))
    ctr = jnp.stack(
        [
            (c & _MASK8).astype(jnp.uint8),
            ((c >> 8) & _MASK8).astype(jnp.uint8),
            ((c >> 16) & _MASK8).astype(jnp.uint8),
            ((c >> 24) & _MASK8).astype(jnp.uint8),
        ],
        axis=0,
    )
    st = _absorb_stacked(st, ctr)
    st = _mix_stacked_loop(st, 1 + 8)
    low32 = (
        (st[28].astype(jnp.uint32) << 24)
        | (st[29].astype(jnp.uint32) << 16)
        | (st[30].astype(jnp.uint32) << 8)
        | st[31].astype(jnp.uint32)
    )
    idx = low32 & jnp.uint32(size - 1)
    red = (low32 & jnp.uint32(reduced_size - 1)).astype(jnp.int32)

    def body(carry, x):
        seen, cnt = carry
        i_c, r_c = x
        ok = jnp.logical_and(~seen[r_c], cnt < number)
        seen = seen.at[r_c].set(True)
        pos = jnp.where(ok, cnt, number)  # `number` = out-of-bounds: dropped
        return (seen, cnt + ok.astype(jnp.int32)), (pos, i_c)

    (_, count), (pos, ivals) = jax.lax.scan(
        body,
        (jnp.zeros((reduced_size,), jnp.bool_), jnp.int32(0)),
        (idx, red),
    )
    out = jnp.zeros((number,), jnp.uint32).at[pos].set(ivals, mode="drop")
    return out, count


# -- jitted device entry points (stacked (32, N) layout — compat/tests) ----

# Stacked (32, N) entry points are only used at small N (test
# cross-checks, sub-1024 trace trees): rolled mixes — compile time is
# their whole cost.
leaf_hash = jax.jit(functools.partial(leaf_hash_core, jnp, rolled=True))
row_hash = jax.jit(functools.partial(row_hash_core, jnp, rolled=True))
combine = jax.jit(functools.partial(combine_core, jnp, rolled=True))


@jax.jit
def merkle_level(nodes):
    """(32, N) node digests -> (32, N/2) parent digests (pairwise combine)."""
    return combine_core(jnp, nodes[:, 0::2], nodes[:, 1::2], rolled=True)


def merkle_level_np(nodes: np.ndarray) -> np.ndarray:
    return combine_core(np, nodes[:, 0::2], nodes[:, 1::2])


def leaf_hash_np(values: np.ndarray) -> np.ndarray:
    return leaf_hash_core(np, values.astype(np.uint32))


def digests_to_bytes(digests) -> np.ndarray:
    """(32, N) uint8 digest rows -> (N, 32) uint8 array."""
    return np.ascontiguousarray(np.asarray(digests).astype(np.uint8).T)


def bytes_to_digests(arr: np.ndarray):
    """(N, 32) uint8 -> (32, N) uint8 digest rows."""
    return np.ascontiguousarray(arr.astype(np.uint8).T)
