"""Batched proving: B independent proofs through one device pipeline.

Production serving is throughput-bound: for small/medium traces the
single-proof pipeline leaves the chip idle between host round-trips and
under-fills the vector lanes.  This module lays B proofs side by side on
the lane axis — trace LDEs (B, c, N), codewords (B, n), Merkle lanes
(B*N/128, 128), transcripts (B, L) — so every kernel (NTT, constraint
composition, leaf hashing, tree levels, transcript hashing, FRI folds)
processes the whole batch at full width, and the host round-trip count for
B proofs equals that of one proof (3 fetches total).

The output is **byte-identical** to running StarkProver B times — same
per-proof transcripts, challenges, indices and streams (tested) — because
each proof's Fiat-Shamir state is tracked independently (device-side
vectorized challenge hashing, host-side replay).

This layer has no counterpart in the reference (single-threaded, one proof
at a time); it composes the same contracts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.field import FiniteField
from stark_tpu.fri import _INV2, _INV2_SHOUP, _fold_kernel_dynamic
from stark_tpu.hashfn import Hash
from stark_tpu.ops import fieldops as F
from stark_tpu.ops import hash_batch as HB
from stark_tpu.ops import ntt as NTT
from stark_tpu.ops.fieldops import P
from stark_tpu.stark import (
    StarkConfig,
    StarkProver,
    _draw_constraint_challenges,
    trace_cols_u32,
)
from stark_tpu.stream import FieldElements, MerkleRoot, ProofStream
from stark_tpu.transcript import FiatShamir

LANE = HB.LANE


# ---------------------------------------------------------------------------
# Batched Merkle forest: B independent trees, lanes side by side.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _forest_level_fn(B: int, w: int):
    """One level for all B trees: per-proof width w -> w/2.

    Wide mode (w > 128): rows are (B*w/128, 128); pairs are lane-adjacent
    and the sublane merge stays inside each proof's row block (w/128 even).
    Narrow mode (w <= 128): rows are (B, w); lanes simply halve.
    """
    rolled = B * w <= HB.FUSE_MAX_WIDTH

    def fn(rows):
        if w > LANE:
            R = rows[0].shape[0]
            left = tuple(r[:, 0::2].reshape(R // 2, LANE) for r in rows)
            right = tuple(r[:, 1::2].reshape(R // 2, LANE) for r in rows)
        else:
            left = tuple(r[:, 0::2] for r in rows)
            right = tuple(r[:, 1::2] for r in rows)
        return HB.combine_rows_core(left, right, rolled=rolled)

    return jax.jit(fn)


def _forest_from_leaf_rows(leaf_rows, B: int, n: int):
    """leaf_rows: row-tuple over B*n lanes -> list of (rows, width) levels
    down to the per-proof roots.  Transition wide->narrow at w=128 is a
    free reshape."""
    levels = [(leaf_rows, n)]
    w = n
    while w > 1:
        rows, _ = levels[-1]
        nxt = _forest_level_fn(B, w)(rows)
        w //= 2
        levels.append((nxt, w))
    return levels


@functools.lru_cache(maxsize=None)
def _forest_tail_fn(B: int, n: int):
    """ONE dispatch for all forest levels below the leaves
    (hash_batch.forest_tail_levels_core) — the per-level loop above costs
    a ~1.3 ms dispatch per level through the relay."""
    return jax.jit(
        functools.partial(HB.forest_tail_levels_core, B=B, n=n)
    )


@functools.lru_cache(maxsize=None)
def _forest_from_values_fn(B: int, n: int):
    """Leaf hash + all forest levels in ONE dispatch ((B, n) values)."""

    def fn(values):
        leaf = HB.leaf_hash_rows_core(
            values.reshape(B * n // HB.LANE, HB.LANE), rolled=True
        )
        return leaf, HB.forest_tail_levels_core(leaf, B, n)

    return jax.jit(fn)


#: Global width above which the fused forest loop's padded stack (16 *
#: log2(n) * B*n bytes transient) and its full-width wasted combines get
#: expensive: build those levels per-level, fuse the rest.
_FOREST_FUSE_CAP = 1 << 20


def _forest_levels_fused(leaf_rows_or_none, B: int, n: int, values=None):
    """Fused forest build; returns batch.py's [(rows, w)] level list."""
    if values is not None and B * n <= _FOREST_FUSE_CAP:
        leaf, tail = _forest_from_values_fn(B, n)(values)
        levels = [(leaf, n)]
    else:
        if leaf_rows_or_none is None:
            leaf_rows_or_none = HB.leaf_hash_rows(
                values.reshape(B * n // LANE, LANE)
            )
        levels = [(leaf_rows_or_none, n)]
        w = n
        while B * w > _FOREST_FUSE_CAP:
            levels.append((_forest_level_fn(B, w)(levels[-1][0]), w // 2))
            w //= 2
        tail = _forest_tail_fn(B, w)(levels[-1][0])
    w = levels[-1][1]
    for rows in tail:
        w //= 2
        levels.append((rows, w))
    return levels


class BatchedTrees:
    """B same-shape Merkle trees, all levels device resident."""

    def __init__(self, levels, B: int, n: int):
        self.levels = levels  # [(row-tuple, per-proof width)], leaf first
        self.B = B
        self.n = n

    @staticmethod
    def from_values(values, B: int, n: int) -> "BatchedTrees":
        """values: (B, n) uint32 -> forest (leaf_i = H([v_i]) per proof)."""
        values = jnp.asarray(values, dtype=jnp.uint32)
        if n >= LANE and (B * n) % (2 * LANE) == 0:
            return BatchedTrees(
                _forest_levels_fused(None, B, n, values=values), B, n
            )
        v2d = (
            values.reshape(B * n // LANE, LANE) if n >= LANE else values
        )
        return BatchedTrees(
            _forest_from_leaf_rows(HB.leaf_hash_rows(v2d), B, n), B, n
        )

    @staticmethod
    def from_rows(cols, B: int, c: int, n: int) -> "BatchedTrees":
        """cols: (B, c, n) uint32 -> forest (leaf_j = H(row j) per proof).

        Narrow trees (n < 128) keep the (B, n) per-proof layout from the
        leaves down — packing proofs into shared 128-lane rows would break
        the per-proof gather index arithmetic.
        """
        lanes = jnp.asarray(cols, dtype=jnp.uint32).transpose(1, 0, 2)
        lanes = (
            lanes.reshape(c, B * n // LANE, LANE) if n >= LANE else lanes
        )
        leaf = HB.row_hash_rows(lanes)
        if n >= LANE and (B * n) % (2 * LANE) == 0:
            return BatchedTrees(_forest_levels_fused(leaf, B, n), B, n)
        return BatchedTrees(_forest_from_leaf_rows(leaf, B, n), B, n)

    def root_bytes_dev(self):
        """(B, 32) u8 device roots."""
        rows, w = self.levels[-1]
        assert w == 1
        return jnp.stack([r.reshape(self.B) for r in rows], axis=1)

    def open_batch_dev(self, indices):
        """indices: (B, k) int32 device -> (L-1, B, k, 32) u8 sibling
        digests (per-proof paths, bottom-up)."""
        return _forest_gather_fn(self.B, self.n, int(indices.shape[1]))(
            tuple(lv for lv, _ in self.levels), indices
        )


@functools.lru_cache(maxsize=None)
def _forest_gather_fn(B: int, n: int, k: int):
    widths = []
    w = n
    while w > 1:
        widths.append(w)
        w //= 2

    def fn(levels, idx):
        proof = jax.lax.broadcasted_iota(jnp.int32, (B, k), 0)
        out = []
        for rows, w in zip(levels, widths):
            sib = idx ^ 1
            if w > LANE:
                row = proof * (w // LANE) + sib // LANE
                lane = sib % LANE
            else:
                row = proof
                lane = sib
            digs = jnp.stack([r[row, lane] for r in rows], axis=-1)
            out.append(digs)  # (B, k, 32)
            idx = idx >> 1
        return jnp.stack(out, axis=0)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Single-fetch batched prove (the batch analogue of fri._mega_prove_fn).
# ---------------------------------------------------------------------------

def _forest_light_build(leaf, B: int, n: int):
    """Traceable LIGHT forest build from leaf digest rows (B*n lanes,
    row-major per proof): wide levels via the unrolled bandwidth-optimal
    combine, the rest via the fixed-width tail loop; nothing but
    (pre_levels, stack, roots) survives — no per-level slice outputs.

    Returns (pre_levels [row-tuples, tree level j], stack (L,32,Rh,128),
    roots (B, 32))."""
    pre = [leaf]
    w = n
    while B * w > HB.FUSE_MAX_WIDTH:
        rows = pre[-1]
        R = rows[0].shape[0]
        left = tuple(r[:, 0::2].reshape(R // 2, LANE) for r in rows)
        right = tuple(r[:, 1::2].reshape(R // 2, LANE) for r in rows)
        pre.append(HB.combine_rows_core(left, right, rolled=False))
        w //= 2
    L = w.bit_length() - 1  # remaining per-proof halvings down to roots
    stack = HB._tail_loop(pre[-1], L)
    flat = stack[L - 1].reshape(32, -1)
    roots = flat[:, :B].T  # (B, 32): per-proof width 1, row-major
    return pre, stack, roots


def _forest_path_gather(pre_levels, stack, idx, B: int, n: int):
    """Traceable per-proof sibling-path gather over a light forest.

    ``idx``: (B, k) i32 leaf indices.  Tree level l sibling of proof b =
    global flat node b*(n>>l) + ((idx>>l)^1) — per-proof blocks stay
    contiguous through every halving.  Returns (log2(n), B, k, 32) u8.
    """
    n_pre = len(pre_levels)
    lg = n.bit_length() - 1
    bidx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)  # (B, k)
    parts = []
    for lvl in range(n_pre):
        w = n >> lvl
        sib = (idx >> lvl) ^ 1
        g = bidx * w + sib
        rows, cols = g // LANE, g % LANE
        parts.append(
            jnp.stack([r[rows, cols] for r in pre_levels[lvl]], axis=-1)[
                None
            ]
        )
    Lrem = lg - n_pre
    if Lrem > 0:
        lv = jnp.arange(Lrem, dtype=jnp.int32)[:, None, None]
        sib = (idx[None] >> (lv + n_pre)) ^ 1              # (Lrem, B, k)
        w = jnp.asarray(
            [n >> (n_pre + i) for i in range(Lrem)], jnp.int32
        )[:, None, None]
        g = bidx[None] * w + sib
        rows, cols = g // LANE, g % LANE
        B3 = jnp.arange(32, dtype=jnp.int32)[None, None, None, :]
        # Stack level i holds tree level n_pre + i.
        parts.append(
            stack[lv[..., None], B3, rows[..., None], cols[..., None]]
        )
    return jnp.concatenate(parts, axis=0)


#: Manual cache (lru can't key the air-capturing compose closure; the
#: caller passes a stable key pinning air type + config).
_BATCH_MEGA_CACHE: dict = {}


def _batch_mega_fn(key, compose_vm):
    """ONE jit from the trace LDE to the packed fetch buffer, for B
    proofs: trace forest commit, per-proof device constraint challenges,
    composition, every FRI commit round (forest + root + challenge +
    fold), per-proof index sampling, all query + trace-opening gathers,
    and the byte packing — the batched analogue of fri._mega_prove_fn
    (same rationale: tree buffers stay internal; ONE output buffer; ONE
    host fetch for the whole batch)."""
    from stark_tpu.fri import _SAMPLE_SLACK
    from stark_tpu.fri import _pack_u8_core

    got = _BATCH_MEGA_CACHE.get(key)
    if got is not None:
        return got

    (
        _air_cfg_tag,
        B,
        c,
        N,
        n_terms,
        rounds,
        number,
        size,
        reduced_size,
        M,
        blowup,
        offsets,
        _fuse_max,  # pins the wide-pre-level structure traced below
    ) = key

    def fn(
        trace_lde,       # (B, c, N) uint32
        inv_x_list,      # per-round (half,) ladders
        consts,          # compose domain constants
        idx_override,    # (B, number) u32
        use_override,    # () bool
        inv2_w,
        inv2_ws,
    ):
        # -- trace forest + per-proof roots ------------------------------
        lanes = trace_lde.transpose(1, 0, 2).reshape(c, B * N // LANE, LANE)
        tleaf = HB.row_hash_rows_core(
            lanes, rolled=B * N <= HB.FUSE_MAX_WIDTH
        )
        tpre, tstack, troots = _forest_light_build(tleaf, B, N)

        # -- constraint challenges (per-proof transcript chains) ---------
        # Incremental sponge (byte-order: chunk-major (L, B) stacking),
        # byte-identical to re-hashing each growing transcript
        # (hash_batch.sponge_* docstring).
        sp_state, sp_pending = HB.sponge_from_bytes(troots.T)  # (32, B)
        digs, chals = [], []
        for _ in range(2 * n_terms):
            stf = HB.sponge_state(sp_state, sp_pending)        # (32, B)
            digest8 = stf[:8]                                  # (8, B)
            digs.append(digest8.T)                             # (B, 8)
            chals.append(HB.state_alpha(stf))                  # (B,)
            sp_state, sp_pending = HB.sponge_absorb(
                sp_state, sp_pending, digest8
            )
        digs = jnp.stack(digs, axis=1)          # (B, 2*n_terms, 8)
        ch = jnp.stack(chals, axis=1)           # (B, 2*n_terms)
        alphas_c, betas_c = ch[:, 0::2], ch[:, 1::2]

        # -- composition codewords ---------------------------------------
        codeword = compose_vm(trace_lde, alphas_c, betas_c, *consts)

        # -- FRI commit rounds (light forests) ---------------------------
        forests, cws, roots, alphas = [], [], [], []
        w = N
        for r in range(rounds):
            leaf = HB.leaf_hash_rows_core(
                codeword.reshape(B * w // LANE, LANE),
                rolled=B * w <= HB.FUSE_MAX_WIDTH,
            )
            pre, stack, rts = _forest_light_build(leaf, B, w)
            forests.append((pre, stack, w))
            roots.append(rts)
            sp_state, sp_pending = HB.sponge_absorb(
                sp_state, sp_pending, rts.T
            )
            cws.append(codeword)
            if r == rounds - 1:
                break
            alpha = HB.state_alpha(HB.sponge_state(sp_state, sp_pending))
            alphas.append(alpha)
            half = w // 2
            a, b_ = codeword[:, :half], codeword[:, half:]
            s = F.addmod(a, b_)
            d = F.submod(a, b_)
            t = F.mont_mul(inv_x_list[r], alpha[:, None])
            codeword = F.shoup_mul(
                F.addmod(s, F.mulmod(t, d)), inv2_w, inv2_ws
            )
            w = half

        # -- per-proof index sampling ------------------------------------
        stf = HB.sponge_state(sp_state, sp_pending)
        seed = HB._init_stacked((B,))
        seed = HB._absorb_stacked(seed, stf[:8])
        seed = HB._mix_stacked_loop(seed, 1 + 8)  # (32, B)
        indices, count = _sample_indices_batched(
            seed, B, M, size, reduced_size, number
        )
        top_idx = jnp.where(use_override, idx_override, indices)

        # -- query gathers -----------------------------------------------
        idx = top_idx.astype(jnp.int32)
        qouts = []
        for i in range(rounds - 1):
            pre_i, stack_i, w_i = forests[i]
            pre_n, stack_n, w_n = forests[i + 1]
            half = w_i // 2
            idx = idx & (half - 1)
            ab = jnp.concatenate([idx, idx + half], axis=1)  # (B, 2k)
            qouts.append(
                (
                    jnp.take_along_axis(cws[i], ab, axis=1),
                    jnp.take_along_axis(cws[i + 1], idx, axis=1),
                    _forest_path_gather(pre_i, stack_i, ab, B, w_i),
                    _forest_path_gather(pre_n, stack_n, idx, B, w_n),
                )
            )

        # -- trace openings ----------------------------------------------
        half0 = N // 2
        a0 = top_idx.astype(jnp.int32) & (half0 - 1)
        qp = jnp.stack([a0, a0 + half0], axis=2).reshape(B, -1)  # (B, 2k)
        offs = jnp.asarray([k_ * blowup for k_ in offsets], jnp.int32)
        cols_idx = (qp[:, :, None] + offs[None, None, :]).reshape(B, -1) & (
            N - 1
        )
        tvals = jnp.take_along_axis(trace_lde, cols_idx[:, None, :], axis=2)
        tsib = _forest_path_gather(tpre, tstack, cols_idx, B, N)

        return _pack_u8_core(
            [
                troots,
                digs,
                roots,
                alphas,
                cws[-1],
                indices,
                count,
                qouts,
                tvals,
                tsib,
            ]
        )

    fn = jax.jit(fn)
    _BATCH_MEGA_CACHE[key] = fn
    return fn


def _sample_indices_batched(seed_stacked, B, M, size, reduced_size, number):
    """Per-proof device replica of Fri::sample_indices (fri.rs:176-213),
    B proofs x M candidates in one vectorized pass + one dedup scan.
    ``seed_stacked``: (32, B) u8 seed digests.  Returns ((B, number) u32,
    (B,) i32 accept counts)."""
    assert size & (size - 1) == 0 and reduced_size & (reduced_size - 1) == 0
    cvec = jnp.arange(M, dtype=jnp.uint32)
    st = HB._init_stacked((B, M))
    st = HB._absorb_stacked(
        st, jnp.broadcast_to(seed_stacked[:, :, None], (32, B, M))
    )
    st = HB._mix_stacked(st)
    ctr = jnp.stack(
        [
            jnp.broadcast_to((cvec >> sh) & jnp.uint32(0xFF), (B, M)).astype(
                jnp.uint8
            )
            for sh in (0, 8, 16, 24)
        ],
        axis=0,
    )
    st = HB._absorb_stacked(st, ctr)
    st = HB._mix_stacked_loop(st, 1 + 8)
    low32 = (
        (st[28].astype(jnp.uint32) << 24)
        | (st[29].astype(jnp.uint32) << 16)
        | (st[30].astype(jnp.uint32) << 8)
        | st[31].astype(jnp.uint32)
    )                                            # (B, M)
    idx = low32 & jnp.uint32(size - 1)
    red = (low32 & jnp.uint32(reduced_size - 1)).astype(jnp.int32)
    brange = jnp.arange(B)

    def body(carry, x):
        seen, cnt = carry                        # (B, reduced), (B,)
        i_c, r_c = x                             # (B,), (B,)
        ok = jnp.logical_and(~seen[brange, r_c], cnt < number)
        seen = seen.at[brange, r_c].set(True)
        pos = jnp.where(ok, cnt, number)
        return (seen, cnt + ok.astype(jnp.int32)), (pos, i_c)

    (_, count), (pos, ivals) = jax.lax.scan(
        body,
        (jnp.zeros((B, reduced_size), jnp.bool_), jnp.zeros((B,), jnp.int32)),
        (idx.T, red.T),
    )
    out = (
        jnp.zeros((B, number), jnp.uint32)
        .at[jnp.broadcast_to(brange[None, :], (M, B)), pos]
        .set(ivals, mode="drop")
    )
    return out, count


@functools.lru_cache(maxsize=None)
def _batch_round_fn(B: int, W: int, q: int):
    """ONE dispatch for a whole batched commit round: forest (leaf hash +
    every level) + per-proof roots + incremental root absorb +
    challenges + folds — the batched analogue of fri._commit_round_fn."""
    half = W // 2

    def fn(codeword, sp_state, sp_pending, inv_x_mont, inv2_w, inv2_ws):
        leaf = HB.leaf_hash_rows_core(
            codeword.reshape(B * W // LANE, LANE), rolled=True
        )
        tail = HB.forest_tail_levels_core(leaf, B, W)
        roots = jnp.stack([r.reshape(B) for r in tail[-1]], axis=1)
        sp_state, sp_pending = HB.sponge_absorb(
            sp_state, sp_pending, roots.T
        )
        alpha = HB.state_alpha(
            HB.sponge_state(sp_state, sp_pending)
        )  # (B,)
        a, b = codeword[:, :half], codeword[:, half:]
        s = F.addmod(a, b)
        d = F.submod(a, b)
        t = F.mont_mul(inv_x_mont, alpha[:, None])
        folded = F.shoup_mul(F.addmod(s, F.mulmod(t, d)), inv2_w, inv2_ws)
        return leaf, tail, roots, sp_state, sp_pending, alpha, folded

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# The batched prover.
# ---------------------------------------------------------------------------

class BatchStarkProver:
    """Prove B same-shape traces at once; proofs byte-identical to B
    single-prover runs (docstring at module top).

    With ``mesh`` the batched pipeline ALSO runs domain-sharded: the trace
    columns enter the device committed to a (None, None, AXIS) sharding and
    GSPMD propagates it through every batched kernel (iNTT, LDE, compose,
    forest levels, folds), inserting the collectives — same composition
    strategy as parallel/pstark.py, same bytes (tested byte-identical to
    single-device single-proof runs on the virtual mesh)."""

    def __init__(self, air, cfg: StarkConfig, batch: int, mesh=None):
        self.air = air
        self.cfg = cfg
        self.B = batch
        self.mesh = mesh
        self._single = StarkProver(air, cfg)
        self.fri = self._single.fri
        self._compose_v = jax.jit(
            jax.vmap(
                self._single._compose_impl,
                in_axes=(0, 0, 0) + (None,) * 6,
            )
        )

    def _fetch(self, tree):
        """Multi-process safe device fetch (same contract as
        ShardedFri._fetch): a process may only device_get shards it owns,
        so arrays still sharded over a multi-process mesh (the batch axis
        under P(AXIS), or domain-sharded codewords) are replicated first
        — one GSPMD all-gather, identical bytes on every process."""
        if self.mesh is None or jax.process_count() == 1:
            return jax.device_get(tree)
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())

        def pull(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return jax.jit(lambda a: a, out_shardings=rep)(x)
            return x

        return jax.device_get(jax.tree.map(pull, tree))

    def _place_cols(self, cols):
        """Commit (B, c, T) trace columns to the mesh's domain sharding
        (no-op without a mesh or for unshardable T)."""
        if self.mesh is None:
            return cols
        from jax.sharding import NamedSharding, PartitionSpec
        from stark_tpu.parallel.mesh import AXIS

        D = self.mesh.devices.size
        if cols.shape[-1] % D != 0:
            return cols
        return jax.device_put(
            jnp.asarray(cols),
            NamedSharding(self.mesh, PartitionSpec(None, None, AXIS)),
        )

    def _mega_ok(self) -> bool:
        """Shapes admit the single-fetch mega path (see prove_batch)."""
        from stark_tpu.fri import _SAMPLE_MAX_REDUCED

        d = self._single.dom
        rounds = self.fri.num_rounds()
        reduced = d.N >> (rounds - 1) if rounds else d.N
        return (
            (self.mesh is None or self.B % self.mesh.devices.size == 0)
            and rounds >= 2
            and d.N >= 2 * LANE
            # every round's GLOBAL forest width must fill >= 2 lane tiles
            # (the fixed-width tail loop halves sublane rows)
            and self.B * reduced >= 2 * LANE
            and reduced <= _SAMPLE_MAX_REDUCED
            and self.cfg.num_colinearity_tests <= reduced
        )

    def _cols_stack(self, traces, traces_cols):
        """(B, c, T) uint32 column stack from EITHER host rows (reference
        trace.rs:29-34 ingestion) or prover-ready (c, T) column arrays —
        the latter may be device-resident (e.g. the flagship witness
        generators, models/examples.mds_square_trace_cols_device), in
        which case no witness bytes cross host->device."""
        if traces_cols is not None:
            assert traces is None, "pass traces OR traces_cols, not both"
            assert len(traces_cols) == self.B
            return jnp.stack(
                [jnp.asarray(c, dtype=jnp.uint32) for c in traces_cols]
            )
        assert len(traces) == self.B
        return np.stack([trace_cols_u32(t) for t in traces])

    def prove_batch(
        self, traces=None, *, traces_cols=None
    ) -> list[bytes]:
        """Single-fetch mega path when the shapes admit it (single host
        fetch for the whole batch); classic 3-fetch path otherwise
        (sub-lane-tile domains, hostile configs, meshes that don't divide
        the batch).

        On a mesh with D | B the mega path runs BATCH-SHARDED: the trace
        LDE enters under a (batch, None, None) sharding and GSPMD
        propagates it through the whole fused graph — each device proves
        B/D complete proofs with zero cross-device communication until
        the one packed fetch (proofs are independent; the forest rows,
        transcripts, sampler state and gathers are all batch-major).
        This is the production serving layout: throughput scales
        linearly in D.  Bytes identical either way (tested).

        ``traces``: B host row-traces; or ``traces_cols``: B prover-ready
        (c, T) uint32 column arrays (may be device-resident — the
        flagship serving path; see _cols_stack)."""
        if self._mega_ok():
            return self._prove_batch_mega(traces, traces_cols)
        return self._prove_batch_classic(traces, traces_cols)

    def prove_many(
        self, traces=None, depth: int = 2, *, traces_cols=None
    ) -> list[bytes]:
        """Pipelined serving: prove any number of same-shape traces in
        batches of B, keeping up to ``depth`` batches in flight.

        JAX dispatch is asynchronous, so issuing batch k+1's mega graph
        BEFORE fetching batch k's packed buffer overlaps the device
        execution of k+1 with the host's fetch round-trip and wire emit of
        k — the steady-state wall per batch drops from (device + fetch +
        emit) to max(device, fetch + emit).  Bytes are identical to
        sequential ``prove_batch`` calls: each batch's transcript replay
        is fully independent (proofs share nothing).

        A trailing partial batch is padded by repeating its last trace
        (the mega graph is shape-specialized to B); pad proofs are
        dropped.  Falls back to sequential ``prove_batch`` when the mega
        path is unavailable (the classic path's three host fetches would
        serialize anyway).

        HBM note: up to ``depth + 1`` batches' device state (trace LDE +
        packed buffer + executing graph) is live at once, multiplying
        peak HBM accordingly.  At serving shapes (T<=2^16) this is a few
        hundred MB; near the 2-adicity cap (N=2^23, ~256 MB of LDE per
        batch at B=8) pass ``depth=1`` or use ``prove_batch``."""
        import collections

        B = self.B
        use_cols = traces_cols is not None
        items = traces_cols if use_cols else traces
        n = len(items)
        if n == 0:
            return []
        chunks = []
        for i in range(0, n, B):
            chunk = list(items[i : i + B])
            pad = B - len(chunk)
            chunks.append((pad, chunk + [chunk[-1]] * pad))

        def kw(chunk):
            return (
                {"traces_cols": chunk} if use_cols else {"traces": chunk}
            )

        if not self._mega_ok():
            out: list[bytes] = []
            for pad, chunk in chunks:
                proofs = self.prove_batch(**kw(chunk))
                out.extend(proofs[: B - pad])
            return out

        depth = max(1, depth)
        inflight: collections.deque = collections.deque()
        out = []
        for pad, chunk in chunks:
            inflight.append((pad, self._mega_dispatch(**kw(chunk))))
            if len(inflight) >= depth + 1:
                pad0, st = inflight.popleft()
                out.extend(self._mega_finish(st)[: B - pad0])
        while inflight:
            pad0, st = inflight.popleft()
            out.extend(self._mega_finish(st)[: B - pad0])
        return out

    def _prove_batch_mega(self, traces, traces_cols=None) -> list[bytes]:
        """B proofs with ONE device fetch: dispatch then finish."""
        return self._mega_finish(self._mega_dispatch(traces, traces_cols))

    def _mega_dispatch(self, traces=None, traces_cols=None):
        """Queue the whole batch's device work (LDE + mega graph) and
        return the in-flight state; does NOT block on the device.
        Everything from the trace LDE to the packed buffer runs inside
        _batch_mega_fn; _mega_finish fetches the buffer and replays each
        proof's transcript/challenges/sampling byte-exactly (same
        replay-integrity and idx_override fallback contracts as
        fri._prove_chained)."""
        from stark_tpu.fri import _SAMPLE_SLACK

        B, cfg, d = self.B, self.cfg, self._single.dom
        fri = self.fri
        rounds = fri.num_rounds()
        k = cfg.num_colinearity_tests
        n_terms = d.num_transition + len(d.boundary)
        c = self.air.num_registers
        size = d.N >> 1
        reduced = d.N >> (rounds - 1)
        M = 2 * k + _SAMPLE_SLACK

        # 1. LDE (batched; the only dispatches outside the mega jit).
        cols = self._cols_stack(traces, traces_cols)
        coeffs = NTT.intt(cols)
        trace_lde = NTT.lde(coeffs, cfg.blowup, d.offset)   # (B, c, N)
        if self.mesh is not None:
            # Batch-sharded serving layout (see prove_batch docstring).
            from jax.sharding import NamedSharding, PartitionSpec
            from stark_tpu.parallel.mesh import AXIS

            trace_lde = jax.device_put(
                jnp.asarray(trace_lde),
                NamedSharding(self.mesh, PartitionSpec(AXIS, None, None)),
            )

        key = (
            (type(self.air).__qualname__, cfg),
            B,
            c,
            d.N,
            n_terms,
            rounds,
            k,
            size,
            reduced,
            M,
            cfg.blowup,
            tuple(self.air.frame_offsets),
            HB.FUSE_MAX_WIDTH,  # pins the wide-pre-level structure
        )
        compose_vm = jax.vmap(
            self._single._compose_impl,
            in_axes=(0, 0, 0) + (None,) * 6,
        )
        mega = _batch_mega_fn(key, compose_vm)
        inv_x = [fri._plan.inv_x_mont(i) for i in range(rounds - 1)]
        consts = self._single._domain_consts()

        def run(idx_override, use: bool):
            return mega(
                jnp.asarray(trace_lde),
                inv_x,
                consts,
                idx_override,
                jnp.bool_(use),
                jnp.uint32(_INV2),
                jnp.uint32(_INV2_SHOUP),
            )

        packed = run(jnp.zeros((B, k), jnp.uint32), False)
        if self.mesh is None:
            # Start the device->host transfer NOW (async; begins as soon
            # as the device graph finishes): in the prove_many pipeline
            # batch k+1's packed buffer then streams over the relay while
            # the host is still replaying/emitting batch k, so the later
            # fetch is a wait on an in-flight copy instead of a cold
            # round trip.  Sharded arrays skip this (non-addressable
            # shards fetch through the replicate-at-fetch path).
            try:
                packed.copy_to_host_async()
            except AttributeError:  # pragma: no cover - older jax.Array
                pass
        return packed, run, key

    def _mega_finish(self, state) -> list[bytes]:
        """Fetch a dispatched batch's packed buffer, replay transcripts,
        emit wire segments.  Blocks on the ONE device fetch."""
        from stark_tpu.fri import _unpack_u8

        packed, run, key = state
        B, cfg, d = self.B, self.cfg, self._single.dom
        field = FiniteField()
        fri = self.fri
        rounds = fri.num_rounds()
        k = cfg.num_colinearity_tests
        n_terms = d.num_transition + len(d.boundary)
        c = self.air.num_registers
        size = d.N >> 1
        reduced = d.N >> (rounds - 1)

        spec = _BATCH_MEGA_CACHE.get(("spec",) + key)
        if spec is None:
            SDS = jax.ShapeDtypeStruct
            lgs = [
                (d.N >> i).bit_length() - 1 for i in range(rounds)
            ]  # path lengths per round
            qspec = [
                (
                    SDS((B, 2 * k), jnp.uint32),
                    SDS((B, k), jnp.uint32),
                    SDS((lgs[i], B, 2 * k, 32), jnp.uint8),
                    SDS((lgs[i + 1], B, k, 32), jnp.uint8),
                )
                for i in range(rounds - 1)
            ]
            K = 2 * k * len(self.air.frame_offsets)
            spec = [
                SDS((B, 32), jnp.uint8),
                SDS((B, 2 * n_terms, 8), jnp.uint8),
                [SDS((B, 32), jnp.uint8)] * rounds,
                [SDS((B,), jnp.uint32)] * (rounds - 1),
                SDS((B, reduced), jnp.uint32),
                SDS((B, k), jnp.uint32),
                SDS((B,), jnp.int32),
                qspec,
                SDS((B, c, K), jnp.uint32),
                SDS((d.N.bit_length() - 1, B, K, 32), jnp.uint8),
            ]
            _BATCH_MEGA_CACHE[("spec",) + key] = spec

        (
            troots_h,
            digs_h,
            roots_h,
            alphas_h,
            last_h,
            idx_h,
            count_h,
            q_h,
            tvals_h,
            tsib_h,
        ) = _unpack_u8(self._fetch(packed), spec)

        # 2. Host replay: per-proof transcripts, challenges, sampling.
        streams = [ProofStream() for _ in range(B)]
        fss = [FiatShamir() for _ in range(B)]
        for b in range(B):
            root = Hash(troots_h[b].tobytes())
            streams[b].push(MerkleRoot(root))
            fss[b].absorb(root.data)
            for i in range(2 * n_terms):
                raw = fss[b].challenge(field).value
                b8 = raw.to_bytes(8, "little")
                if b8 != digs_h[b, i].tobytes():
                    raise RuntimeError(
                        "device/host transcript divergence (constraint "
                        "challenges)"
                    )
                fss[b].absorb(b8)
        for b in range(B):
            for r in range(rounds):
                root = Hash(roots_h[r][b].tobytes())
                streams[b].push(MerkleRoot(root))
                fss[b].absorb(root.data)
                if r < rounds - 1:
                    alpha = fss[b].challenge(field)
                    if int(alphas_h[r][b]) != alpha.value % P:
                        raise RuntimeError(
                            "device/host transcript divergence"
                        )
            streams[b].push(
                FieldElements(tuple(int(v) for v in last_h[b]))
            )

        per_proof_indices = []
        dev_ok = True
        for b in range(B):
            seed = Hash.from_u64(fss[b].challenge(field).value).data
            want = fri.sample_indices(seed, size, reduced, k)
            per_proof_indices.append(want)
            if int(count_h[b]) < k or [int(v) for v in idx_h[b]] != want:
                dev_ok = False
        if not dev_ok:
            # Device candidate pool exhausted for some proof: re-run the
            # SAME graph with the host's authoritative indices.
            packed2 = run(
                jnp.asarray(per_proof_indices, dtype=jnp.uint32), True
            )
            (_, _, _, _, _, _, _, q_h, tvals_h, tsib_h) = _unpack_u8(
                self._fetch(packed2), spec
            )

        # 3. Emit raw wire segments per proof (single-prover order).
        from stark_tpu.stream import raw_field_elements, raw_merkle_path

        for i in range(rounds - 1):
            cur_vals, nxt_vals, cur_sib, nxt_sib = q_h[i]
            for b in range(B):
                seg = [
                    raw_field_elements(
                        [cur_vals[b][s], cur_vals[b][k + s], nxt_vals[b][s]]
                    )
                    for s in range(k)
                ]
                cs, ns = cur_sib[:, b], nxt_sib[:, b]
                for s in range(k):
                    seg.append(raw_merkle_path(cs, s))
                    seg.append(raw_merkle_path(cs, k + s))
                    seg.append(raw_merkle_path(ns, s))
                streams[b].push_raw(b"".join(seg))
        K = tvals_h.shape[2]
        for b in range(B):
            ts = tsib_h[:, b]
            seg = []
            for t in range(K):
                seg.append(raw_field_elements(tvals_h[b][:, t]))
                seg.append(raw_merkle_path(ts, t))
            streams[b].push_raw(b"".join(seg))

        return [s.serialize() for s in streams]

    def _prove_batch_classic(self, traces, traces_cols=None) -> list[bytes]:
        B, cfg, d = self.B, self.cfg, self._single.dom
        field = FiniteField()
        fri = self.fri
        rounds = fri.num_rounds()
        k = cfg.num_colinearity_tests

        # 1-2. LDE + trace commitment (batched).
        cols = self._cols_stack(traces, traces_cols)        # (B, c, T)
        coeffs = NTT.intt(self._place_cols(cols))
        trace_lde = NTT.lde(coeffs, cfg.blowup, d.offset)   # (B, c, N)
        trace_forest = BatchedTrees.from_rows(
            trace_lde, B, self.air.num_registers, d.N
        )
        trace_roots_dev = trace_forest.root_bytes_dev()     # (B, 32)

        # Fetch trace roots (fetch #1) and start per-proof transcripts.
        trace_roots = np.asarray(self._fetch(trace_roots_dev)).astype(
            np.uint8
        )
        streams = [ProofStream() for _ in range(B)]
        fss = [FiatShamir() for _ in range(B)]
        ab = []
        for b in range(B):
            root = Hash(trace_roots[b].tobytes())
            streams[b].push(MerkleRoot(root))
            fss[b].absorb(root.data)
            n_terms = d.num_transition + len(d.boundary)
            ab.append(_draw_constraint_challenges(fss[b], field, n_terms))
        alphas_h = jnp.asarray([a for a, _ in ab], dtype=jnp.uint32)
        betas_h = jnp.asarray([b_ for _, b_ in ab], dtype=jnp.uint32)

        # 4. composition codewords (batched, one fused jit).
        codeword = self._compose_v(
            trace_lde, alphas_h, betas_h, *self._single._domain_consts()
        )  # (B, N)

        # 5. FRI commit: fully device-chained for the whole batch.
        prefixes = [bytes(fss[b].transcript) for b in range(B)]
        assert all(len(p) == len(prefixes[0]) for p in prefixes)
        transcripts = jnp.asarray(
            np.frombuffer(b"".join(prefixes), dtype=np.uint8).reshape(B, -1)
        )
        sp_state, sp_pending = HB.device_sponge_from_bytes(transcripts.T)
        forests, codewords, root_devs, alpha_devs = [], [], [], []
        n = d.N
        for r in range(rounds):
            if (
                r < rounds - 1
                and self.mesh is None
                and n >= LANE
                and (B * n) % (2 * LANE) == 0
                and B * n <= _FOREST_FUSE_CAP
            ):
                # Whole round fused into one dispatch.
                leaf, tail, roots, sp_state, sp_pending, alpha_red, folded = (
                    _batch_round_fn(B, n, int(sp_pending.shape[0]))(
                        codeword,
                        sp_state,
                        sp_pending,
                        fri._plan.inv_x_mont(r),
                        jnp.uint32(_INV2),
                        jnp.uint32(_INV2_SHOUP),
                    )
                )
                levels = [(leaf, n)]
                w = n
                for rows in tail:
                    w //= 2
                    levels.append((rows, w))
                forests.append(BatchedTrees(levels, B, n))
                root_devs.append(roots)
                alpha_devs.append(alpha_red)
                codewords.append(codeword)
                codeword = folded
                n //= 2
                continue
            forest = BatchedTrees.from_values(codeword, B, n)
            forests.append(forest)
            roots = forest.root_bytes_dev()
            root_devs.append(roots)
            if r == rounds - 1:
                break
            alpha_red, sp_state, sp_pending = HB.device_sponge_root_alpha(
                sp_state, sp_pending, roots.T
            )
            alpha_devs.append(alpha_red)
            codewords.append(codeword)
            codeword = _fold_kernel_dynamic(
                codeword[:, : n // 2],
                codeword[:, n // 2 :],
                fri._plan.inv_x_mont(r),
                alpha_red[:, None],
                jnp.uint32(_INV2),
                jnp.uint32(_INV2_SHOUP),
            )
            n //= 2
        codewords.append(codeword)

        # Fetch #2: all roots + device alphas + last codewords.
        roots_h, alphas_dev_h, last_h = self._fetch(
            [root_devs, alpha_devs, codewords[-1]]
        )
        for b in range(B):
            for r in range(rounds):
                root = Hash(
                    np.asarray(roots_h[r][b]).astype(np.uint8).tobytes()
                )
                streams[b].push(MerkleRoot(root))
                fss[b].absorb(root.data)
                if r < rounds - 1:
                    alpha = fss[b].challenge(field)
                    if int(alphas_dev_h[r][b]) != alpha.value % P:
                        raise RuntimeError(
                            "device/host transcript divergence"
                        )
            streams[b].push(
                FieldElements(tuple(int(v) for v in np.asarray(last_h[b])))
            )

        # Index sampling per proof (host, native C).
        per_proof_indices = []
        for b in range(B):
            seed = Hash.from_u64(fss[b].challenge(field).value).data
            per_proof_indices.append(
                fri.sample_indices(
                    seed,
                    int(codewords[1].shape[1]) if rounds > 1 else d.N,
                    int(codewords[-1].shape[1]),
                    k,
                )
            )

        # Dispatch every round's query gathers + the trace openings, then
        # ONE device_get (fetch #3).
        round_meta, round_dev = [], []
        idx = [list(ix) for ix in per_proof_indices]
        for i in range(len(codewords) - 1):
            half = int(codewords[i].shape[1]) // 2
            idx = [[j % half for j in ix] for ix in idx]
            a_idx = jnp.asarray(idx, dtype=jnp.int32)          # (B, k)
            b_idx = a_idx + half
            ab_idx = jnp.concatenate([a_idx, b_idx], axis=1)   # (B, 2k)
            c_idx = a_idx
            dev = [
                jnp.take_along_axis(codewords[i], ab_idx, axis=1),
                jnp.take_along_axis(codewords[i + 1], c_idx, axis=1),
                forests[i].open_batch_dev(ab_idx),
                forests[i + 1].open_batch_dev(c_idx),
            ]
            round_meta.append([list(ix) for ix in idx])
            round_dev.append(dev)

        # Trace openings at round-0 query points.
        trace_cols_idx = []
        half0 = d.N // 2
        for b in range(B):
            qps = []
            for j in per_proof_indices[b]:
                a = j % half0
                qps.extend([a, a + half0])
            cols_idx = [
                (qp + fo * cfg.blowup) % d.N
                for qp in qps
                for fo in self.air.frame_offsets
            ]
            trace_cols_idx.append(cols_idx)
        tci = jnp.asarray(trace_cols_idx, dtype=jnp.int32)     # (B, K)
        trace_vals_dev = jnp.take_along_axis(
            jnp.asarray(trace_lde),
            tci[:, None, :],
            axis=2,
        )                                                       # (B, c, K)
        trace_sib_dev = trace_forest.open_batch_dev(tci)

        fetched_rounds, trace_vals, trace_sib = self._fetch(
            [round_dev, trace_vals_dev, trace_sib_dev]
        )

        # Emit per proof, in exactly the single-prover order — raw wire
        # segments from the fetched arrays (stream.raw_*; byte-identical,
        # no per-level Hash objects).
        from stark_tpu.stream import raw_field_elements, raw_merkle_path

        for i, (meta, f) in enumerate(zip(round_meta, fetched_rounds)):
            cur_vals, nxt_vals, cur_sib, nxt_sib = f
            for b in range(B):
                seg = [
                    raw_field_elements(
                        [cur_vals[b][s], cur_vals[b][k + s], nxt_vals[b][s]]
                    )
                    for s in range(k)
                ]
                cs, ns = cur_sib[:, b], nxt_sib[:, b]
                for s in range(k):
                    seg.append(raw_merkle_path(cs, s))
                    seg.append(raw_merkle_path(cs, k + s))
                    seg.append(raw_merkle_path(ns, s))
                streams[b].push_raw(b"".join(seg))

        for b in range(B):
            ts = trace_sib[:, b]
            seg = []
            for t in range(len(trace_cols_idx[b])):
                seg.append(raw_field_elements(trace_vals[b][:, t]))
                seg.append(raw_merkle_path(ts, t))
            streams[b].push_raw(b"".join(seg))

        return [s.serialize() for s in streams]


