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
from stark_tpu.stream import FieldElements, MerklePath, MerkleRoot, ProofStream
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


@functools.lru_cache(maxsize=None)
def _batch_round_fn(B: int, W: int, L: int):
    """ONE dispatch for a whole batched commit round: forest (leaf hash +
    every level) + per-proof roots + transcript append + challenges +
    folds — the batched analogue of fri._commit_round_fn."""
    half = W // 2

    def fn(codeword, transcripts, inv_x_mont, inv2_w, inv2_ws):
        leaf = HB.leaf_hash_rows_core(
            codeword.reshape(B * W // LANE, LANE), rolled=True
        )
        tail = HB.forest_tail_levels_core(leaf, B, W)
        roots = jnp.stack([r.reshape(B) for r in tail[-1]], axis=1)
        new_t = jnp.concatenate([transcripts, roots], axis=1)
        alpha = HB.transcript_alpha_core(new_t, rolled=True)  # (B,)
        a, b = codeword[:, :half], codeword[:, half:]
        s = F.addmod(a, b)
        d = F.submod(a, b)
        t = F.mont_mul(inv_x_mont, alpha[:, None])
        folded = F.shoup_mul(F.addmod(s, F.mulmod(t, d)), inv2_w, inv2_ws)
        return leaf, tail, roots, new_t, alpha, folded

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Batched transcript challenges.
# ---------------------------------------------------------------------------

def _batched_alpha_fn(B: int, length: int):
    """(B, length) u8 transcripts -> (B,) alpha mod p (the shared
    device Fiat-Shamir challenge kernel, ops/hash_batch)."""
    return HB._transcript_alpha_fn(length, B)


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
                in_axes=(0, 0, 0, None, None, None, None, None),
            )
        )

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

    def prove_batch(self, traces: list[list[list[int]]]) -> list[bytes]:
        B, cfg, d = self.B, self.cfg, self._single.dom
        assert len(traces) == B
        field = FiniteField()
        fri = self.fri
        rounds = fri.num_rounds()
        k = cfg.num_colinearity_tests

        # 1-2. LDE + trace commitment (batched).
        cols = np.stack(
            [trace_cols_u32(t) for t in traces]
        )                                                   # (B, c, T)
        coeffs = NTT.intt(self._place_cols(cols))
        trace_lde = NTT.lde(coeffs, cfg.blowup, d.offset)   # (B, c, N)
        trace_forest = BatchedTrees.from_rows(
            trace_lde, B, self.air.num_registers, d.N
        )
        trace_roots_dev = trace_forest.root_bytes_dev()     # (B, 32)

        # Fetch trace roots (fetch #1) and start per-proof transcripts.
        trace_roots = np.asarray(trace_roots_dev).astype(np.uint8)
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
                leaf, tail, roots, transcripts, alpha_red, folded = (
                    _batch_round_fn(B, n, int(transcripts.shape[1]))(
                        codeword,
                        transcripts,
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
            transcripts = jnp.concatenate([transcripts, roots], axis=1)
            if r == rounds - 1:
                break
            alpha_red = _batched_alpha_fn(B, int(transcripts.shape[1]))(
                transcripts
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
        roots_h, alphas_dev_h, last_h = jax.device_get(
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

        fetched_rounds, trace_vals, trace_sib = jax.device_get(
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


