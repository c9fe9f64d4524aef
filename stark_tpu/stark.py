"""STARK composer: AIR -> composition polynomial -> FRI.

This layer does not exist in the reference (its `trace.rs` is an orphan and
`FriProof`/`QueryData` are never constructed — SURVEY sections 1-2); it is a
fresh TPU-first design completing the pipeline: ``prove(trace) -> bytes`` /
``verify(bytes) -> bool``.

Protocol (prover):
 1. Interpolate each trace register over the trace domain {w^i} (batched
    iNTT) and low-degree-extend onto the evaluation coset
    {g * W^j}, |coset| = T * blowup (batched NTT).            [device]
 2. Merkle-commit the trace LDE (row hashes, batched); absorb the root.
 3. Draw two Fiat-Shamir challenges (alpha_k, beta_k) per constraint;
    the transcript absorbs each challenge's 8 LE bytes (fs.challenge is
    pure — see transcript.py — so absorption advances the state).
 4. Evaluate transition constraints pointwise on the coset, divide by the
    transition zerofier Z(x) = (x^T - 1) / prod_{tail}(x - w^i) (closed
    form on the coset), add boundary quotients, degree-adjust each term
    with alpha_k * x^shift + beta_k, and sum: the composition codeword,
    of degree <= T-1.                                          [device]
 5. FRI-prove the composition codeword (fri.py — transcript bit-exact
    with the reference protocol).
 6. Open the trace Merkle tree at every FRI round-0 query point and its
    frame-shifted companions.

The verifier mirrors 2-5 from the proof stream, then checks at each FRI
query point that the composition value FRI recorded equals the one
recomputed from the opened trace values.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.field import FiniteField
from stark_tpu.fri import Fri
from stark_tpu.hashfn import Hash
from stark_tpu.merkle import MerkleTree
from stark_tpu.models.air import Air, BatchOps, BoundaryConstraint, ScalarOps
from stark_tpu.ops import fieldops as F
from stark_tpu.ops import hash_batch as HB
from stark_tpu.ops import ntt as NTT
from stark_tpu.ops.fieldops import GENERATOR, P, primitive_nth_root
from stark_tpu.stream import FieldElements, MerklePath, MerkleRoot, ProofStream
from stark_tpu.transcript import FiatShamir
from stark_tpu.utils.profiling import NULL_TIMER, reason


@dataclass(frozen=True)
class StarkConfig:
    trace_length: int
    blowup: int = 4                  # = FRI expansion factor
    num_colinearity_tests: int = 8
    offset: int = GENERATOR          # evaluation coset offset

    def __post_init__(self):
        assert self.trace_length & (self.trace_length - 1) == 0
        assert self.blowup & (self.blowup - 1) == 0 and self.blowup >= 4

    @property
    def domain_size(self) -> int:
        return self.trace_length * self.blowup


class _Domain:
    """Shared prover/verifier domain quantities."""

    def __init__(self, cfg: StarkConfig, air: Air):
        self.cfg = cfg
        self.air = air
        T, N = cfg.trace_length, cfg.domain_size
        self.T, self.N = T, N
        self.omega = primitive_nth_root(T)       # trace-domain generator
        self.Omega = primitive_nth_root(N)       # coset generator
        self.offset = cfg.offset % P
        self.max_off = air.max_offset
        # Transition enforcement rows: 0 .. T-1-max_off; zerofier
        # Z(x) = (x^T - 1) / E(x), E(x) = prod_{i=T-max_off}^{T-1} (x - w^i).
        self.excluded = [pow(self.omega, i, P) for i in range(T - self.max_off, T)]
        self.num_transition = air.num_transition_constraints()
        # Normalize to python ints: a numpy scalar smuggled in as a
        # boundary value would silently wrap the verifier's (unbounded
        # int) spot-check arithmetic at uint64 width.
        self.boundary = [
            BoundaryConstraint(int(bc.row), int(bc.register), int(bc.value))
            for bc in air.boundary_constraints(T)
        ]
        # Degree bookkeeping: trace polys have degree T-1; a constraint of
        # degree d in the registers has degree d*(T-1); its quotient degree
        # is that minus deg Z = T - max_off.  The composition target is the
        # FRI low-degree bound N/expansion - 1 (fri.rs:93-103's bound): for
        # quotient degrees above T-1 (constraint degree >= 2 with frame
        # depth >= 2, or degree >= 3 at all) the FRI expansion factor drops
        # to blowup/h — same evaluation domain N, target degree h*T - 1 —
        # where h is the smallest power of two admitting the quotients.
        cdeg = max(air.constraint_degree * (T - 1) - (T - self.max_off), 0)
        h = 1
        while h * T - 1 < cdeg:
            h *= 2
        if cfg.blowup < 4 * h:
            raise ValueError(
                "AIR out of range for this blowup: constraint degree "
                f"{air.constraint_degree} with frame depth {self.max_off} "
                f"gives a quotient of degree {cdeg} > blowup/4 * T - 1; "
                f"the FRI expansion factor blowup/h = {cfg.blowup}/{h} "
                "must stay >= 4 (fri.rs:41-45).  Use "
                f"blowup >= {4 * h}."
            )
        self.h = h
        self.target_degree = h * T - 1
        self.transition_shift = self.target_degree - cdeg
        self.boundary_shift = self.target_degree - (T - 2)
        assert self.transition_shift >= 0 and self.boundary_shift >= 0

    # -- scalar evaluation at one point (verifier spot checks) ----------------

    def znum_at(self, x: int) -> int:
        return (pow(x, self.T, P) - 1) % P

    def excluded_at(self, x: int) -> int:
        e = 1
        for w in self.excluded:
            e = (e * (x - w)) % P
        return e

    def composition_value_at(
        self, idx: int, trace_rows: dict[int, list[int]], alphas, betas
    ) -> int:
        """Recompute the composition codeword value at coset index idx from
        opened trace rows (trace_rows[k] = registers at index idx+k*blowup)."""
        x = (self.offset * pow(self.Omega, idx, P)) % P
        frame = {k: [v % P for v in trace_rows[k]] for k in self.air.frame_offsets}
        cons = self.air.transition_constraints(frame, ScalarOps)
        znum = self.znum_at(x)
        assert znum != 0
        zinv = pow(znum, P - 2, P)
        exc = self.excluded_at(x)
        total = 0
        ci = 0
        xs_t = pow(x, self.transition_shift, P)
        for c in cons:
            q = (c * exc) % P * zinv % P
            w = (alphas[ci] * xs_t + betas[ci]) % P
            total = (total + w * q) % P
            ci += 1
        xs_b = pow(x, self.boundary_shift, P)
        for bc in self.boundary:
            tv = frame[0][bc.register]
            denom = (x - pow(self.omega, bc.row, P)) % P
            q = (tv - bc.value) % P * pow(denom, P - 2, P) % P
            w = (alphas[ci] * xs_b + betas[ci]) % P
            total = (total + w * q) % P
            ci += 1
        return total


import functools


@functools.lru_cache(maxsize=None)
def _device_challenges_fn(n_challenges: int):
    """ONE dispatch deriving all constraint-combination challenges on
    device from a device transcript prefix (the trace root): for each
    challenge, the digest's first 8 bytes extend the transcript (the raw
    u64 the host absorbs, transcript.py/_draw_constraint_challenges) and
    its mod-p reduction feeds the composition kernel.  Returns
    (digests (k, 8) u8, alphas (k,) u32 mod p, sponge state + pending).

    The prefix length is NOT a parameter: jit retraces per prefix shape,
    and the sponge chunking (sponge_from_bytes) is length-generic — a
    second upstream absorb changing the prefix length is handled by the
    retrace, not by a hand-maintained constant.
    """
    from stark_tpu.ops import hash_batch as HB

    def fn(prefix):
        assert prefix.ndim == 1 and prefix.dtype == jnp.uint8, prefix
        # Incremental sponge: each draw finalizes from the cached
        # absorb state (partial tail + 8 final mixes) instead of
        # re-absorbing the whole growing transcript — byte-identical
        # chunking (hash_batch.sponge_* docstring), ~2x fewer
        # sequential ops on this latency-bound chain.
        state, pending = HB.sponge_from_bytes(prefix)
        digs, alphas = [], []
        for _ in range(n_challenges):
            stf = HB.sponge_state(state, pending)
            digest8 = stf[:8]
            digs.append(digest8)
            alphas.append(HB.state_alpha([stf[j] for j in range(8)]))
            state, pending = HB.sponge_absorb(state, pending, digest8)
        return jnp.stack(digs), jnp.stack(alphas), state, pending

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _trace_open_fn(key):
    """One dispatch for the trace openings: column values + sibling paths
    for every query index.  ``key`` pins the tree's static structure."""
    from stark_tpu.merkle import path_gather_dev

    n_path, _n_pre, _has_stack, bitrev = key

    def fn(trace_lde, tree_ops, idx):
        pre, stack = tree_ops
        return (
            jnp.take(trace_lde, idx, axis=1),
            path_gather_dev(pre, stack, idx, n_path, bitrev_pre=bitrev),
        )

    return jax.jit(fn)


def _dev_cols_idx(top_idx, N: int, blowup: int, offsets: tuple):
    """Device twin of the host query-point expansion (prove step 6): the
    FRI round-0 points (a, a+half) per sampled index, then each frame
    offset — order matches the host comprehension exactly."""
    half = N // 2
    a = top_idx.astype(jnp.int32) & (half - 1)
    qp = jnp.stack([a, a + half], axis=1).reshape(-1)
    offs = jnp.asarray([k * blowup for k in offsets], jnp.int32)
    return (qp[:, None] + offs[None, :]).reshape(-1) & (N - 1)


def _open_gather_full(top_idx, operands, *, N, blowup, offsets, n_path,
                      bitrev=False):
    """TRACEABLE trace-opening gather for the single-fetch chained prove
    (full-device trace trees): FRI top-level indices (device-resident,
    straight off the chain's sampler) -> opened column values + sibling
    paths.  Runs INSIDE fri._mega_prove_fn; semantics pinned by the
    extra_gather_key the prover builds."""
    from stark_tpu.merkle import path_gather_dev

    trace_lde, pre, stack = operands
    idx = _dev_cols_idx(top_idx, N, blowup, offsets)
    return [
        jnp.take(trace_lde, idx, axis=1),
        path_gather_dev(pre, stack, idx, n_path, bitrev_pre=bitrev),
    ]


def _open_gather_values(top_idx, operands, *, N, blowup, offsets):
    """Values-only variant for host-top trace trees (paths are opened on
    host at emit time from the replayed indices)."""
    (trace_lde,) = operands
    return [
        jnp.take(
            trace_lde, _dev_cols_idx(top_idx, N, blowup, offsets), axis=1
        ),
        None,
    ]


def trace_cols_u32(trace_rows) -> np.ndarray:
    """(T, c) trace rows -> (c, T) uint32 columns reduced mod p.

    uint32 ndarray inputs reduce directly (the zero-conversion ingestion
    path — converting a 2^20-row python list costs ~0.15 s); anything else
    takes the exact-integer u64 path, matching the reference's
    i128->u64-cast-then-reduce semantics (trace.rs:29-34, ff.rs:113-118
    via the modular ops)."""
    arr = np.asarray(trace_rows)
    if arr.dtype == np.uint32:
        return arr.T % np.uint32(P)
    return (np.asarray(trace_rows, dtype=np.uint64).T % P).astype(np.uint32)


def _draw_constraint_challenges(fs: FiatShamir, field: FiniteField, count: int):
    """count (alpha, beta) pairs; each raw challenge's 8 LE bytes are
    absorbed so successive challenges differ (challenge() is pure)."""
    alphas, betas = [], []
    for _ in range(count):
        a = fs.challenge(field).value
        fs.absorb(a.to_bytes(8, "little"))
        b = fs.challenge(field).value
        fs.absorb(b.to_bytes(8, "little"))
        alphas.append(a % P)
        betas.append(b % P)
    return alphas, betas


class StarkProver:
    def __init__(self, air: Air, cfg: StarkConfig):
        self.air = air
        self.cfg = cfg
        self.dom = _Domain(cfg, air)
        d = self.dom
        self.fri = Fri(
            omega=d.Omega,
            offset=d.offset,
            domain_length=d.N,
            expansion_factor=cfg.blowup // d.h,
            num_colinearity_tests=cfg.num_colinearity_tests,
        )
        # Device-side domain precomputation.
        self.x_dom = F.powers(d.Omega, d.N, scale=d.offset)        # coset points
        rho = pow(d.Omega, d.T, P)                                  # order = blowup
        znum_cycle = [
            (pow(d.offset, d.T, P) * pow(rho, j, P) - 1) % P
            for j in range(cfg.blowup)
        ]
        znum = np.tile(np.array(znum_cycle, dtype=np.uint32), d.T)
        self.zinv = F.invmod(jnp.asarray(znum))
        exc = jnp.ones((d.N,), dtype=jnp.uint32)
        for w in d.excluded:
            exc = F.mulmod(exc, F.submod(self.x_dom, jnp.uint32(w)))
        self.excl = exc
        self.xshift_t = F.powers(
            pow(d.Omega, d.transition_shift, P),
            d.N,
            scale=pow(d.offset, d.transition_shift, P),
        )
        self.xshift_b = F.powers(
            pow(d.Omega, d.boundary_shift, P),
            d.N,
            scale=pow(d.offset, d.boundary_shift, P),
        )
        # Boundary-quotient denominators 1/(x - w^row) are TRACE-INDEPENDENT
        # — precompute the inverses here instead of a batched Fermat ladder
        # (~45 mulmods over (n_boundary, N)) inside every composition.
        if d.boundary:
            denoms = jnp.stack(
                [
                    F.submod(self.x_dom, jnp.uint32(pow(d.omega, bc.row, P)))
                    for bc in d.boundary
                ]
            )
            self.dinv = F.invmod(denoms)
        else:
            self.dinv = jnp.zeros((0, d.N), jnp.uint32)
        self._compose_jit = jax.jit(self._compose_impl)

    # -- overridable device-path hooks (the distributed prover re-targets
    #    these at the mesh-sharded kernels, see parallel/pstark.py) ---------

    def _lde_trace(self, cols):
        """(c, T) uint32 columns -> (c, N) LDE on the evaluation coset."""
        coeffs = NTT.intt(cols)
        return NTT.lde(coeffs, self.cfg.blowup, self.dom.offset)

    def _trace_tree(self, trace_lde) -> MerkleTree:
        # Device-resident build: row digests and all levels stay on device
        # (tile-native row-tuple layout); only the root crosses to host.
        c, N = trace_lde.shape
        if N > HB.FUSE_MAX_WIDTH:
            # Wide tree: hash the rows straight into semirev storage (the
            # permute rides the c*4 B/lane value reads, not the 32 digest
            # planes — measured 2.5 ms of digest movement at N=2^22, c=1).
            K0 = N.bit_length() - HB.FUSE_MAX_WIDTH.bit_length()
            return MerkleTree.from_leaf_digests_semirev(
                HB.row_hash_rows_semirev(jnp.asarray(trace_lde), K0)
            )
        if N >= 1024:
            cols3d = jnp.asarray(trace_lde).reshape(c, N // HB.LANE, HB.LANE)
            return MerkleTree.from_leaf_digests(HB.row_hash_rows(cols3d))
        return MerkleTree.from_leaf_digests(
            HB.digests_to_bytes(np.asarray(HB.row_hash(jnp.asarray(trace_lde))))
        )

    def prove(
        self, trace_rows=None, timer=NULL_TIMER, *, trace_cols=None
    ) -> bytes:
        """``trace_rows``: (T, c) rows (list or ndarray, reference
        trace.rs:29-34 ingestion semantics).  ``trace_cols``: alternatively
        a (c, T) uint32 REDUCED column array — may be device-resident, in
        which case the witness never crosses host->device (a 2^20-row
        upload costs ~130 ms through this deployment's relay; see
        models/fibonacci.fibonacci_trace_cols_device)."""
        d, cfg = self.dom, self.cfg
        field = FiniteField()
        fs = FiatShamir()
        stream = ProofStream()

        # 1. trace columns -> coefficients -> LDE on the coset  [device]
        with timer.phase("lde"):
            if trace_cols is not None:
                assert trace_rows is None
                cols = trace_cols                                    # (c, T)
                assert cols.shape == (self.air.num_registers, d.T)
            else:
                assert len(trace_rows) == d.T
                cols = trace_cols_u32(trace_rows)                    # (c, T)
            trace_lde = self._lde_trace(cols)                        # (c, N)

        # 2+3. commit trace and draw constraint-combination challenges.
        # When the trace tree is full-device and the FRI chain is fused,
        # the root NEVER crosses to the host here: the device transcript
        # (root + challenge digest bytes) seeds the FRI commit chain, and
        # the host replays it byte-exactly from the chain's single batched
        # fetch (prefix_replay below).
        n_terms = d.num_transition + len(d.boundary)
        with timer.phase("trace_commit"):
            trace_tree = self._trace_tree(trace_lde)
            chain_upstream = (
                trace_tree._top_levels is None
                and self.fri.device_chain
                and self.fri.fused_round
            )
            if not chain_upstream:
                stream.push(MerkleRoot(trace_tree.root))
                fs.absorb(trace_tree.root.data)

        with timer.phase("challenges"):
            if chain_upstream:
                troot_dev = trace_tree.root_bytes_dev()
                digs_dev, ch_dev, sp_state, sp_pending = (
                    _device_challenges_fn(2 * n_terms)(troot_dev)
                )
                alphas_c = ch_dev[0::2]
                betas_c = ch_dev[1::2]
            else:
                alphas, betas = _draw_constraint_challenges(fs, field, n_terms)
                alphas_c = jnp.asarray(alphas, dtype=jnp.uint32)
                betas_c = jnp.asarray(betas, dtype=jnp.uint32)

        # 4. composition codeword  [device, one fused jit]
        with timer.phase("compose"):
            composition = self._compose_jit(
                trace_lde, alphas_c, betas_c, *self._domain_consts()
            )

        def _prefix_replay(extras):
            """Host replay of the deferred trace commitment + challenge
            draws, from the chain's batched fetch; raises on device/host
            divergence (mirrors fri.py's alpha check, survives -O)."""
            troot_h, digs_h = extras
            root = Hash(np.asarray(troot_h).astype(np.uint8).tobytes())
            trace_tree.set_root(root)
            stream.push(MerkleRoot(root))
            fs.absorb(root.data)
            digs = np.asarray(digs_h).astype(np.uint8)
            for i in range(2 * n_terms):
                raw = fs.challenge(field).value
                b = raw.to_bytes(8, "little")
                if b != digs[i].tobytes():
                    raise RuntimeError(
                        "device/host transcript divergence (constraint "
                        "challenges)"
                    )
                fs.absorb(b)

        # 5. FRI — with the trace openings (step 6) riding the query
        # phase's single dispatch + fetch via the extra hooks.
        trace_lde_dev = jnp.asarray(trace_lde)

        def _open_cols_idx(top_indices):
            """Host expansion of FRI top-level indices to trace-opening
            indices (must mirror _dev_cols_idx's order)."""
            half = d.N // 2
            query_points = []
            for idx in top_indices:
                a = idx % half
                query_points.extend([a, a + half])
            return [
                (qp + k * cfg.blowup) % d.N
                for qp in query_points
                for k in self.air.frame_offsets
            ]

        def _open_dispatch(top_indices):
            """Trace openings at the FRI round-0 query points and their
            frame-shifted companions: values + auth paths, one gather."""
            cols_idx = _open_cols_idx(top_indices)
            idx_dev = jnp.asarray(cols_idx, dtype=jnp.int32)
            if trace_tree._top_levels is None:
                ops_t, n_path = trace_tree.gather_operands()
                key = (
                    n_path,
                    len(ops_t[0]),
                    ops_t[1] is not None,
                    trace_tree._bitrev_pre,
                )
                return cols_idx, _trace_open_fn(key)(
                    trace_lde_dev, ops_t, idx_dev
                )
            # Host-top tree (small N): separate take + legacy batch gather.
            return cols_idx, [
                jnp.take(trace_lde_dev, idx_dev, axis=1),
                trace_tree.open_batch_dev(cols_idx),
            ]

        # Traceable gather + operands + stable key for the single-fetch
        # chained prove (fri._mega_prove_fn runs the gather inline so the
        # trace openings ride the one packed fetch).
        # NOTE: the trace width (num_registers) MUST be in the key — two
        # AIRs with identical (N, blowup, offsets) but different widths
        # produce different-shaped gather outputs, and the host unpack
        # spec cached under this key would otherwise collide (round-4
        # regression: fib2 c=2 then square c=1 crashed _unpack_u8).
        shape_key = (
            d.N,
            cfg.blowup,
            tuple(self.air.frame_offsets),
            self.air.num_registers,
        )
        if trace_tree._top_levels is None:
            ops_t, n_path = trace_tree.gather_operands()
            extra_operands = (trace_lde_dev, ops_t[0], ops_t[1])
            extra_gather = functools.partial(
                _open_gather_full,
                N=d.N,
                blowup=cfg.blowup,
                offsets=tuple(self.air.frame_offsets),
                n_path=n_path,
                bitrev=trace_tree._bitrev_pre,
            )
            extra_gather_key = (
                "trace_open_full",
                n_path,
                len(ops_t[0]),
                ops_t[1] is not None,
                trace_tree._bitrev_pre,
            ) + shape_key
        else:
            extra_operands = (trace_lde_dev,)
            extra_gather = functools.partial(
                _open_gather_values,
                N=d.N,
                blowup=cfg.blowup,
                offsets=tuple(self.air.frame_offsets),
            )
            extra_gather_key = ("trace_open_values",) + shape_key

        def _open_emit(cols_idx, fetched):
            vals, sib = fetched
            if sib is not None:
                # Full-device tree: the fetched sibling bytes are whole
                # paths — emit raw wire segments (byte-identical, no
                # per-level Hash objects).
                from stark_tpu.stream import (
                    raw_field_elements,
                    raw_merkle_path,
                )

                seg = []
                for t in range(len(cols_idx)):
                    seg.append(raw_field_elements(vals[:, t]))
                    seg.append(raw_merkle_path(sib, t))
                stream.push_raw(b"".join(seg))
                return
            paths = trace_tree.open_batch(cols_idx)
            for t in range(len(cols_idx)):
                stream.push(FieldElements(tuple(int(v) for v in vals[:, t])))
                stream.push(MerklePath(tuple(paths[t])))

        self.fri.prove(
            composition,
            fs,
            stream,
            timer=timer,
            extra_dispatch=_open_dispatch,
            extra_gather=extra_gather,
            extra_operands=extra_operands,
            extra_gather_key=extra_gather_key,
            extra_meta=_open_cols_idx,
            extra_emit=_open_emit,
            transcript_dev_prefix=(
                (sp_state, sp_pending) if chain_upstream else None
            ),
            extra_fetch=[troot_dev, digs_dev] if chain_upstream else None,
            prefix_replay=_prefix_replay if chain_upstream else None,
        )

        return stream.serialize()

    def _compose_impl(
        self,
        trace_lde,
        alphas,
        betas,
        x_dom,
        zinv,
        excl,
        xshift_t,
        xshift_b,
        dinv,
    ):
        """Composition codeword: pointwise over the coset, fully fuseable.

        alphas/betas are (n_terms,) uint32 arrays (reduced challenges);
        indexing with static term counters keeps the graph unrolled.  The
        (N,)-sized domain constants arrive as ARGUMENTS, not closure
        captures — under the multi-process mesh they are globally sharded
        arrays, which jit may not close over (and passing them keeps the
        compiled graph shared across prover instances)."""
        d = self.dom
        # ONE roll of the whole (c, N) array per frame offset (not per
        # (offset, register) — c*|offsets| full-HBM passes for wide traces).
        frame = {
            k: list(
                trace_lde
                if k == 0
                else jnp.roll(trace_lde, -k * self.cfg.blowup, axis=-1)
            )
            for k in self.air.frame_offsets
        }
        cons = self.air.transition_constraints(frame, BatchOps)
        total = jnp.zeros((d.N,), dtype=jnp.uint32)
        ci = 0
        for c in cons:
            q = F.mulmod(F.mulmod(c, excl), zinv)
            w = F.addmod(F.mulmod(xshift_t, alphas[ci]), betas[ci])
            total = F.addmod(total, F.mulmod(w, q))
            ci += 1
        if d.boundary:
            for bi, bc in enumerate(d.boundary):
                num = F.submod(frame[0][bc.register], jnp.uint32(bc.value % P))
                q = F.mulmod(num, dinv[bi])
                w = F.addmod(F.mulmod(xshift_b, alphas[ci]), betas[ci])
                total = F.addmod(total, F.mulmod(w, q))
                ci += 1
        return total

    def _domain_consts(self):
        return (
            self.x_dom,
            self.zinv,
            self.excl,
            self.xshift_t,
            self.xshift_b,
            self.dinv,
        )


class StarkVerifier:
    def __init__(self, air: Air, cfg: StarkConfig):
        self.air = air
        self.cfg = cfg
        self.dom = _Domain(cfg, air)
        d = self.dom
        self.fri = Fri(
            omega=d.Omega,
            offset=d.offset,
            domain_length=d.N,
            expansion_factor=cfg.blowup // d.h,
            num_colinearity_tests=cfg.num_colinearity_tests,
        )

    def verify(self, proof: bytes, path_sink: list | None = None) -> bool:
        """``path_sink``: defer Merkle path authentication to the caller
        (see :meth:`verify_batch`); all other checks still run here."""
        d, cfg = self.dom, self.cfg
        field = FiniteField()
        fs = FiatShamir()
        stream = ProofStream.deserialize(proof, field)

        obj = stream.pop()
        if not isinstance(obj, MerkleRoot):
            reason("missing_trace_root", "missing trace commitment")
            return False
        trace_root = obj.hash
        fs.absorb(trace_root.data)

        n_terms = d.num_transition + len(d.boundary)
        alphas, betas = _draw_constraint_challenges(fs, field, n_terms)

        polynomial_values: list = []
        if not self.fri.verify(
            stream, fs, polynomial_values, path_sink=path_sink
        ):
            return False

        # Trace openings: pop rows + paths in stream order, authenticate
        # every path in one native batch call (fri._verify_paths_batch),
        # then spot-check composition consistency at every query point.
        from stark_tpu.fri import _verify_paths_batch

        openings: list = []   # (idx, {k: values})
        triples: list = []    # fri._verify_paths_batch operands
        for idx, comp_fe in polynomial_values:
            trace_rows: dict[int, list[int]] = {}
            for k in self.air.frame_offsets:
                j = (idx + k * cfg.blowup) % d.N
                row_obj = stream.pop()
                path_obj = stream.pop()
                if not isinstance(row_obj, FieldElements) or not isinstance(
                    path_obj, MerklePath
                ):
                    reason("missing_trace_opening", "missing trace opening")
                    return False
                values = row_obj.values_ints()
                if len(values) != self.air.num_registers:
                    reason("bad_opening_arity", "bad trace opening arity")
                    return False
                triples.append(
                    ("trace", j, values, trace_root, path_obj)
                )
                trace_rows[k] = values
            openings.append((idx, comp_fe, trace_rows))
        if path_sink is not None:
            path_sink.extend(triples)
        elif _verify_paths_batch(triples) is not None:
            reason("trace_path_verify", "trace opening fails authentication")
            return False
        for idx, comp_fe, trace_rows in openings:
            expected = d.composition_value_at(idx, trace_rows, alphas, betas)
            if comp_fe.value >= P or comp_fe.value != expected:
                reason("composition_mismatch", "composition spot check failed")
                return False
        return True

    def verify_batch(self, proofs: list[bytes]) -> list[bool]:
        """Throughput-mode verification: every proof's non-path checks run
        as usual, then ALL proofs' Merkle authentication paths go through
        ONE amortized native batch call (fri._verify_paths_batch groups by
        (path length, leaf arity) — honest same-config proofs land in at
        most two native calls total, vs 2 per proof + 1 per FRI round
        singly).  On any authentication failure (rare in serving) the
        still-candidate proofs are re-verified individually so per-proof
        results stay exact.  Serving symmetry counterpart to
        batch.BatchStarkProver (merkle.rs:82-96 batch analogue)."""
        from stark_tpu.fri import _verify_paths_batch

        results, all_triples = [], []
        for proof in proofs:
            sink: list = []
            ok = self.verify(proof, path_sink=sink)
            if ok:
                all_triples.extend(sink)
            results.append(ok)
        if _verify_paths_batch(all_triples) is None:
            return results
        return [
            self.verify(proof) if ok else False
            for proof, ok in zip(proofs, results)
        ]
