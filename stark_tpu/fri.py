"""FRI low-degree test: commit / fold / query / prove / verify.

Protocol contract: reference src/fri.rs:29-525, reproduced transcript- and
proof-byte-exactly.  TPU-native re-design of the hot loops:

* **fold** (fri.rs:57-91): the reference computes x = offset*omega^i with a
  per-element modular exponentiation (O(N log N) muls per round).  Here each
  round's inverse-ladder 1/x_i = offset^{-1} * omega^{-i} is precomputed once
  (log-doubling), stored in Montgomery form, and the fold is a fused
  elementwise device op:  folded = 2^{-1} * ((a+b) + alpha*(1/x)*(a-b)).
* **commit** (fri.rs:105-156): per-round leaf hashing and Merkle levels are
  batched device ops (ops/hash_batch).  Trees are cached and reused in the
  query phase — the reference rebuilds identical trees (fri.rs:288-298);
  the bytes produced are the same.
* **host control plane**: transcript, challenges, index sampling
  (fri.rs:168-213) and proof-stream writes are sequential byte-exact Python.

Bit-exactness quirks preserved (SURVEY section 3.6): challenges stay
unreduced u64 until they enter modular ops; the index-sampling seed is
Hash::from_u64 of the RAW challenge value (fri.rs:272); commit pads leaf
vectors to a power of two with zero hashes (fri.rs:123-125 — a no-op for
power-of-two codewords).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.field import FieldElement, FiniteField
from stark_tpu.hashfn import Hash, hash_bytes
from stark_tpu.merkle import MerkleTree
from stark_tpu.ops import fieldops as F
from stark_tpu.ops import ntt as NTT
from stark_tpu.ops.fieldops import P
from stark_tpu.stream import (
    FieldElements,
    MerklePath,
    MerkleRoot,
    ProofStream,
)
from stark_tpu.utils.profiling import NULL_TIMER, reason


@dataclass
class QueryData:
    """API-parity struct (reference fri.rs:23-27 — declared there but never
    constructed; the real proof artifact is the ProofStream)."""

    indices: list
    values: list
    paths: list


@dataclass
class FriProof:
    """API-parity struct (reference fri.rs:17-21 — declared there but never
    constructed; the real proof artifact is the ProofStream)."""

    commitments: list
    queries: list
    final_polynomial: object | None = None


@functools.partial(jax.jit, static_argnames=())
def _fold_kernel(a, b, inv_x_mont, alpha_w, alpha_ws, inv2_w, inv2_ws):
    """folded = 2^{-1} * ((a + b) + alpha/x * (a - b)), all mod p.

    inv_x_mont holds (offset*omega^i)^{-1} * R mod p; one Shoup multiply by
    the round's alpha and one Montgomery multiply by (a-b) keep everything
    in a single fused elementwise pass.
    """
    s = F.addmod(a, b)
    d = F.submod(a, b)
    t = F.shoup_mul(inv_x_mont, alpha_w, alpha_ws)  # alpha/x * R mod p
    u = F.mont_mul(t, d)                            # alpha/x * (a-b)
    return F.shoup_mul(F.addmod(s, u), inv2_w, inv2_ws)


@functools.partial(jax.jit, static_argnames=())
def _fold_kernel_dynamic(a, b, inv_x_mont, alpha_red, inv2_w, inv2_ws):
    """Fold with a *traced* (device-resident) alpha scalar — used by the
    device-chained commit, where alpha never visits the host.  Shoup needs
    a precomputed companion, so alpha multiplies via Montgomery instead:
    mont_mul(invx * R, alpha) = invx * alpha (standard form)."""
    s = F.addmod(a, b)
    d = F.submod(a, b)
    t = F.mont_mul(inv_x_mont, alpha_red)           # alpha/x mod p
    u = F.mulmod(t, d)                              # alpha/x * (a-b)
    return F.shoup_mul(F.addmod(s, u), inv2_w, inv2_ws)


@functools.lru_cache(maxsize=None)
def _commit_round_fn(W: int, q: int):
    """ONE dispatch for a full device-chain commit round at codeword width
    ``W`` (<= hash_batch.FUSE_MAX_WIDTH) with a ``q``-byte sponge tail:
    leaf hash + every Merkle level + root absorb (incremental sponge) +
    challenge (mod p) + fold.  Dispatch latency through the relay
    (~1.3 ms/call) dominates this round's compute, so fusing the round is
    worth ~4x per round over separate tree/concat/alpha/fold calls
    (fri.rs:116-147 is the per-round contract being fused)."""
    from stark_tpu.ops import hash_batch as HB

    half = W // 2

    def fn(codeword, sp_state, sp_pending, inv_x_mont, inv2_w, inv2_ws):
        v2d = (
            codeword.reshape(W // HB.LANE, HB.LANE)
            if W >= 2 * HB.LANE
            else codeword[None, :]
        )
        leaf = HB.leaf_hash_rows_core(v2d, rolled=True)
        levels, root, stack = HB._tail_levels_core(leaf)
        sp_state, sp_pending = HB.sponge_absorb(sp_state, sp_pending, root)
        alpha_red = HB.state_alpha(HB.sponge_state(sp_state, sp_pending))
        s = F.addmod(codeword[:half], codeword[half:])
        d = F.submod(codeword[:half], codeword[half:])
        t = F.mont_mul(inv_x_mont, alpha_red)
        folded = F.shoup_mul(F.addmod(s, F.mulmod(t, d)), inv2_w, inv2_ws)
        return leaf, levels, root, sp_state, sp_pending, alpha_red, folded, stack

    return jax.jit(fn)


#: Device-sampling candidate headroom: M = 2*number + this. The host
#: replay falls back to a re-dispatched query phase if M candidates ever
#: yield fewer than ``number`` distinct reduced indices.
_SAMPLE_SLACK = 32

#: Don't build the seen-mask scan for absurd reduced sizes (hostile
#: configs); the classic host path handles them.
_SAMPLE_MAX_REDUCED = 1 << 14

#: Commit rounds at or below this width run INSIDE the mega jit (their
#: trees stay internal buffers); wider rounds dispatch per-round.  Distinct
#: from hash_batch.FUSE_MAX_WIDTH, which picks rolled-vs-unrolled hash
#: kernels by bandwidth regime — a 2^17 round belongs in the mega (buffer
#: materialization dominates) but wants the unrolled leaf chain.
_CHAIN_MAX_WIDTH = 1 << 17  # A/B at N=2^22: 2^16 -> 0.165 s, 2^17 ->
# 0.138 s, 2^18 -> 0.139 s (plateau) — one extra in-mega round wins, two
# only add compile surface.


#: Manual cache for the mega prove jit: lru_cache can't key on the
#: caller-supplied traceable gather, so the caller provides a stable
#: ``extra_key`` and we trust it to pin the gather's semantics.
_MEGA_CACHE: dict = {}


def _mega_prove_fn(key, extra_key, extra_gather):
    """ONE jit for the entire single-fetch prove tail: every FRI commit
    round at or below FUSE_MAX_WIDTH (leaf hash, Merkle levels, root,
    challenge, fold — fri.rs:116-153), the sampling seed + query indices
    (fri.rs:168-213), the query-phase value/path gathers for ALL rounds
    (fri.rs:215-248), the caller's extra gather (the STARK layer's trace
    openings), and the byte-packing of everything the host needs.

    Fusing the gathers into the same jit as the tree builds is what makes
    the chain fast: the per-round tree levels/stacks stay INTERNAL
    buffers, and XLA materializes only the packed output — returning them
    as jit outputs measured ~45 ms of buffer-materialization cost at
    N=2^16 (vs 6 ms for the same compute).

    ``idx_override``/``use_override`` let the host re-run the query phase
    with authoritative indices (same compiled graph) if the device
    sampler's bounded candidate pool ever falls short.
    """
    from stark_tpu.merkle import path_gather_dev
    from stark_tpu.ops import hash_batch as HB

    cache_key = (key, extra_key)
    got = _MEGA_CACHE.get(cache_key)
    if got is not None:
        return got

    (
        widths,          # chain-round codeword lengths (<= FUSE_MAX_WIDTH)
        _q0,             # sponge pending-tail length at chain entry
        number,
        size,
        reduced_size,
        M,
        all_lengths,     # every round's codeword length (wide + chain)
        wide_n_paths,    # path lengths of the wide-prefix trees
        _wide_n_pres,
        _wide_has_stack,
        wide_bitrev,     # per wide tree: pre levels stored bit-reversed
    ) = key
    R = len(all_lengths)
    R0 = R - len(widths)  # wide-prefix rounds

    def fn(
        codeword,
        sponge,          # (state, pending) — incremental transcript sponge
        inv_x_list,
        wide_cws,
        wide_tree_ops,
        wide_roots,
        wide_alphas,
        extra_pack,
        extra_operands,
        idx_override,
        use_override,
        inv2_w,
        inv2_ws,
    ):
        # -- chain rounds (commit + fold) --------------------------------
        # Incremental transcript sponge (continued from the caller's wide
        # rounds): each round folds its 32-byte root and finalizes from
        # the cached state — byte-identical to re-hashing the whole
        # transcript per round (hash_batch.sponge_* docstring).
        sp_state, sp_pending = sponge
        roots = list(wide_roots)
        alphas = list(wide_alphas)
        cws = list(wide_cws)
        tree_ops = list(wide_tree_ops)
        n_paths = list(wide_n_paths)
        for r, W in enumerate(widths):
            v2d = (
                codeword.reshape(W // HB.LANE, HB.LANE)
                if W >= 2 * HB.LANE
                else codeword[None, :]
            )
            # Rolled mixes only in the latency regime; rounds between
            # FUSE_MAX_WIDTH and _CHAIN_MAX_WIDTH are bandwidth-bound and
            # keep the unrolled leaf chain.
            leaf = HB.leaf_hash_rows_core(
                v2d, rolled=W <= HB.FUSE_MAX_WIDTH
            )
            _levels, root, stack = HB._tail_levels_core(leaf)
            tree_ops.append(((leaf,), stack))
            n_paths.append(W.bit_length() - 1)
            roots.append(root)
            sp_state, sp_pending = HB.sponge_absorb(sp_state, sp_pending, root)
            cws.append(codeword)
            if r == len(widths) - 1:
                break
            alpha_red = HB.state_alpha(
                HB.sponge_state(sp_state, sp_pending)
            )
            alphas.append(alpha_red)
            half = W // 2
            s = F.addmod(codeword[:half], codeword[half:])
            d = F.submod(codeword[:half], codeword[half:])
            t = F.mont_mul(inv_x_list[R0 + r], alpha_red)
            codeword = F.shoup_mul(
                F.addmod(s, F.mulmod(t, d)), inv2_w, inv2_ws
            )

        # -- index sampling (device; host replays byte-exactly) ----------
        seed = HB.seed_digest_rows_from_state(
            HB.sponge_state(sp_state, sp_pending)
        )
        indices, count = HB.sample_indices_core(
            seed, M, size, reduced_size, number
        )
        top_idx = jnp.where(use_override, idx_override, indices)

        # -- query gathers for every round (fri.rs:215-248 reads) --------
        idx = top_idx.astype(jnp.int32)
        bitrevs = list(wide_bitrev) + [False] * len(widths)
        qouts = []
        for i in range(R - 1):
            half = all_lengths[i] // 2
            idx = idx & (half - 1)
            ab = jnp.concatenate([idx, idx + half])
            qouts.append(
                (
                    jnp.take(cws[i], ab),
                    jnp.take(cws[i + 1], idx),
                    path_gather_dev(*tree_ops[i], ab, n_paths[i],
                                    bitrev_pre=bitrevs[i]),
                    path_gather_dev(*tree_ops[i + 1], idx, n_paths[i + 1],
                                    bitrev_pre=bitrevs[i + 1]),
                )
            )

        extra_out = (
            extra_gather(top_idx, extra_operands)
            if extra_gather is not None
            else None
        )

        return _pack_u8_core(
            [
                extra_pack,
                roots,
                alphas,
                cws[-1],
                indices,
                count,
                qouts,
                extra_out,
            ]
        )

    fn = jax.jit(fn, static_argnames=())
    _MEGA_CACHE[cache_key] = fn
    return fn


@functools.lru_cache(maxsize=None)
def _query_gather_fn(key):
    """ONE dispatch for the whole FRI query phase: per round, the (a, b)
    and c codeword values plus both trees' full sibling paths (fri.rs:
    215-248's reads, batched).  ``key`` pins the static structure
    (codeword lengths, per-tree path lengths / pre-level counts / stack
    presence); arrays arrive as jit arguments so values never bake into
    the compiled graph."""
    from stark_tpu.merkle import path_gather_dev

    lengths, n_paths, _n_pres, _has_stack, bitrevs = key
    R = len(lengths)

    def fn(cws, tree_ops, ab_list, c_list):
        outs = []
        for i in range(R - 1):
            cur_pre, cur_stack = tree_ops[i]
            nxt_pre, nxt_stack = tree_ops[i + 1]
            outs.append(
                (
                    jnp.take(cws[i], ab_list[i]),
                    jnp.take(cws[i + 1], c_list[i]),
                    path_gather_dev(cur_pre, cur_stack, ab_list[i],
                                    n_paths[i], bitrev_pre=bitrevs[i]),
                    path_gather_dev(nxt_pre, nxt_stack, c_list[i],
                                    n_paths[i + 1], bitrev_pre=bitrevs[i + 1]),
                )
            )
        return outs

    return jax.jit(fn)


def _pack_u8_core(pytree):
    """Flatten a device pytree into ONE u8 buffer (leaves bitcast to
    bytes, concatenated in tree order).  Through the relay every fetched
    array pays its own ~1 ms round trip, so fetching a proof's ~60 pieces
    individually costs more than the whole transfer; one packed buffer is
    one round trip."""
    parts = []
    for leaf in jax.tree.leaves(pytree):
        if leaf.dtype != jnp.uint8:
            leaf = jax.lax.bitcast_convert_type(leaf, jnp.uint8)
        parts.append(leaf.reshape(-1))
    return jnp.concatenate(parts)


_pack_u8 = jax.jit(_pack_u8_core)


def _unpack_u8(buf, dev_pytree):
    """Host inverse of :func:`_pack_u8_core`: slice the fetched bytes back
    into numpy leaves shaped/typed like ``dev_pytree``'s."""
    buf = np.asarray(buf)
    leaves, treedef = jax.tree.flatten(dev_pytree)
    out, off = [], 0
    for leaf in leaves:
        dt = np.dtype(str(leaf.dtype))
        nb = int(np.prod(leaf.shape)) * dt.itemsize if leaf.ndim else dt.itemsize
        out.append(
            buf[off : off + nb].view(dt).reshape(leaf.shape)
        )
        off += nb
    assert off == buf.shape[0], (off, buf.shape)
    return jax.tree.unflatten(treedef, out)


class FriPlan:
    """Per-(domain, omega, offset) precomputation: the inverse-x ladder of
    each round, in Montgomery form (offset and omega square per round,
    fri.rs:146-147, so every round's parameters are known upfront).

    Ladders are built LAZILY on first use and cached: only the prover's
    fold path ever needs them — the verifier constructs a `Fri` too
    (fri.rs:313 shares the struct) and must not pay the O(N) host ladder
    computation + device transfer for data it never touches."""

    def __init__(self, domain_length: int, omega: int, offset: int, num_rounds: int):
        self._params = []
        w, o = omega % P, offset % P
        for _ in range(max(num_rounds - 1, 0)):
            self._params.append((domain_length // 2, w, o))
            w = (w * w) % P
            o = (o * o) % P
            domain_length //= 2
        self._cache: dict[int, object] = {}

    def inv_x_mont(self, r: int):
        """(half,) uint32 device array of (offset*omega^i)^{-1} * R mod p
        for round r."""
        got = self._cache.get(r)
        if got is None:
            half, w, o = self._params[r]
            w_inv = pow(w, P - 2, P)
            o_inv = pow(o, P - 2, P)
            ladder = F.host_powers(w_inv, half, scale=o_inv)
            mont = (ladder.astype(np.uint64) * ((1 << 32) % P)) % P
            got = jnp.asarray(mont.astype(np.uint32))
            self._cache[r] = got
        return got


_INV2 = pow(2, P - 2, P)
_INV2_SHOUP = int(F.shoup_precompute(_INV2))


class Fri:
    """Contract: fri.rs:29-55 (parameter invariants included)."""

    def __init__(
        self,
        omega,
        offset,
        domain_length: int,
        expansion_factor: int,
        num_colinearity_tests: int,
        field: FiniteField | None = None,
    ):
        assert domain_length & (domain_length - 1) == 0, (
            "Domain length must be power of 2"
        )
        assert expansion_factor & (expansion_factor - 1) == 0, (
            "Expansion factor must be power of 2"
        )
        assert expansion_factor >= 4, "Expansion factor must be at least 4"
        self.omega = omega.value if isinstance(omega, FieldElement) else int(omega)
        self.offset = offset.value if isinstance(offset, FieldElement) else int(offset)
        self.domain_length = domain_length
        self.field = field or (
            omega.field if isinstance(omega, FieldElement) else FiniteField()
        )
        self.expansion_factor = expansion_factor
        self.num_colinearity_tests = num_colinearity_tests
        self._plan = FriPlan(domain_length, self.omega, self.offset, self.num_rounds())

    def num_rounds(self) -> int:
        """fri.rs:93-103: halve while len > expansion AND 4*tests < len."""
        codeword_length = self.domain_length
        rounds = 0
        while (
            codeword_length > self.expansion_factor
            and 4 * self.num_colinearity_tests < codeword_length
        ):
            codeword_length //= 2
            rounds += 1
        return rounds

    # -- fold (fri.rs:57-91) ---------------------------------------------------

    def fold_codeword(self, codeword, alpha: int, round_idx: int):
        """codeword: (n,) uint32 device array; alpha raw (possibly unreduced)."""
        n = codeword.shape[0]
        half = n // 2
        a_red = alpha % P
        alpha_w = jnp.uint32(a_red)
        alpha_ws = jnp.uint32(int(F.shoup_precompute(a_red)))
        from stark_tpu.ops import pallas_kernels as PK

        if PK.pallas_enabled() and half >= PK._LANES and half % PK._LANES == 0:
            scalars = jnp.asarray(
                [int(a_red), int(F.shoup_precompute(a_red)), _INV2, _INV2_SHOUP],
                dtype=jnp.uint32,
            )
            return PK.fold_pallas(
                codeword[:half],
                codeword[half:],
                self._plan.inv_x_mont(round_idx),
                scalars,
            )
        return _fold_kernel(
            codeword[:half],
            codeword[half:],
            self._plan.inv_x_mont(round_idx),
            alpha_w,
            alpha_ws,
            jnp.uint32(_INV2),
            jnp.uint32(_INV2_SHOUP),
        )

    # -- commit (fri.rs:105-156) -------------------------------------------------

    def build_tree(self, codeword) -> MerkleTree:
        """Codeword commitment tree; the distributed prover overrides this
        with the mesh-sharded builder (parallel/pmerkle.py)."""
        return MerkleTree.from_leaf_values(codeword)

    def build_tree_full_device(self, codeword):
        """Full-device tree for the zero-sync commit chain (any power-of-two
        width — narrow tail rounds stay on device too); None falls back to
        the classic per-round flow."""
        return MerkleTree.from_leaf_values_full_device(codeword)

    #: Device-chained commit: trees, roots, challenges and folds stay on
    #: device with zero per-round host synchronization; the host replays
    #: the byte-identical transcript from one batched root fetch at the
    #: end.  Disabled in subclasses whose trees are not full-device.
    device_chain = True

    #: Fuse each whole commit round (tree + root + challenge + fold) into
    #: one dispatch when the codeword fits FUSE_MAX_WIDTH.  Subclasses with
    #: sharded trees/folds disable this and keep the per-piece chain.
    fused_round = True

    def _fetch(self, tree):
        """device_get hook; the multi-process sharded subclass replicates
        globally-sharded leaves first (a process may not fetch shards it
        does not own)."""
        return jax.device_get(tree)

    def _chain_entry(self) -> int:
        """Codeword width at/below which the single-fetch prove enters the
        mega jit; rounds above it dispatch per-round (still zero-sync).
        The sharded subclass keeps mesh-sharded rounds per-round down to
        its sharding floor."""
        return _CHAIN_MAX_WIDTH

    def _replicate_for_mega(self, codeword, inv_x_list, chain_start: int):
        """Hook before the mega jit: the sharded subclass gathers the
        entry codeword and the chain rounds' inverse-x ladders to a
        replicated layout (one ICI all-gather each) so the fused tail
        compiles as replicated compute; identity on a single device."""
        return codeword, inv_x_list

    def commit(
        self,
        initial_codeword,
        proof_stream: ProofStream,
        fiat_shamir,
        transcript_dev_prefix=None,
        extra_fetch=None,
        prefix_replay=None,
    ):
        """Returns (codewords, trees): the recorded codewords exactly as
        fri.rs:140+151-153 records them, plus their Merkle trees (cached for
        the query phase; the reference rebuilds identical trees).

        Leaf vectors are padded to a power of two with zero hashes
        (fri.rs:123-125) — a no-op here: codeword lengths are pow2.

        Two phases: while codewords are device-tree sized, the whole
        round loop (tree -> root -> challenge -> fold) runs as a device
        dependency chain with NO host round-trips — the challenge hash runs
        on device (ops/hash_batch.device_sponge_root_alpha) and folds take
        the traced alpha.  The host then fetches all roots at once, replays
        the transcript byte-exactly (asserting the device alphas agree),
        and finishes any narrow rounds classically.

        ``transcript_dev_prefix`` extends the chain UPSTREAM: a device (L,)
        u8 transcript OR an incremental sponge ``(state, pending)`` pair
        (e.g. the STARK layer's trace root + constraint challenge bytes,
        never yet fetched) seeds the chain instead of the host
        transcript; ``prefix_replay(fetched_extras)`` then rebuilds
        the host-side prefix (pushing its stream objects and absorbing
        into ``fiat_shamir``) from ``extra_fetch``'s arrays, which ride the
        same batched root fetch."""
        codeword = jnp.asarray(initial_codeword, dtype=jnp.uint32)
        codewords: list = []
        trees: list = []
        last_tree = None
        rounds = self.num_rounds()
        r = 0

        # -- phase 1: device chain ----------------------------------------
        if self.device_chain:
            from stark_tpu.ops import hash_batch as HB

            # Seed with whatever the host transcript already holds (e.g.
            # the STARK layer's trace root + constraint-challenge bytes) —
            # challenges hash the ENTIRE transcript (fiat_shamir.rs:19-25).
            # Incremental sponge over the device transcript: absorb the
            # prefix once; each round folds its 32-byte root and draws
            # the challenge from the cached state — byte-identical to
            # re-hashing the whole transcript (hash_batch.sponge_*).
            prefix = bytes(fiat_shamir.transcript)
            if transcript_dev_prefix is not None:
                assert not prefix, (
                    "device transcript prefix and host prefix are exclusive"
                )
                if isinstance(transcript_dev_prefix, tuple):
                    sp_state, sp_pending = transcript_dev_prefix
                else:
                    sp_state, sp_pending = HB.device_sponge_from_bytes(
                        transcript_dev_prefix
                    )
            else:
                sp_state, sp_pending = HB.device_sponge_from_bytes(
                    jnp.asarray(
                        np.frombuffer(prefix, dtype=np.uint8)
                        if prefix
                        else np.zeros((0,), dtype=np.uint8)
                    )
                )
            root_devs: list = []
            alpha_devs: list = []
            while r < rounds:
                W = int(codeword.shape[0])
                if (
                    self.fused_round
                    and r < rounds - 1
                    and W <= HB.FUSE_MAX_WIDTH
                ):
                    # Whole round (tree + root + challenge + fold) fused
                    # into one dispatch.  The PRE-fold codeword is what the
                    # round records (fri.rs:140).
                    leaf, levels, root_bytes, sp_state, sp_pending, alpha_red, folded, stack = _commit_round_fn(
                        W, int(sp_pending.shape[0])
                    )(
                        codeword,
                        sp_state,
                        sp_pending,
                        self._plan.inv_x_mont(r),
                        jnp.uint32(_INV2),
                        jnp.uint32(_INV2_SHOUP),
                    )
                    tree = MerkleTree(_dev_levels=(leaf,) + levels)
                    tree._root_bytes_dev_cached = root_bytes
                    tree._tail_stack = stack
                    tree._tail_first = 1
                    root_devs.append(root_bytes)
                    alpha_devs.append(alpha_red)
                    codewords.append(codeword)
                    trees.append(tree)
                    codeword = folded
                    r += 1
                    continue
                tree = self.build_tree_full_device(codeword)
                if tree is None:
                    break
                root_bytes = tree.root_bytes_dev()
                root_devs.append(root_bytes)
                if r == rounds - 1:
                    last_tree = tree
                    r += 1
                    break
                alpha_red, sp_state, sp_pending = (
                    HB.device_sponge_root_alpha(
                        sp_state, sp_pending, root_bytes
                    )
                )
                alpha_devs.append(alpha_red)
                codewords.append(codeword)
                trees.append(tree)
                codeword = _fold_kernel_dynamic(
                    codeword[: codeword.shape[0] // 2],
                    codeword[codeword.shape[0] // 2 :],
                    self._plan.inv_x_mont(r),
                    alpha_red,
                    jnp.uint32(_INV2),
                    jnp.uint32(_INV2_SHOUP),
                )
                r += 1
            # One batched fetch for every root (+ device alphas, asserted
            # against the host transcript replay below; + the caller's
            # upstream-prefix arrays; + the final codeword when the chain
            # covered every round — saving its separate sync).
            if root_devs or extra_fetch:
                fetched = self._fetch(
                    [
                        extra_fetch or [],
                        root_devs,
                        alpha_devs,
                        codeword if r == rounds else None,
                    ]
                )
                extras_host, roots_host, alphas_host, last_host = fetched
                if prefix_replay is not None:
                    prefix_replay(extras_host)
                for i, rb in enumerate(roots_host):
                    root = Hash(np.asarray(rb).astype(np.uint8).tobytes())
                    trees_i = trees[i] if i < len(trees) else last_tree
                    trees_i.set_root(root)
                    proof_stream.push(MerkleRoot(root))
                    fiat_shamir.absorb(root.data)
                    if i < len(alphas_host):
                        alpha = fiat_shamir.challenge(self.field)
                        if int(alphas_host[i]) != alpha.value % P:
                            # Integrity tie between the device challenge
                            # path and the host replay — must survive -O.
                            raise RuntimeError(
                                "device/host transcript divergence"
                            )
            else:
                last_host = None
        else:
            last_host = None
        if transcript_dev_prefix is not None and r < rounds:
            raise RuntimeError(
                "upstream device prefix requires the chain to cover every "
                "round (got a fallback at round %d)" % r
            )

        # -- phase 2: classic rounds (narrow codewords) --------------------
        while r < rounds:
            tree = self.build_tree(codeword)
            root = tree.root
            proof_stream.push(MerkleRoot(root))
            fiat_shamir.absorb(root.data)
            if r == rounds - 1:
                last_tree = tree
                r += 1
                break
            alpha = fiat_shamir.challenge(self.field)  # pure; unreduced u64
            codewords.append(codeword)
            trees.append(tree)
            codeword = self.fold_codeword(codeword, alpha.value, r)
            r += 1

        last_np = (
            np.asarray(last_host)
            if last_host is not None
            else np.asarray(self._fetch(codeword))
        )
        proof_stream.push(FieldElements(tuple(int(v) for v in last_np)))
        codewords.append(codeword)
        trees.append(last_tree)
        return codewords, trees

    # -- single-fetch prove (chained commit + sampling + query) --------------

    def _chainable(self) -> bool:
        """True when the whole prove can run as one device dependency
        chain with a single host fetch: fused rounds available, >= 2
        rounds (else there are no queries), and the device sampler's
        seen-mask is reasonably sized."""
        rounds = self.num_rounds()
        if not (self.device_chain and self.fused_round and rounds >= 2):
            return False
        reduced = self.domain_length >> (rounds - 1)
        return (
            reduced <= _SAMPLE_MAX_REDUCED
            and self.num_colinearity_tests <= reduced
        )

    def _prove_chained(
        self,
        initial_codeword,
        fiat_shamir,
        proof_stream: ProofStream,
        timer=NULL_TIMER,
        extra_gather=None,
        extra_operands=None,
        extra_gather_key=None,
        extra_meta=None,
        extra_emit=None,
        transcript_dev_prefix=None,
        extra_fetch=None,
        prefix_replay=None,
    ):
        """The whole prove as ONE mega dispatch + ONE fetch: wide rounds
        (if any) dispatch per-round, then everything else — remaining
        commit rounds, index sampling, all query gathers, the caller's
        extra gather, byte packing — fuses into _mega_prove_fn; no host
        round trip anywhere until the single packed fetch.  The host then
        replays transcript + sampling byte-exactly (fri.rs:105-311) and
        asserts the device values agree; on a sampler shortfall (device
        candidate pool exhausted — vanishingly rare) the SAME graph is
        re-run with the host's indices, preserving byte-exactness
        unconditionally."""
        from stark_tpu.ops import hash_batch as HB

        rounds = self.num_rounds()
        number = self.num_colinearity_tests
        codeword = jnp.asarray(initial_codeword, dtype=jnp.uint32)

        with timer.phase("fri_commit"):
            # Incremental sponge: prefix absorbed once, each round folds
            # its root and draws the alpha from the cached state; the
            # mega continues from (state, pending) — byte-identical to
            # full re-hashes (hash_batch.sponge_*), O(1) per round, one
            # compiled alpha graph for every round.
            prefix = bytes(fiat_shamir.transcript)
            if transcript_dev_prefix is not None:
                assert not prefix, (
                    "device transcript prefix and host prefix are exclusive"
                )
                if isinstance(transcript_dev_prefix, tuple):
                    # Upstream already carries the sponge (the STARK
                    # layer's challenge chain ends with it).
                    sp_state, sp_pending = transcript_dev_prefix
                else:
                    sp_state, sp_pending = HB.device_sponge_from_bytes(
                        transcript_dev_prefix
                    )
            else:
                sp_state, sp_pending = HB.device_sponge_from_bytes(
                    jnp.asarray(
                        np.frombuffer(prefix, dtype=np.uint8)
                        if prefix
                        else np.zeros((0,), dtype=np.uint8)
                    )
                )
            codewords: list = []
            trees: list = []
            root_devs: list = []
            alpha_devs: list = []
            r = 0
            # Wide prefix: per-round dispatches (their unrolled hash chains
            # are the HBM-optimal regime; fusing them is the known compile
            # blowup; on a mesh these rounds carry the SHARDED trees/folds),
            # still zero host syncs.
            chain_entry = self._chain_entry()
            while (int(codeword.shape[0]) > chain_entry
                   and r < rounds - 1):
                tree = self.build_tree_full_device(codeword)
                root_bytes = tree.root_bytes_dev()
                root_devs.append(root_bytes)
                alpha_red, sp_state, sp_pending = (
                    HB.device_sponge_root_alpha(
                        sp_state, sp_pending, root_bytes
                    )
                )
                alpha_devs.append(alpha_red)
                codewords.append(codeword)
                trees.append(tree)
                codeword = _fold_kernel_dynamic(
                    codeword[: codeword.shape[0] // 2],
                    codeword[codeword.shape[0] // 2 :],
                    self._plan.inv_x_mont(r),
                    alpha_red,
                    jnp.uint32(_INV2),
                    jnp.uint32(_INV2_SHOUP),
                )
                r += 1

            # Mega dispatch: every remaining round's commit + fold, the
            # sampling seed + query indices, ALL rounds' query gathers,
            # the caller's trace-opening gather, and the byte-packing —
            # one jit, one output buffer (see _mega_prove_fn).
            widths = tuple(
                self.domain_length >> i for i in range(r, rounds)
            )
            all_lengths = tuple(
                self.domain_length >> i for i in range(rounds)
            )
            sample_size = self.domain_length >> 1
            reduced_size = self.domain_length >> (rounds - 1)
            M = 2 * number + _SAMPLE_SLACK
            wide_tree_ops, wide_n_paths = [], []
            for t in trees:
                ops_t, n_path = t.gather_operands()
                wide_tree_ops.append(ops_t)
                wide_n_paths.append(n_path)
            key = (
                widths,
                int(sp_pending.shape[0]),
                number,
                sample_size,
                reduced_size,
                M,
                all_lengths,
                tuple(wide_n_paths),
                tuple(len(o[0]) for o in wide_tree_ops),
                tuple(o[1] is not None for o in wide_tree_ops),
                tuple(getattr(t, "_bitrev_pre", False) for t in trees),
            )
            inv_x_list = [
                self._plan.inv_x_mont(i) for i in range(rounds - 1)
            ]
            codeword, inv_x_list = self._replicate_for_mega(
                codeword, inv_x_list, r
            )
            mega = _mega_prove_fn(key, extra_gather_key, extra_gather)

            def run_mega(idx_override, use_override: bool):
                return mega(
                    codeword,
                    (sp_state, sp_pending),
                    inv_x_list,
                    list(codewords),
                    wide_tree_ops,
                    root_devs,
                    alpha_devs,
                    extra_fetch or [],
                    extra_operands if extra_operands is not None else [],
                    idx_override,
                    jnp.bool_(use_override),
                    jnp.uint32(_INV2),
                    jnp.uint32(_INV2_SHOUP),
                )

            packed = run_mega(jnp.zeros((number,), jnp.uint32), False)
            # Kick off the device->host copy asynchronously: it streams
            # while the spec below is built (cold: tens of ms of
            # eval_shape) and the transfer wait in fri_fetch shrinks to
            # the remainder.  Cross-process shards go through the
            # replicate-at-fetch path instead.
            if getattr(packed, "is_fully_addressable", True):
                try:
                    packed.copy_to_host_async()
                except AttributeError:  # pragma: no cover
                    pass

            # Host-side unpack spec (static layout of the packed buffer).
            # Cached per structure: the eval_shape trace of the extra
            # gather costs tens of ms per call otherwise.
            ef_leaves = jax.tree.leaves(extra_fetch or [])
            # The spec depends on eval_shape(extra_gather, ..., operands):
            # pin the OPERAND leaf shapes too, not just extra_fetch's —
            # same gather key with different-width operands yields a
            # different packed layout (round-4 cache-collision bug).
            eo_leaves = jax.tree.leaves(
                extra_operands if extra_operands is not None else []
            )
            spec_key = (
                "spec",
                key,
                extra_gather_key,
                jax.tree.structure(extra_fetch or []),
                tuple((l.shape, str(l.dtype)) for l in ef_leaves),
                tuple((l.shape, str(l.dtype)) for l in eo_leaves),
            )
            spec = _MEGA_CACHE.get(spec_key)
            if spec is None:
                SDS = jax.ShapeDtypeStruct
                n_paths_all = list(wide_n_paths) + [
                    w.bit_length() - 1 for w in widths
                ]
                k = number
                qspec = [
                    (
                        SDS((2 * k,), jnp.uint32),
                        SDS((k,), jnp.uint32),
                        SDS((n_paths_all[i], 2 * k, 32), jnp.uint8),
                        SDS((n_paths_all[i + 1], k, 32), jnp.uint8),
                    )
                    for i in range(rounds - 1)
                ]
                extra_spec = (
                    jax.eval_shape(
                        extra_gather,
                        SDS((number,), jnp.uint32),
                        extra_operands if extra_operands is not None else [],
                    )
                    if extra_gather is not None
                    else None
                )
                spec = [
                    jax.tree.map(
                        lambda a: SDS(a.shape, a.dtype), extra_fetch or []
                    ),
                    [SDS((32,), jnp.uint8)] * rounds,
                    [SDS((), jnp.uint32)] * (rounds - 1),
                    SDS((reduced_size,), jnp.uint32),
                    SDS((number,), jnp.uint32),
                    SDS((), jnp.int32),
                    qspec,
                    extra_spec,
                ]
                _MEGA_CACHE[spec_key] = spec
            k = number

        with timer.phase("fri_fetch"):
            (
                extras_host,
                roots_host,
                alphas_host,
                last_host,
                idx_host,
                count_host,
                query_host,
                fetched2,
            ) = _unpack_u8(self._fetch(packed), spec)

        with timer.phase("fri_emit"):
            # Host replay: transcript bytes + challenges (asserting the
            # device alphas), then the stream writes in protocol order.
            if prefix_replay is not None:
                prefix_replay(extras_host)
            for i, rb in enumerate(roots_host):
                root = Hash(np.asarray(rb).astype(np.uint8).tobytes())
                if i < len(trees):
                    trees[i].set_root(root)
                proof_stream.push(MerkleRoot(root))
                fiat_shamir.absorb(root.data)
                if i < len(alphas_host):
                    alpha = fiat_shamir.challenge(self.field)
                    if int(alphas_host[i]) != alpha.value % P:
                        raise RuntimeError(
                            "device/host transcript divergence"
                        )
            proof_stream.push(
                FieldElements(tuple(int(v) for v in np.asarray(last_host)))
            )

            # Sampling replay (fri.rs:266-276) + device-agreement check.
            seed = Hash.from_u64(fiat_shamir.challenge(self.field).value).data
            top_level_indices = self.sample_indices(
                seed, sample_size, reduced_size, number
            )
            dev_ok = int(count_host) >= number and [
                int(v) for v in np.asarray(idx_host)
            ] == top_level_indices
            if not dev_ok:
                # Candidate pool exhausted on device (bounded M candidates
                # vs the reference's unbounded walk): re-run the SAME
                # compiled graph with the host's authoritative indices.
                packed2 = run_mega(
                    jnp.asarray(top_level_indices, jnp.uint32), True
                )
                (_, _, _, _, _, _, query_host, fetched2) = _unpack_u8(
                    self._fetch(packed2), spec
                )
            meta2 = (
                extra_meta(top_level_indices)
                if extra_meta is not None
                else None
            )

            # Emit queries (fri.rs:280-307 order).  All trees on this path
            # are full-device, so the fetched sibling bytes ARE the whole
            # paths; raw wire segments skip per-level Hash construction
            # (stream.raw_* — byte-identical output, ~10x less host work).
            from stark_tpu.stream import raw_field_elements, raw_merkle_path

            for i, f in enumerate(query_host):
                cur_vals, nxt_vals, cur_sib, nxt_sib = f
                seg = [
                    raw_field_elements(
                        [cur_vals[s], cur_vals[k + s], nxt_vals[s]]
                    )
                    for s in range(k)
                ]
                for s in range(k):
                    seg.append(raw_merkle_path(cur_sib, s))
                    seg.append(raw_merkle_path(cur_sib, k + s))
                    seg.append(raw_merkle_path(nxt_sib, s))
                proof_stream.push_raw(b"".join(seg))
            if extra_emit is not None:
                extra_emit(meta2, fetched2)

        return top_level_indices

    def eval_domain(self) -> list[int]:
        """The evaluation domain {offset * omega^i} (fri.rs:158-166 —
        a helper the reference declares but prove/verify never call)."""
        off, w = self.offset % P, self.omega % P
        return [
            (off * pow(w, i, P)) % P for i in range(self.domain_length)
        ]

    # -- index sampling (fri.rs:168-213) ----------------------------------------

    @staticmethod
    def sample_index(byte_array: bytes, size: int) -> int:
        """Fold digest bytes into a u128 accumulator, mod size (fri.rs:168-174)."""
        acc = 0
        for b in byte_array:
            acc = ((acc << 8) ^ b) & ((1 << 128) - 1)
        return acc % size

    def sample_indices(
        self, seed: bytes, size: int, reduced_size: int, number: int
    ) -> list[int]:
        assert number <= 2 * reduced_size, (
            "not enough entropy in indices wrt last codeword"
        )
        assert number <= reduced_size, (
            "cannot sample more indices than available in last codeword; "
            f"requested: {number}, available: {reduced_size}"
        )
        from stark_tpu import native

        if native.AVAILABLE:
            return native.sample_indices(seed, size, reduced_size, number)
        indices: list[int] = []
        reduced: list[int] = []
        counter = 0
        while len(indices) < number:
            digest = hash_bytes(seed + counter.to_bytes(4, "little"))
            index = Fri.sample_index(digest, size)
            reduced_index = index % reduced_size
            counter += 1
            if reduced_index not in reduced:
                indices.append(index)
                reduced.append(reduced_index)
        return indices

    # -- query (fri.rs:215-248) ---------------------------------------------------

    def _query_dispatch(
        self, current_codeword, next_codeword, c_indices, current_tree, next_tree
    ):
        """Launch all device reads for one round's queries (values + both
        trees' sibling paths) WITHOUT fetching.  Returns (meta, device
        pytree); rounds are independent, so the prover dispatches every
        round and fetches everything in one device_get — the cost of the
        query phase is host round-trips, not bytes."""
        half = int(current_codeword.shape[0]) // 2
        a_indices = list(c_indices)
        b_indices = [i + half for i in a_indices]
        meta = (a_indices, b_indices, list(c_indices), current_tree, next_tree)
        dev = [
            jnp.take(
                jnp.asarray(current_codeword),
                jnp.asarray(a_indices + b_indices, dtype=jnp.int32),
            ),
            jnp.take(
                jnp.asarray(next_codeword),
                jnp.asarray(c_indices, dtype=jnp.int32),
            ),
            current_tree.open_batch_dev(a_indices + b_indices),
            next_tree.open_batch_dev(c_indices),
        ]
        return meta, dev

    def _query_emit(self, meta, fetched, proof_stream: ProofStream) -> None:
        """Push one round's triples + auth paths (fri.rs:215-248), stream
        order exact, from host-fetched gather results."""
        a_indices, b_indices, c_indices, current_tree, next_tree = meta
        cur_vals, nxt_vals, cur_sib, nxt_sib = fetched
        k = self.num_colinearity_tests
        cur_paths = (
            current_tree.finish_paths(
                MerkleTree.paths_from_dev(cur_sib), a_indices + b_indices
            )
            if cur_sib is not None
            else current_tree.open_batch(a_indices + b_indices)
        )
        nxt_paths = (
            next_tree.finish_paths(MerkleTree.paths_from_dev(nxt_sib), c_indices)
            if nxt_sib is not None
            else next_tree.open_batch(c_indices)
        )

        for s in range(k):
            triple = (
                int(cur_vals[s]),
                int(cur_vals[k + s]),
                int(nxt_vals[s]),
            )
            proof_stream.push(FieldElements(triple))

        for s in range(k):
            proof_stream.push(MerklePath(tuple(cur_paths[s])))
            proof_stream.push(MerklePath(tuple(cur_paths[k + s])))
            proof_stream.push(MerklePath(tuple(nxt_paths[s])))

    def query(
        self,
        current_codeword,
        next_codeword,
        c_indices: list[int],
        proof_stream: ProofStream,
        current_tree: MerkleTree,
        next_tree: MerkleTree,
    ) -> list[int]:
        """Single-round query (fri.rs:215-248): dispatch + fetch + emit."""
        meta, dev = self._query_dispatch(
            current_codeword, next_codeword, c_indices, current_tree, next_tree
        )
        self._query_emit(meta, self._fetch(dev), proof_stream)
        return meta[0] + meta[1]

    # -- prove (fri.rs:250-311) -----------------------------------------------------

    def prove(
        self,
        initial_codeword,
        fiat_shamir,
        proof_stream: ProofStream,
        timer=NULL_TIMER,
        extra_dispatch=None,
        extra_gather=None,
        extra_operands=None,
        extra_gather_key=None,
        extra_meta=None,
        extra_emit=None,
        transcript_dev_prefix=None,
        extra_fetch=None,
        prefix_replay=None,
    ):
        """extra_dispatch(top_level_indices) -> (meta, device_pytree) lets a
        caller (the STARK layer's trace openings) ride the query phase's
        single device fetch; extra_emit(meta, fetched) consumes it after.
        For the single-fetch chained path the caller instead provides a
        TRACEABLE ``extra_gather(idx_dev, extra_operands) -> pytree``
        (device arrays in ``extra_operands``, semantics pinned by the
        hashable ``extra_gather_key``), with extra_meta(top_level_indices)
        rebuilding the host meta at emit time.
        transcript_dev_prefix / extra_fetch / prefix_replay extend the
        commit chain upstream (see :meth:`commit`)."""
        initial_codeword = jnp.asarray(initial_codeword, dtype=jnp.uint32)
        assert self.domain_length == initial_codeword.shape[0], (
            "initial codeword length does not match domain length"
        )

        if self._chainable() and (
            extra_dispatch is None or extra_gather is not None
        ):
            return self._prove_chained(
                initial_codeword,
                fiat_shamir,
                proof_stream,
                timer=timer,
                extra_gather=extra_gather,
                extra_operands=extra_operands,
                extra_gather_key=extra_gather_key,
                extra_meta=extra_meta,
                extra_emit=extra_emit,
                transcript_dev_prefix=transcript_dev_prefix,
                extra_fetch=extra_fetch,
                prefix_replay=prefix_replay,
            )

        with timer.phase("fri_commit"):
            codewords, trees = self.commit(
                initial_codeword,
                proof_stream,
                fiat_shamir,
                transcript_dev_prefix=transcript_dev_prefix,
                extra_fetch=extra_fetch,
                prefix_replay=prefix_replay,
            )

        with timer.phase("fri_sample"):
            sample_size = (
                codewords[1].shape[0]
                if len(codewords) > 1
                else codewords[0].shape[0]
            )
            # Seed from the RAW (unreduced) challenge value (fri.rs:272).
            seed = Hash.from_u64(fiat_shamir.challenge(self.field).value).data
            top_level_indices = self.sample_indices(
                seed,
                sample_size,
                codewords[-1].shape[0],
                self.num_colinearity_tests,
            )
            indices = list(top_level_indices)

        # The whole query phase costs ONE device dispatch (a fused gather
        # over every round's values and sibling paths — indices are host
        # ints, so per-round reductions are precomputed here) and ONE
        # device fetch.  Trees without tail stacks (sharded subclasses)
        # fall back to per-round dispatches, still fetched once.
        with timer.phase("fri_query"):
            metas = []
            mega = (
                self.fused_round
                and len(codewords) > 1
                and all(
                    t._top_levels is None and t._dev_levels for t in trees
                )
            )
            if mega:
                idx_cur = list(indices)
                ab_list, c_list = [], []
                for i in range(len(codewords) - 1):
                    half = int(codewords[i].shape[0]) // 2
                    idx_cur = [ix % half for ix in idx_cur]
                    a = list(idx_cur)
                    b = [x + half for x in a]
                    metas.append((a, b, list(idx_cur), trees[i], trees[i + 1]))
                    ab_list.append(jnp.asarray(a + b, dtype=jnp.int32))
                    c_list.append(jnp.asarray(idx_cur, dtype=jnp.int32))
                tree_ops, n_paths = [], []
                for t in trees:
                    ops_t, n_path = t.gather_operands()
                    tree_ops.append(ops_t)
                    n_paths.append(n_path)
                key = (
                    tuple(int(c.shape[0]) for c in codewords),
                    tuple(n_paths),
                    tuple(len(ops_t[0]) for ops_t in tree_ops),
                    tuple(ops_t[1] is not None for ops_t in tree_ops),
                    tuple(
                        getattr(t, "_bitrev_pre", False) for t in trees
                    ),
                )
                dev = _query_gather_fn(key)(
                    list(codewords), tree_ops, ab_list, c_list
                )
            else:
                dev = []
                for i in range(len(codewords) - 1):
                    indices = [
                        idx % (int(codewords[i].shape[0]) // 2)
                        for idx in indices
                    ]
                    meta, d = self._query_dispatch(
                        codewords[i],
                        codewords[i + 1],
                        indices,
                        trees[i],
                        trees[i + 1],
                    )
                    metas.append(meta)
                    dev.append(d)
            meta2 = dev2 = None
            if extra_dispatch is not None:
                meta2, dev2 = extra_dispatch(top_level_indices)
            fetched, fetched2 = self._fetch([dev, dev2])
            for meta, f in zip(metas, fetched):
                self._query_emit(meta, f, proof_stream)
            if extra_emit is not None:
                extra_emit(meta2, fetched2)

        return top_level_indices

    # -- verify (fri.rs:313-504) -------------------------------------------------------

    def verify(
        self,
        proof_stream: ProofStream,
        fiat_shamir,
        polynomial_values: list,
        path_sink: list | None = None,
    ) -> bool:
        """``path_sink``: when provided, Merkle authentication triples are
        APPENDED to it instead of verified here — the caller amortizes one
        native batch call across many proofs (StarkVerifier.verify_batch).
        Every other check still runs; a True return then means "valid iff
        the sunk paths authenticate"."""
        field = self.field
        omega = self.omega % P
        offset = self.offset % P
        rounds = self.num_rounds()

        roots: list[Hash] = []
        alphas: list[int] = []
        for _ in range(rounds):
            obj = proof_stream.pop()
            if not isinstance(obj, MerkleRoot):
                reason("missing_root", "Failed to extract Merkle root")
                return False
            roots.append(obj.hash)
            fiat_shamir.absorb(obj.hash.data)
            alphas.append(fiat_shamir.challenge(field).value)  # raw u64

        obj = proof_stream.pop()
        if not isinstance(obj, FieldElements):
            reason("missing_last_codeword", "Failed to extract last codeword")
            return False
        last_codeword = obj.values_u64()  # raw u64 wire values

        if not roots:
            reason("no_roots", "No FRI roots extracted")
            return False
        # Structural totality guard (beyond reference parity, which panics —
        # merkle.rs:12-17): hostile streams may carry a last codeword whose
        # length is zero or not a power of two; MerkleTree would assert.
        # Must be an explicit check (not assert) so it survives `python -O`.
        n_last = int(last_codeword.shape[0])
        if n_last == 0 or n_last & (n_last - 1) != 0:
            reason(
                "last_codeword_malformed",
                "last codeword length is not a power of two",
            )
            return False
        # Leaves hash the RAW u64 wire value (fri.rs:349-352); honest values
        # are reduced and take the batched device path.
        hostile_last = bool((last_codeword >= P).any())
        if hostile_last:
            last_tree = MerkleTree(
                [Hash.from_field_elements([int(v)]) for v in last_codeword]
            )
        else:
            last_tree = MerkleTree.from_leaf_values(
                last_codeword.astype(np.uint32)
            )
        if roots[-1] != last_tree.root:
            reason("last_codeword_malformed", "last codeword is not well formed")
            return False

        # Low-degree check (fri.rs:360-397) via coset iNTT (the last domain is
        # the smooth coset {last_offset * last_omega^i}) instead of the
        # reference's O(n^3) Lagrange — same unique interpolant.
        degree_bound = len(last_codeword) // self.expansion_factor
        if degree_bound == 0:
            reason("last_codeword_too_small", "last codeword too small")
            return False
        degree = degree_bound - 1
        last_omega, last_offset = omega, offset
        for _ in range(rounds - 1):
            last_omega = (last_omega * last_omega) % P
            last_offset = (last_offset * last_offset) % P

        n_last = int(last_codeword.shape[0])
        # check the domain is consistent (last_omega must have order n_last)
        if pow(last_omega, n_last, P) != 1 or (
            n_last > 1 and pow(last_omega, n_last // 2, P) == 1
        ):
            reason("bad_last_omega", "last omega has wrong order")
            return False
        # Host numpy engine: the last codeword is tiny (<= ~4*expansion),
        # so a device dispatch — let alone a cold compile — would dominate.
        vals = (last_codeword % P).astype(np.uint32)
        coeffs = NTT.host_coset_interp(vals, last_offset)
        re_eval = NTT.host_coset_eval(coeffs, last_offset)
        # The reference compares FieldElements by RAW value (ff.rs:50-58):
        # a wire value >= p can never equal the (canonical) re-evaluation.
        if hostile_last or not np.array_equal(re_eval, vals):
            reason("reeval_mismatch", "re-evaluated codeword does not match original!")
            return False
        observed_degree = -1
        for i, c in enumerate(coeffs):
            if int(c) != 0:
                observed_degree = i
        if observed_degree > degree:
            reason(
                "degree_too_high",
                "last codeword does not correspond to polynomial of low "
                f"enough degree (observed degree: {observed_degree}, "
                f"but should be: {degree})",
            )
            return False

        # Index resampling (fri.rs:400-405) — seed from RAW challenge.
        seed = Hash.from_u64(fiat_shamir.challenge(field).value).data
        top_level_indices = self.sample_indices(
            seed,
            self.domain_length >> 1,
            self.domain_length >> (rounds - 1),
            self.num_colinearity_tests,
        )

        for r in range(rounds - 1):
            half_len = self.domain_length >> (r + 1)
            c_indices = [idx % half_len for idx in top_level_indices]
            a_indices = list(c_indices)
            b_indices = [idx + half_len for idx in a_indices]

            aa, bb, cc = [], [], []
            for s in range(self.num_colinearity_tests):
                obj = proof_stream.pop()
                if not isinstance(obj, FieldElements):
                    reason("missing_triple", "Failed to extract triple values")
                    return False
                if len(obj) != 3:
                    reason("bad_triple_arity", "Expected triple of values")
                    return False
                ay, by, cy = obj.values_ints()
                aa.append(ay)
                bb.append(by)
                cc.append(cy)

                if r == 0:
                    polynomial_values.append((a_indices[s], field.new_element(ay)))
                    polynomial_values.append((b_indices[s], field.new_element(by)))

                ax = (offset * pow(omega, a_indices[s], P)) % P
                bx = (offset * pow(omega, b_indices[s], P)) % P
                cx = alphas[r]  # raw u64 — colinearity math reduces per-op
                if not _test_colinearity_scalar((ax, ay), (bx, by), (cx, cy)):
                    reason("colinearity", "colinearity check failure")
                    return False

            # Authentication paths: one native batch call per round per
            # tree (replaces 3k scalar verifies, each with its own ctypes
            # marshaling + per-leaf hash).  Falls back to scalar verifies
            # without the native engine or on hostile unequal-length
            # paths; reasons/labels match the scalar walk (first failure
            # in pop order wins).
            triples = []
            for i in range(self.num_colinearity_tests):
                for label, idx, val, root in (
                    ("aa", a_indices[i], aa[i], roots[r]),
                    ("bb", b_indices[i], bb[i], roots[r]),
                    ("cc", c_indices[i], cc[i], roots[r + 1]),
                ):
                    obj = proof_stream.pop()
                    if not isinstance(obj, MerklePath):
                        # Verify everything popped BEFORE the malformed
                        # object first — the scalar walk would have
                        # rejected an earlier bad path with its own
                        # reason.  (In sink mode the proof is rejected
                        # either way; the pending triples are moot.)
                        if path_sink is None:
                            bad_q = _verify_paths_batch(triples)
                            if bad_q is not None:
                                reason(
                                    "path_verify",
                                    "merkle authentication path verification "
                                    f"fails for {triples[bad_q][0]}",
                                )
                                return False
                        reason("missing_path", f"Failed to extract path for {label}")
                        return False
                    triples.append((label, idx, val, root, obj))
            if path_sink is not None:
                path_sink.extend(triples)
            else:
                bad_q = _verify_paths_batch(triples)
                if bad_q is not None:
                    reason(
                        "path_verify",
                        "merkle authentication path verification fails "
                        f"for {triples[bad_q][0]}",
                    )
                    return False

            omega = (omega * omega) % P
            offset = (offset * offset) % P
        return True


def _verify_paths_batch(triples):
    """``triples``: [(label, idx, raw_val_or_row, root_hash, path_obj)]
    in pop order (raw u64 wire value, or a list of them for multi-value
    leaves; ``path_obj`` is a stream.MerklePath).  Returns the first
    failing position, or None when every path verifies.  Paths of equal
    (length, leaf arity) go through ONE native call per group (leaf
    digests computed in C from the raw u64 wire values — hash.rs:32-35,
    sibling digests taken straight off the wire via ``raw_bytes``); the
    global first failure is the minimum over groups' first failures,
    since group members keep their relative order.  Scalar fallback
    without the native engine."""
    if not triples:
        return None
    from stark_tpu import native

    def _row(val):
        return val if isinstance(val, (list, tuple)) else [val]

    def _scalar(qs):
        for q in qs:
            _, idx, val, root, path_obj = triples[q]
            leaf = Hash.from_field_elements(_row(val))
            if not MerkleTree.verify(leaf, idx, list(path_obj.path), root):
                return q
        return None

    if not native.AVAILABLE:
        return _scalar(range(len(triples)))

    groups: dict[tuple, list[int]] = {}
    for q, (_, _, val, _, path_obj) in enumerate(triples):
        groups.setdefault((len(path_obj), len(_row(val))), []).append(q)
    fails = []
    for (L, _c), qs in groups.items():
        paths_flat = b"".join(triples[q][4].raw_bytes() for q in qs)
        roots_flat = b"".join(triples[q][3].data for q in qs)
        f = native.merkle_verify_batch(
            [_row(triples[q][2]) for q in qs],
            [triples[q][1] for q in qs],
            paths_flat,
            L,
            roots_flat,
        )
        if f == -2:  # unsupported arity: scalar fallback for this group
            f_scalar = _scalar(qs)
            if f_scalar is not None:
                fails.append(f_scalar)
        elif f >= 0:
            fails.append(qs[f])
    return min(fails) if fails else None


_U128_MASK = (1 << 128) - 1


def _sub_ref(l: int, r: int) -> int:
    """Field subtraction with the reference's exact u128 semantics
    (ff.rs:154-160): (p + l - r) computed in u128 *wrapping* arithmetic —
    for adversarial unreduced inputs with r > p + l the reference
    (release-mode) wraps mod 2^128 before reducing."""
    return ((P + l - r) & _U128_MASK) % P


def _test_colinearity_scalar(p0, p1, p2) -> bool:
    """Cross-multiplication colinearity (fri.rs:507-525).  Coordinates may be
    raw (unreduced) u64s; each op reduces, matching ff.rs per-op semantics."""
    (x0, y0), (x1, y1), (x2, y2) = p0, p1, p2
    dy1 = _sub_ref(y1, y0)
    dx1 = _sub_ref(x1, x0)
    dy2 = _sub_ref(y2, y0)
    dx2 = _sub_ref(x2, x0)
    return (dy1 * dx2) % P == (dy2 * dx1) % P
