"""Mesh-distributed STARK prover: byte-identical proofs at any device count.

Composition of the sharded kernels:

* trace interpolation + LDE      -> parallel/pntt.py (four-step NTT,
                                    all_to_all over ICI)
* trace / codeword commitment    -> parallel/pmerkle.py (local subtrees,
                                    32*D-byte top reduction)
* constraint evaluation          -> the base prover's fused jit, with every
                                    domain constant device_put sharded — the
                                    pointwise math needs no communication;
                                    the frame shift (jnp.roll) becomes a
                                    boundary collective-permute under GSPMD
* FRI fold                       -> the (i, i+N/2) half-pairing
                                    (reference src/fri.rs:69-88) compiled
                                    with sharded in/out layouts; GSPMD
                                    lowers the half-split to a single-hop
                                    permute between mesh halves
* transcript / challenges / IO   -> replicated host control plane — zero
                                    communication, which is what makes proof
                                    bytes host-count-invariant

Codewords shrink by half each FRI round; once a codeword drops under the
D^2 sharding floor the arrays are microscopic and fall back to the
single-device path (values unchanged, so bytes unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stark_tpu.fri import Fri, _fold_kernel
from stark_tpu.merkle import MerkleTree
from stark_tpu.ops import fieldops as F
from stark_tpu.ops.fieldops import P as PRIME
from stark_tpu.parallel import pmerkle, pntt
from stark_tpu.parallel.mesh import AXIS
from stark_tpu.stark import StarkConfig, StarkProver, StarkVerifier


@functools.lru_cache(maxsize=None)
def _fold_fn(mesh: Mesh, n: int):
    """Jitted sharded fold: (n,) sharded codeword -> (n/2,) sharded."""
    sh = NamedSharding(mesh, P(AXIS))
    half = n // 2

    def fold(x, inv_x_mont, alpha_w, alpha_ws, inv2_w, inv2_ws):
        return _fold_kernel(
            x[:half], x[half:], inv_x_mont, alpha_w, alpha_ws, inv2_w, inv2_ws
        )

    return jax.jit(
        fold,
        in_shardings=(sh, sh, None, None, None, None),
        out_shardings=sh,
    )


class ShardedFri(Fri):
    """FRI whose fold and Merkle commitment run sharded over a mesh.

    Protocol behavior (and bytes) identical to :class:`stark_tpu.fri.Fri`.

    Round-4 architecture: the mesh prover runs the SAME single-fetch
    chained prove as one chip (fri._prove_chained) — wide rounds stay
    per-round with mesh-sharded trees and folds (zero host syncs), then at
    the chain-entry width the codeword is gathered to a replicated layout
    (one ICI all-gather of <= 4*entry bytes) and the existing mega jit
    finishes commit tail + index sampling + ALL query gathers + packing in
    one dispatch.  The wide sharded trees' level rows stay mesh-sharded
    inside the mega's query gathers; GSPMD inserts the (tiny, k-sized)
    cross-shard gathers.  Bytes unchanged at any device count.
    """

    # Sharded trees are full-device (parallel/pmerkle.py), so the zero-sync
    # commit chain AND the fused mega tail apply on the mesh.
    device_chain = True
    fused_round = True

    #: Optional override of the chain-entry width (tests/dryrun force a
    #: small value so sharded wide rounds are exercised at tiny shapes).
    chain_entry_width: int | None = None

    def _chain_entry(self) -> int:
        if self.chain_entry_width is not None:
            return self.chain_entry_width
        # Keep rounds sharded down to the sharded-tree floor (below it the
        # trees are single-device anyway), but never below the fused
        # tail's measured sweet spot.
        from stark_tpu.fri import _CHAIN_MAX_WIDTH
        from stark_tpu.ops import hash_batch as HB

        return max(_CHAIN_MAX_WIDTH, 2 * HB.LANE * self._D)

    def _replicate_for_mega(self, codeword, inv_x_list, chain_start: int):
        rep = NamedSharding(self.mesh, P())

        def pull(x):
            if isinstance(x, jax.Array) and x.sharding != rep:
                return jax.device_put(x, rep)
            return x

        inv_x = list(inv_x_list)
        for i in range(chain_start, len(inv_x)):
            inv_x[i] = pull(inv_x[i])
        return pull(codeword), inv_x

    def build_tree_full_device(self, codeword):
        n = int(codeword.shape[0])
        if self._tree_shardable(n):
            return pmerkle.sharded_tree_from_values(codeword, self.mesh)
        return super().build_tree_full_device(codeword)

    def _fetch(self, tree):
        """Multi-process safe fetch: a process may only device_get shards
        it owns, so globally-sharded leaves (the codeword under P(AXIS),
        gathers over it, ...) are replicated across the mesh first — a
        GSPMD all-gather over ICI, identical bytes on every process (which
        is also what keeps the host control planes in lockstep)."""
        import jax

        if jax.process_count() == 1:
            return jax.device_get(tree)
        rep = NamedSharding(self.mesh, P())

        def pull(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return jax.jit(lambda a: a, out_shardings=rep)(x)
            return x

        return jax.device_get(jax.tree.map(pull, tree))

    def __init__(self, *args, mesh: Mesh, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self._D = mesh.devices.size
        self._sh = NamedSharding(mesh, P(AXIS))
        # Shard each round's (lazily built) inverse-x ladder on the mesh.
        plan, sh, D = self._plan, self._sh, self._D
        base_ladder = plan.inv_x_mont

        def sharded_ladder(r: int):
            lad = base_ladder(r)
            if lad.shape[0] % D == 0:
                lad = jax.device_put(lad, sh)
                plan._cache[r] = lad
            return lad

        plan.inv_x_mont = sharded_ladder

    def _shardable(self, n: int) -> bool:
        return n % self._D == 0 and n >= self._D * max(self._D, 2)

    def _tree_shardable(self, n: int) -> bool:
        # Local subtree combines need >= 2 sublane rows per shard.
        from stark_tpu.ops import hash_batch as HB

        return n % self._D == 0 and n >= 2 * HB.LANE * self._D

    def fold_codeword(self, codeword, alpha: int, round_idx: int):
        n = codeword.shape[0]
        if not self._shardable(n // 2):
            return super().fold_codeword(codeword, alpha, round_idx)
        a_red = alpha % PRIME
        return _fold_fn(self.mesh, n)(
            codeword,
            self._plan.inv_x_mont(round_idx),
            jnp.uint32(a_red),
            jnp.uint32(int(F.shoup_precompute(a_red))),
            jnp.uint32(pow(2, PRIME - 2, PRIME)),
            jnp.uint32(int(F.shoup_precompute(pow(2, PRIME - 2, PRIME)))),
        )

    def build_tree(self, codeword) -> MerkleTree:
        n = codeword.shape[0]
        if self._tree_shardable(n):
            return pmerkle.sharded_tree_from_values(codeword, self.mesh)
        return MerkleTree.from_leaf_values(np.asarray(codeword))


class DistributedStarkProver(StarkProver):
    """Drop-in StarkProver over a 1-D device mesh; proofs byte-identical."""

    def __init__(self, air, cfg: StarkConfig, mesh: Mesh):
        super().__init__(air, cfg)
        self.mesh = mesh
        d = self.dom
        self.fri = ShardedFri(
            omega=d.Omega,
            offset=d.offset,
            domain_length=d.N,
            expansion_factor=cfg.blowup // d.h,
            num_colinearity_tests=cfg.num_colinearity_tests,
            mesh=mesh,
        )
        # Shard every (N,)-sized domain constant used by the fused compose.
        sh = NamedSharding(mesh, P(AXIS))
        for name in ("x_dom", "zinv", "excl", "xshift_t", "xshift_b"):
            setattr(self, name, jax.device_put(getattr(self, name), sh))
        if self.dinv.shape[0]:
            self.dinv = jax.device_put(
                self.dinv, NamedSharding(mesh, P(None, AXIS))
            )

    def _lde_trace(self, cols):
        """(c, T) -> (c, N) via sharded iNTT + sharded LDE (when shardable)."""
        T = cols.shape[-1]
        D = self.mesh.devices.size
        if T % (D * D) != 0:
            return super()._lde_trace(cols)
        sh = NamedSharding(self.mesh, P(None, AXIS))
        cols = jax.device_put(jnp.asarray(cols), sh)
        coeffs = pntt.sharded_intt(cols, self.mesh)
        return pntt.sharded_lde(coeffs, self.cfg.blowup, self.dom.offset, self.mesh)

    def _trace_tree(self, trace_lde) -> MerkleTree:
        from stark_tpu.ops import hash_batch as HB

        N = trace_lde.shape[-1]
        D = self.mesh.devices.size
        if N % D != 0 or N < 2 * HB.LANE * D:
            return super()._trace_tree(trace_lde)
        return pmerkle.sharded_tree_from_rows(trace_lde, self.mesh)


class DistributedStarkVerifier(StarkVerifier):
    """Verification is query-local host work; the base verifier is already
    mesh-agnostic.  Alias kept for API symmetry."""

    def __init__(self, air, cfg: StarkConfig, mesh: Mesh | None = None):
        super().__init__(air, cfg)
        self.mesh = mesh
