"""Merkle commitment trees.  Contract: reference src/merkle.rs:4-96.

Constructors:

* ``MerkleTree(leaves)`` — from a list of :class:`Hash` leaves, mirroring
  ``MerkleTree::new`` (merkle.rs:11-38).  Host-side.
* ``MerkleTree.from_leaf_values(values)`` / ``from_leaf_digests`` — the TPU
  path: leaf hashing and every wide tree level run as batched device ops
  (:mod:`stark_tpu.ops.hash_batch`, one jit per level width, cached), and
  the wide levels stay **device resident** — only the narrow top of the
  tree (width < ``_DEVICE_MIN_WIDTH``) crosses to the host, a one-time
  ~32 KB transfer that also yields the root.  Authentication paths are
  extracted with :meth:`open_batch_dev` — a single jitted gather over all
  device levels for all query indices — because in this deployment a host
  round-trip costs ~30 ms and bulk device->host bandwidth is scarce, while
  query counts are tiny (~2-64).

Level bytes are identical to the scalar construction either way
(merkle.rs:18-29: pairwise ``Hash::combine`` bottom-up, every level kept).
"""

from __future__ import annotations

import functools

import numpy as np

from stark_tpu.hashfn import Hash
from stark_tpu.ops import hash_batch as HB

# Tree levels at least this wide are built and kept on device; narrower
# levels use the numpy engine (no XLA compile) on host.
_DEVICE_MIN_WIDTH = 1024


@functools.lru_cache(maxsize=None)
def _open_batch_fn(n: int, n_dev_levels: int, k: int):
    """Jitted path gather over the device levels (row-tuple layout):
    -> (n_dev_levels, k, 32) u8 sibling digests (level-major, bottom-up)."""
    import jax

    def gather(levels, idx):
        import jax.numpy as jnp

        out = []
        for rows in levels[:n_dev_levels]:
            sib = idx ^ 1
            digs = jnp.stack(
                [r[sib // HB.LANE, sib % HB.LANE] for r in rows], axis=1
            )  # (k, 32)
            out.append(digs)
            idx = idx >> 1
        return jnp.stack(out, axis=0)

    return jax.jit(gather)


def _bitrev_dev(x, nbits: int):
    """Traceable bit reversal of (k,) integer indices over ``nbits`` bits."""
    import jax.numpy as jnp

    out = jnp.zeros_like(x)
    for b in range(nbits):
        out = out | (((x >> b) & 1) << (nbits - 1 - b))
    return out


def _semirev_pos(x, K: int, lgF: int):
    """Stored position of node ``x`` in a semirev-K level (traceable):
    j = hi*2^K + lo  ->  rev_K(lo)*2^lgF + hi.  K = 0 is natural order."""
    if K <= 0:
        return x
    lo = x & ((1 << K) - 1)
    return (_bitrev_dev(lo, K) << lgF) | (x >> K)


def path_gather_dev(pre_levels, stack, idx, n_path: int,
                    bitrev_pre: bool = False):
    """TRACEABLE sibling-path gather for one full-device tree.

    ``pre_levels``: row-tuple levels preceding the tail stack (leaf level
    first); ``stack``: the tree's raw tail stack or None; ``idx``: (k,)
    i32 leaf indices; ``n_path``: total path length (= #levels - 1, root
    excluded).  Returns (n_path, k, 32) u8, level-major bottom-up —
    the same layout :func:`MerkleTree.paths_from_dev` consumes.

    ``bitrev_pre``: the pre levels are stored in SEMIREV order (partial
    bit reversal, hash_batch.semirev_rows_core — the wide halves-combine
    fast path): level ``lvl`` has its low K = n_pre-1-lvl index bits
    reversed to the top, so node j lives at stored position
    _semirev_pos(j, K, lgF) with lgF the cutover level's log2-width.
    The cutover level itself (K=0) is natural.  STATIC: callers must key
    their jits on it.

    Arrays must be passed as jit ARGUMENTS (not closed over), so callers
    key their jit on the static structure and feed
    :meth:`MerkleTree.gather_operands` through the arg list.
    """
    import jax.numpy as jnp

    parts = []
    n_pre = len(pre_levels)
    lgF = n_path - n_pre + 1  # cutover level's log2-width
    for lvl, rows in enumerate(pre_levels):
        sib = (idx >> lvl) ^ 1
        if bitrev_pre:
            sib = _semirev_pos(sib, n_pre - 1 - lvl, lgF)
        parts.append(
            jnp.stack(
                [r[sib // HB.LANE, sib % HB.LANE] for r in rows], axis=1
            )[None]
        )
    n_pre = len(pre_levels)
    if stack is not None and n_path > n_pre:
        parts.append(HB.stack_path_gather(stack, idx, n_pre, n_path - n_pre))
    return jnp.concatenate(parts, axis=0)


@functools.lru_cache(maxsize=None)
def _stack_open_fn(key):
    """Jitted stack-route path gather for light full-device trees."""
    import jax

    n_path, _n_pre, bitrev = key

    def fn(pre, stack, idx):
        return path_gather_dev(pre, stack, idx, n_path, bitrev_pre=bitrev)

    return jax.jit(fn)


def _rows_width(rows) -> int:
    # (R, 128) tiles above one lane tile; (1, w) below it.
    return int(rows[0].shape[0]) * int(rows[0].shape[1])


@functools.lru_cache(maxsize=None)
def _semirev_host(K: int, lgF: int) -> np.ndarray:
    """sigma[j] = stored position of node j in a semirev-K level of width
    2^(K+lgF) (host numpy): natural[j] = stored[sigma[j]]."""
    idx = np.arange(1 << (K + lgF), dtype=np.int64)
    lo = idx & ((1 << K) - 1)
    rev = np.zeros_like(lo)
    for b in range(K):
        rev |= ((lo >> b) & 1) << (K - 1 - b)
    return (rev << lgF) | (idx >> K)


def _rows_to_host_bytes(rows) -> np.ndarray:
    """Fetched row-tuple -> (w, 32) u8 host bytes."""
    import jax

    host = jax.device_get(list(rows))
    return np.ascontiguousarray(
        np.stack([np.asarray(r).reshape(-1) for r in host], axis=0)
        .astype(np.uint8)
        .T
    )


class MerkleTree:
    """Hybrid device/host tree.

    ``_dev_levels``: tuple of row-tuple levels (32 arrays of (w/128, 128)
    u8 each; (1, w) below one tile), widest first — may be empty for
    host-only trees.  ``_top_levels``: list of (w, 32) u8 numpy arrays
    continuing down to width 1, or None for FULL-device trees (all levels
    incl. the root on device; the root is fetched lazily or installed via
    :meth:`set_root` from a batched fetch).
    """

    def __init__(self, leaves=None, *, _dev_levels=(), _top_levels=None):
        self._dev_levels = tuple(_dev_levels)
        if leaves is not None:
            assert len(leaves) > 0, "Cannot create tree from empty leaves"
            n = len(leaves)
            assert n & (n - 1) == 0, "Number of leaves must be power of 2"
            arr = np.frombuffer(
                b"".join(h.data for h in leaves), dtype=np.uint8
            ).reshape(n, 32)
            self._top_levels = _build_host_levels(arr)
        else:
            # _top_levels None with _dev_levels present = FULL-device tree
            # (all levels incl. the root on device; nothing fetched yet).
            assert _top_levels is not None or self._dev_levels
            self._top_levels = _top_levels
        self._host_all = None
        self._root = None
        self._root_bytes_dev_cached = None
        # Raw padded tail stack (ops/hash_batch.tail_levels) for vectorized
        # path gathers; _tail_first = tree level of stack level 0.
        self._tail_stack = None
        self._tail_first = 0
        # Wide pre levels stored in bit-reversed node order (the halves
        # combine fast path); gathers/host access map indices through rev.
        self._bitrev_pre = False

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_leaf_values(values) -> "MerkleTree":
        """Build from raw field values: leaf_i = Hash::from_field_elements([v_i]).

        This is the FRI codeword-commitment path (fri.rs:117-128).
        """
        n = int(values.shape[0])
        assert n > 0 and n & (n - 1) == 0
        if n < _DEVICE_MIN_WIDTH:
            from stark_tpu import native

            vals = np.asarray(values)
            if native.AVAILABLE:
                digests = native.hash_u64s(vals.astype(np.uint64))
            else:
                digests = HB.digests_to_bytes(HB.leaf_hash_np(vals))
            return MerkleTree(_top_levels=_build_host_levels(digests))
        import jax.numpy as jnp

        v2d = jnp.asarray(values, dtype=jnp.uint32).reshape(
            n // HB.LANE, HB.LANE
        )
        return MerkleTree._finish_device(HB.leaf_hash_rows(v2d))

    @staticmethod
    def from_leaf_digests(digest_bytes) -> "MerkleTree":
        """Build from precomputed leaf digests: (N, 32) u8 host bytes, a
        (32, N) u8 device array, or a row-tuple of 32 (N/128, 128) u8."""
        if isinstance(digest_bytes, np.ndarray):
            if digest_bytes.shape[0] < _DEVICE_MIN_WIDTH:
                return MerkleTree(_top_levels=_build_host_levels(digest_bytes))
            return MerkleTree._finish_device(
                HB.stacked_to_rows(HB.bytes_to_digests(digest_bytes))
            )
        if isinstance(digest_bytes, tuple):
            return MerkleTree._finish_device(digest_bytes)
        if digest_bytes.shape[1] < _DEVICE_MIN_WIDTH:
            return MerkleTree(
                _top_levels=_build_host_levels(
                    HB.digests_to_bytes(np.asarray(digest_bytes))
                )
            )
        return MerkleTree._finish_device(HB.stacked_to_rows(digest_bytes))

    @staticmethod
    def _finish_device(leaf_rows) -> "MerkleTree":
        """Device build from leaf digests: per-level combines (one jit per
        width, shared across rounds) while wide, then the fused tail builder
        takes everything at or below ``FUSE_MAX_WIDTH`` to the root in ONE
        dispatch — dispatch latency through the relay (~1.3 ms/call)
        dominates the narrow levels' compute.  The result is a FULL-device
        LIGHT tree: only the pre-tail levels, the root, and the raw padded
        tail stack are materialized (per-level slice outputs measured
        ~45 ms of buffer cost at 2^16; gathers read the stack directly and
        :attr:`levels` reconstructs host bytes from it on demand).

        Wide pre levels are stored SEMIREV (one partial-bit-reversal
        transpose of the leaf digests — hash_batch.semirev_rows_core, NOT
        a scattered gather — then every wide combine takes contiguous
        halves, ~2x faster than the stride-2 deinterleave; after the K
        wide levels the cutover level is NATURALLY ordered for free).
        Path gathers map indices via ``bitrev_pre``."""
        W = _rows_width(leaf_rows)
        if W <= HB.FUSE_MAX_WIDTH:
            root, stack = HB.tail_levels_light(leaf_rows)
            tree = MerkleTree(_dev_levels=(leaf_rows,))
            tree._root_bytes_dev_cached = root
            tree._tail_stack = stack
            tree._tail_first = 1
            return tree
        K0 = W.bit_length() - HB.FUSE_MAX_WIDTH.bit_length()
        dev = [HB.semirev_rows(leaf_rows, K0)]
        while _rows_width(dev[-1]) > HB.FUSE_MAX_WIDTH:
            dev.append(HB.level_rows_halves(dev[-1]))
        n_pre = len(dev)
        root, stack = HB.tail_levels_light(dev[-1])
        tree = MerkleTree(_dev_levels=tuple(dev))
        tree._bitrev_pre = True
        tree._root_bytes_dev_cached = root
        tree._tail_stack = stack
        tree._tail_first = n_pre
        return tree

    @staticmethod
    def from_leaf_digests_semirev(leaf_rows) -> "MerkleTree":
        """Wide full-device tree from leaf digests ALREADY in semirev-K0
        storage (K0 = log2(W / FUSE_MAX_WIDTH)) — the producer fused the
        permute into its own value reads (hash_batch.row_hash_rows_semirev
        moves c*4 B/lane instead of the 32 digest planes).  Otherwise
        identical to :meth:`_finish_device`'s wide branch."""
        W = _rows_width(leaf_rows)
        assert W > HB.FUSE_MAX_WIDTH, "narrow trees take _finish_device"
        dev = [leaf_rows]
        while _rows_width(dev[-1]) > HB.FUSE_MAX_WIDTH:
            dev.append(HB.level_rows_halves(dev[-1]))
        n_pre = len(dev)
        root, stack = HB.tail_levels_light(dev[-1])
        tree = MerkleTree(_dev_levels=tuple(dev))
        tree._bitrev_pre = True
        tree._root_bytes_dev_cached = root
        tree._tail_stack = stack
        tree._tail_first = n_pre
        return tree

    @staticmethod
    def from_leaf_values_full_device(values) -> "MerkleTree":
        """ALL levels (including the root) built and kept on device — no
        host synchronization at all.  Used by the device-chained FRI commit,
        which consumes the root digest on device (ops/hash_batch.
        device_sponge_root_alpha) and fetches every round's root in one
        batched transfer afterwards.  Widths in [256, FUSE_MAX_WIDTH] build
        leaf hash + every level in ONE dispatch; light trees as in
        :meth:`_finish_device`."""
        import jax.numpy as jnp

        n = int(values.shape[0])
        assert n > 1 and n & (n - 1) == 0
        v = jnp.asarray(values, dtype=jnp.uint32)
        v2d = (
            v.reshape(n // HB.LANE, HB.LANE)
            if n >= 2 * HB.LANE
            else v[None, :]
        )
        if n <= HB.FUSE_MAX_WIDTH:
            leaf, root, stack = HB.tree_from_values_light(v2d)
            tree = MerkleTree(_dev_levels=(leaf,))
            tree._root_bytes_dev_cached = root
            tree._tail_stack = stack
            tree._tail_first = 1
            return tree
        # Wide tree: leaves hashed straight into semirev order (the
        # partial-bit-reversal transpose rides the 4 B/lane values, not
        # the 32 B digests); wide levels combine contiguous halves; the
        # cutover level lands naturally ordered (see _finish_device).
        K0 = n.bit_length() - HB.FUSE_MAX_WIDTH.bit_length()
        dev = [HB.leaf_hash_rows_semirev(v, K0)]
        while _rows_width(dev[-1]) > HB.FUSE_MAX_WIDTH:
            dev.append(HB.level_rows_halves(dev[-1]))
        n_pre = len(dev)
        root, stack = HB.tail_levels_light(dev[-1])
        tree = MerkleTree(_dev_levels=tuple(dev))
        tree._bitrev_pre = True
        tree._root_bytes_dev_cached = root
        tree._tail_stack = stack
        tree._tail_first = n_pre
        return tree

    def root_bytes_dev(self):
        """(32,) u8 device root digest (full-device trees only)."""
        assert self._top_levels is None
        if self._root_bytes_dev_cached is not None:
            return self._root_bytes_dev_cached
        if self._tail_stack is not None:
            s = self._tail_stack
            return s[-1, :, 0, 0] if s.ndim == 4 else s[-1, :, 0]
        return HB.root_bytes_from_rows(self._dev_levels[-1])

    # -- level access --------------------------------------------------------

    @property
    def levels(self) -> list[np.ndarray]:
        """All host (w, 32) u8 byte levels, leaf level first (materializes
        device levels — test/debug use).  Light trees reconstruct the tail
        levels from the raw padded stack (valid-prefix slices)."""
        if self._host_all is None:
            out = [_rows_to_host_bytes(lv) for lv in self._dev_levels]
            if self._bitrev_pre:
                # natural[j] = stored[sigma(j)] (semirev storage).
                n_pre = self._tail_first
                lgF = self.num_leaves.bit_length() - n_pre
                out = [
                    arr[_semirev_host(n_pre - 1 - lvl, lgF)]
                    for lvl, arr in enumerate(out)
                ]
            if self._tail_stack is not None:
                stack = np.asarray(self._tail_stack).astype(np.uint8)
                w = self.num_leaves >> self._tail_first
                for i in range(stack.shape[0]):
                    out.append(HB.stack_level_host_bytes(stack, i, w))
                    w //= 2
            self._host_all = out + (self._top_levels or [])
        return self._host_all

    @property
    def num_leaves(self) -> int:
        if self._dev_levels:
            return _rows_width(self._dev_levels[0])
        return self._top_levels[0].shape[0]

    # -- queries (merkle.rs:40-96) -------------------------------------------

    @property
    def root(self) -> Hash:
        if self._root is None:
            if self._top_levels is not None:
                self._root = Hash(self._top_levels[-1][0].tobytes())
            else:
                self._root = Hash(
                    np.asarray(self.root_bytes_dev()).astype(np.uint8).tobytes()
                )
        return self._root

    def set_root(self, root: Hash) -> None:
        """Install a host-known root (fetched in a batch elsewhere) so the
        lazy property never re-fetches."""
        self._root = root

    def get_root(self) -> Hash:
        return self.root

    def leaf(self, index: int) -> Hash:
        if self._dev_levels:
            rows = self._dev_levels[0]
            if self._bitrev_pre:
                n_pre = self._tail_first
                lgF = self.num_leaves.bit_length() - n_pre
                index = int(_semirev_host(n_pre - 1, lgF)[index])
            return Hash(
                bytes(
                    int(np.asarray(r[index // HB.LANE, index % HB.LANE]))
                    for r in rows
                )
            )
        return Hash(self._top_levels[0][index].tobytes())

    @staticmethod
    def commit(leaves) -> Hash:
        """Root-only build (merkle.rs:44-65)."""
        return MerkleTree(leaves).root

    def open(self, index: int) -> list[Hash]:
        """Sibling authentication path, bottom-up (merkle.rs:67-80)."""
        assert index < self.num_leaves, "Index out of bounds"
        if self._dev_levels:
            return self.open_batch([index])[0]
        return self._open_top(index)

    def _open_top(self, index: int) -> list[Hash]:
        proof = []
        idx = index
        for level in self._top_levels[:-1]:
            sibling = idx + 1 if idx % 2 == 0 else idx - 1
            proof.append(Hash(level[sibling].tobytes()))
            idx //= 2
        return proof

    def gather_operands(self):
        """(pre_levels, stack) jit-argument arrays for
        :func:`path_gather_dev`, plus the static path length.  Full-device
        trees only."""
        assert self._top_levels is None
        n_path = self.num_leaves.bit_length() - 1  # pow2-asserted leaves
        if self._tail_stack is not None:
            return (
                self._dev_levels[: self._tail_first],
                self._tail_stack,
            ), n_path
        return (self._dev_levels[:n_path], None), n_path

    def open_batch_dev(self, indices: list[int]):
        """Device-side gather of the device-level portion of every path:
        (L_dev, k, 32) u8 (un-fetched), or None if the tree is host-only.
        Combine with :meth:`paths_from_dev` + the host top via
        :meth:`finish_paths`."""
        if not self._dev_levels:
            return None
        import jax.numpy as jnp

        idx = jnp.asarray(indices, dtype=jnp.int32)
        if self._top_levels is None and self._tail_stack is not None:
            # Light full-device tree: gather straight from the tail stack.
            ops, n_path = self.gather_operands()
            key = (n_path, len(ops[0]), self._bitrev_pre)
            return _stack_open_fn(key)(ops[0], ops[1], idx)
        # Full-device trees include the root level, which paths exclude.
        assert not self._bitrev_pre  # bitrev trees always carry a stack
        n_lv = len(self._dev_levels) - (1 if self._top_levels is None else 0)
        return _open_batch_fn(self.num_leaves, n_lv, len(indices))(
            self._dev_levels, idx
        )

    @staticmethod
    def paths_from_dev(sib) -> list[list[Hash]]:
        """(L_dev, k, 32) u8 (host-fetched) -> per-query bottom-up partial
        paths (device-levels portion)."""
        sib = np.asarray(sib).astype(np.uint8)
        return [
            [Hash(sib[lvl, q].tobytes()) for lvl in range(sib.shape[0])]
            for q in range(sib.shape[1])
        ]

    def finish_paths(
        self, dev_paths: list[list[Hash]], indices: list[int]
    ) -> list[list[Hash]]:
        """Append the host-top portion to fetched device partial paths
        (no-op for full-device trees: the gather already covered them)."""
        if self._top_levels is None:
            return dev_paths
        shift = len(self._dev_levels)
        return [
            dev_paths[q] + self._open_top(idx >> shift)
            for q, idx in enumerate(indices)
        ]

    def open_batch(self, indices: list[int]) -> list[list[Hash]]:
        """Authentication paths for many indices; on device trees the
        device portion is ONE jitted gather + one small transfer."""
        dev = self.open_batch_dev(indices)
        if dev is None:
            return [self._open_top(i) for i in indices]
        return self.finish_paths(MerkleTree.paths_from_dev(dev), indices)

    @staticmethod
    def verify(leaf: Hash, index: int, proof: list[Hash], root: Hash) -> bool:
        """Refold by index parity (merkle.rs:82-96)."""
        from stark_tpu import native

        if native.AVAILABLE:
            return native.merkle_verify(
                leaf.data, index, [h.data for h in proof], root.data
            )
        current = leaf
        idx = index
        for sibling in proof:
            if idx % 2 == 0:
                current = Hash.combine(current, sibling)
            else:
                current = Hash.combine(sibling, current)
            idx //= 2
        return current == root


def _build_host_levels(leaf_bytes: np.ndarray) -> list[np.ndarray]:
    """Pairwise Hash::combine bottom-up, storing every level
    (merkle.rs:18-29) as (w, 32) u8 — native C engine when available,
    numpy engine otherwise (identical bytes)."""
    from stark_tpu import native

    if native.AVAILABLE:
        return native.merkle_levels(leaf_bytes)
    levels = [np.ascontiguousarray(leaf_bytes, dtype=np.uint8)]
    current = HB.bytes_to_digests(levels[0])  # (32, N)
    while current.shape[1] > 1:
        current = HB.merkle_level_np(current)
        levels.append(HB.digests_to_bytes(current))
    return levels
