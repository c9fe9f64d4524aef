"""ctypes bindings for the native host engine (see hash.c).

The library is compiled lazily on first import (cc -O3, cached next to the
source; rebuilt when the source is newer).  Every entry point has a pure
Python/numpy fallback elsewhere in the package, so an environment without a
C compiler still works — ``AVAILABLE`` tells callers which engine is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hash.c")
_SO = os.path.join(_HERE, "libstark_host.so")
_TAG = _SO + ".tag"

AVAILABLE = False
_lib = None


def _host_tag() -> str:
    """ISA identity of this host, so a cached -march=native .so is never
    loaded on a machine with a different vector ISA (copying the package
    directory preserves mtimes, so mtime alone can't catch that — a stale
    AVX-512 build would SIGILL on an AVX2-only box)."""
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            flags = sorted(
                {
                    w
                    for line in f
                    if line.startswith(("flags", "Features"))
                    for w in line.split()[2:]
                }
            )
        ident += " " + " ".join(flags)
    except OSError:
        pass
    return hashlib.sha256(ident.encode()).hexdigest()[:16]


def _build() -> bool:
    # -march=native lets the compiler use the full local vector width for
    # the SoA lane-parallel loops in hash.c (AVX2: one 32-lane row per
    # op); safe because the cache is keyed on source mtime AND the host
    # ISA tag, so the .so is always one built for this machine.  Plain
    # -O3 still auto-vectorizes at baseline SSE2 width if -march is
    # rejected.
    for cc in ("cc", "gcc", "clang"):
        for arch in (["-march=native"], []):
            try:
                subprocess.run(
                    [cc, "-O3", *arch, "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                with open(_TAG, "w") as f:
                    f.write(_host_tag())
                return True
            except (OSError, subprocess.SubprocessError):
                continue
    return False


def _cache_stale() -> bool:
    try:
        if os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            return True
        with open(_TAG) as f:
            return f.read().strip() != _host_tag()
    except OSError:
        return True


def _load():
    global _lib, AVAILABLE
    try:
        if _cache_stale():
            if not _build():
                return
        lib = ctypes.CDLL(_SO)
    except OSError:
        return
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.stark_hash.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.stark_hash.restype = None
    lib.stark_hash_many.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64, u8p]
    lib.stark_hash_many.restype = None
    lib.stark_combine.argtypes = [u8p, u8p, u8p]
    lib.stark_combine.restype = None
    lib.stark_challenge.argtypes = [u8p, ctypes.c_uint64]
    lib.stark_challenge.restype = ctypes.c_uint64
    lib.stark_sample_indices.argtypes = [
        u8p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.stark_sample_indices.restype = ctypes.c_int64
    lib.stark_merkle_verify.argtypes = [
        u8p,
        ctypes.c_uint64,
        u8p,
        ctypes.c_uint64,
        u8p,
    ]
    lib.stark_merkle_verify.restype = ctypes.c_int
    lib.stark_hash_u64s.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_uint64,
        u8p,
    ]
    lib.stark_hash_u64s.restype = None
    lib.stark_merkle_verify_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64),
        u8p,
        ctypes.c_uint64,
        u8p,
        ctypes.c_uint64,
    ]
    lib.stark_merkle_verify_batch.restype = ctypes.c_int64
    lib.stark_merkle_levels.argtypes = [u8p, ctypes.c_uint64, u8p]
    lib.stark_merkle_levels.restype = None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.stark_mds_seed_walk.argtypes = [
        u32p,
        u32p,
        u32p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_uint64,
        u32p,
    ]
    lib.stark_mds_seed_walk.restype = None
    _lib = lib
    AVAILABLE = True


_load()


def _u8(b: bytes):
    return ctypes.cast(ctypes.create_string_buffer(b, len(b)), ctypes.POINTER(ctypes.c_uint8))


def hash_bytes(data: bytes) -> bytes:
    out = (ctypes.c_uint8 * 32)()
    _lib.stark_hash(_u8(data), len(data), out)
    return bytes(out)


def combine(left: bytes, right: bytes) -> bytes:
    out = (ctypes.c_uint8 * 32)()
    _lib.stark_combine(_u8(left), _u8(right), out)
    return bytes(out)


def challenge(transcript: bytes) -> int:
    return int(_lib.stark_challenge(_u8(transcript), len(transcript)))


def sample_indices(
    seed: bytes, size: int, reduced_size: int, number: int
) -> list[int]:
    out = (ctypes.c_uint64 * number)()
    rc = _lib.stark_sample_indices(_u8(seed), size, reduced_size, number, out)
    if rc < 0:
        raise AssertionError(
            "cannot sample more indices than available in last codeword; "
            f"requested: {number}, available: {reduced_size}"
        )
    return list(out)


def hash_u64s(values) -> "np.ndarray":
    """(n,) u64 values -> (n, 32) u8 leaf digests."""
    import numpy as np

    vals = np.ascontiguousarray(values, dtype=np.uint64)
    out = np.empty((len(vals), 32), dtype=np.uint8)
    _lib.stark_hash_u64s(
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(vals),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def merkle_levels(leaf_digests) -> list["np.ndarray"]:
    """(w, 32) u8 leaf digests -> list of (w_l, 32) u8 levels, leaf first."""
    import numpy as np

    leaves = np.ascontiguousarray(leaf_digests, dtype=np.uint8)
    w = leaves.shape[0]
    flat = np.empty((2 * w - 1, 32), dtype=np.uint8)
    _lib.stark_merkle_levels(
        leaves.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    levels = []
    off = 0
    while w >= 1:
        levels.append(flat[off : off + w].copy())
        off += w
        if w == 1:
            break
        w //= 2
    return levels


def mds_seed_walk(m, rc, s0, nb: int, block: int, p: int) -> "np.ndarray":
    """Walk the width-8 quadratic chain s' = (M s)^2 + rc for nb*block
    steps, returning the (nb, 8) block-start states (uint32).  The
    sequential scalar chain runs here on the scalar engine; the TPU
    re-expands the blocks in parallel (examples.mds_square_trace_cols_device)."""
    import numpy as np

    u32p = ctypes.POINTER(ctypes.c_uint32)
    m = np.ascontiguousarray(m, dtype=np.uint32)
    rc = np.ascontiguousarray(rc, dtype=np.uint32)
    s0 = np.ascontiguousarray(s0, dtype=np.uint32)
    out = np.empty((nb, 8), dtype=np.uint32)
    _lib.stark_mds_seed_walk(
        m.ctypes.data_as(u32p),
        rc.ctypes.data_as(u32p),
        s0.ctypes.data_as(u32p),
        nb,
        block,
        p,
        out.ctypes.data_as(u32p),
    )
    return out


def merkle_verify(leaf: bytes, index: int, path: list[bytes], root: bytes) -> bool:
    flat = b"".join(path)
    return bool(
        _lib.stark_merkle_verify(
            _u8(leaf), index, _u8(flat), len(path), _u8(root)
        )
    )


def merkle_verify_batch(
    leaf_rows, indices, paths_flat: bytes, path_len: int, roots_flat: bytes
) -> int:
    """k same-length paths verified in one call.  ``leaf_rows``: (k, c)
    raw u64 wire values (leaf = Hash::from_field_elements(row));
    ``paths_flat``: k*path_len*32 bytes; ``roots_flat``: k*32 bytes.
    Returns -1 if all verify, -2 if the row arity is unsupported (caller
    must fall back), else the first failing position."""
    import numpy as np

    vals = np.ascontiguousarray(leaf_rows, dtype=np.uint64)
    if vals.ndim == 1:
        vals = vals[:, None]
    idxs = np.ascontiguousarray(indices, dtype=np.uint64)
    k, c = vals.shape
    return int(
        _lib.stark_merkle_verify_batch(
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            c,
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            _u8(paths_flat),
            path_len,
            _u8(roots_flat),
            k,
        )
    )
