"""Persistent XLA compilation cache setup.

First-compile latency dominates cold starts (the unrolled hash graphs and
per-width Merkle levels are large, and this environment compiles through a
remote service).  Enabling JAX's persistent compilation cache makes every
process after the first start warm.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def _host_feature_tag() -> str:
    """Short hash of the host CPU feature flags.

    XLA:CPU persists AOT machine code; this VM image migrates across hosts
    with different AVX feature sets, and loading an entry compiled for the
    wrong features SEGFAULTS inside compilation_cache.get_executable_and_
    time (observed; the 'Machine type used for XLA:CPU compilation doesn't
    match' warnings are the near-miss case).  Keying the cache directory
    by the feature set makes a migrated host start a fresh cache instead
    of loading incompatible binaries."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofeat"


def enable_compilation_cache(
    path: str | None = None, allow_cpu: bool = False
) -> None:
    import jax

    if not allow_cpu:
        # jax.default_backend() initialises the XLA backend, which must not
        # happen before jax.distributed.initialize() — only probe it when
        # the answer can matter (allow_cpu=False).
        try:
            if jax.default_backend() == "cpu":
                # XLA:CPU persists AOT machine code whose feature flags can
                # mismatch across hosts (SIGILL risk); opt in (tests do — the
                # cache is written and read on the same machine).
                return
        except Exception:
            return
    path = path or os.environ.get("STARK_TPU_JAX_CACHE", _DEFAULT_DIR)
    path = f"{path}-{_host_feature_tag()}"
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or unsupported backend: harmless
