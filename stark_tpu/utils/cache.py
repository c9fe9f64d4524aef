"""Persistent XLA compilation cache setup.

First-compile latency dominates cold starts (the unrolled hash graphs and
per-width Merkle levels are large, and this environment compiles through a
remote service).  Enabling JAX's persistent compilation cache makes every
process after the first start warm.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


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
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or unsupported backend: harmless
