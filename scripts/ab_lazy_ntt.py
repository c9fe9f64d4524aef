"""A/B the Harvey lazy vs strict fused NTT on the real TPU.

Interleaved, chained timing (relay noise ~0.1 ms; see bench.py for the
methodology).  Run when the axon relay is up:

    python scripts/ab_lazy_ntt.py [n_log2=22]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << lg

    import jax
    import jax.numpy as jnp

    from stark_tpu.ops import ntt as NTT
    from stark_tpu.ops.fieldops import P
    from stark_tpu.ops.ntt_fused import fused_ntt
    from stark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices()[0])

    rng = np.random.default_rng(42)
    x = rng.integers(0, P, size=n, dtype=np.uint32)
    xd = jnp.asarray(x)

    strict = jax.jit(lambda v: fused_ntt(v, lazy=False))
    lazy = jax.jit(lambda v: fused_ntt(v, lazy=True))
    stockham = jax.jit(lambda v: NTT._ntt_jit(v, n))

    # Correctness on-device first.
    r_st = stockham(xd)
    assert bool(jnp.array_equal(r_st, strict(xd)).block_until_ready())
    assert bool(jnp.array_equal(r_st, lazy(xd)).block_until_ready())
    print("on-device equality: stockham == strict == lazy  OK")

    def chain(step, k):
        y = xd
        for _ in range(k):
            y = step(y)
        np.asarray(y.ravel()[0])

    def t_marginal(step, k1=2, k2=12, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chain(step, k1)
            t1 = time.perf_counter()
            chain(step, k2)
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
        return best

    for name, step in [("strict", strict), ("lazy", lazy)]:
        chain(step, 2)  # warm
    # Interleave A/B reps so drift cancels.
    results = {"strict": [], "lazy": [], "stockham": []}
    for rep in range(6):
        for name, step in [
            ("strict", strict),
            ("lazy", lazy),
            ("stockham", stockham),
        ]:
            results[name].append(t_marginal(step, reps=1))
    for name, ts in results.items():
        ms = sorted(t * 1e3 for t in ts)
        print(
            f"{name:9s} best {ms[0]:.3f} ms  median {ms[len(ms)//2]:.3f} ms"
            f"  ({n/ms[0]*1e3/1e6:.0f} M points/s best)"
        )


if __name__ == "__main__":
    main()
