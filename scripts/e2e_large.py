"""Measure the large end-to-end STARK configs on the real TPU.

BASELINE.md configs 3/4 at scale: prove + verify wall time, steady state,
with the per-phase breakdown from PhaseTimer.  Run when the axon relay is
up:

    python scripts/e2e_large.py [t_log2=20]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    T = 1 << lg

    import jax

    from stark_tpu import StarkConfig, StarkProver, StarkVerifier
    from stark_tpu.models.fibonacci import FibonacciAir
    from stark_tpu.utils.cache import enable_compilation_cache
    from stark_tpu.utils.profiling import PhaseTimer

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices()[0])

    from stark_tpu.models.fibonacci import fibonacci_trace_cols_device

    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    air = FibonacciAir()
    prover = StarkProver(air, cfg)

    # Witness generated ON DEVICE (a 2^20-row trace is a 4 MB upload at
    # the relay's ~30 MB/s otherwise); equality with the host generator
    # is pinned by tests/test_models.py.
    cols = fibonacci_trace_cols_device(T).block_until_ready()

    t0 = time.perf_counter()
    proof = prover.prove(trace_cols=cols)  # compile + warm
    print(f"cold prove: {time.perf_counter() - t0:.2f} s")

    best = float("inf")
    for _ in range(3):
        timer = PhaseTimer()
        t0 = time.perf_counter()
        proof = prover.prove(trace_cols=cols, timer=timer)
        dt = time.perf_counter() - t0
        if dt < best:
            best, best_phases = dt, timer.ms()
    print(f"prove T=2^{lg} (N=2^{lg + 2}): {best:.3f} s steady")
    print("phases:", best_phases)
    print("proof bytes:", len(proof))

    verifier = StarkVerifier(air, cfg)
    assert verifier.verify(proof)
    best_v = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ok = verifier.verify(proof)
        best_v = min(best_v, time.perf_counter() - t0)
    assert ok
    print(f"verify: {best_v:.3f} s steady")


if __name__ == "__main__":
    main()
