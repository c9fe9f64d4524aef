"""Profile the host-side verifier: where do verify()'s milliseconds go?

Verification is (by design) almost entirely host work — deserialization,
transcript challenges, colinearity ints, native path authentication — so
cProfile over repeated verifies attributes the cost accurately (no device
asynchrony to fool the profiler, unlike prove).

Usage: python scripts/profile_verify.py [T_log2=14] [reps=50]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    t_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from stark_tpu import StarkConfig, StarkProver, StarkVerifier
    from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
    from stark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(allow_cpu=True)

    T = 1 << t_log2
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    air = FibonacciAir()
    trace = fibonacci_trace_mod_p(T)
    proof = StarkProver(air, cfg).prove(trace)
    verifier = StarkVerifier(air, cfg)
    assert verifier.verify(proof)  # warm any lazy state

    t0 = time.perf_counter()
    for _ in range(reps):
        assert verifier.verify(proof)
    wall = (time.perf_counter() - t0) / reps
    print(f"verify(T=2^{t_log2}): {wall * 1e3:.2f} ms/verify over {reps} reps")

    prof = cProfile.Profile()
    prof.enable()
    for _ in range(reps):
        verifier.verify(proof)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)
    stats.sort_stats("tottime").print_stats(20)


if __name__ == "__main__":
    main()
