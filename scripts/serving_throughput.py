"""Serving-throughput measurement on the real TPU: sequential prove_batch
vs depth-2 pipelined prove_many, plus an optional leak soak.

The pipelined path overlaps batch k+1's device execution with batch k's
packed-buffer fetch + wire emit (DESIGN.md 8b); through this deployment's
relay (~30 ms RTT, ~30 MB/s) that hides most of the per-batch host cost.

    python scripts/serving_throughput.py [B ...]        # default 8 16 32
    python scripts/serving_throughput.py --soak [waves]  # leak soak at B=8

Timing notes (NOTES.md): fresh process per config for fair absolutes; the
relay swings run-to-run throughput ~±30%, so the sequential/pipelined
RATIO within one run is the trustworthy number.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _setup(B: int):
    from stark_tpu import StarkConfig, StarkProver, StarkVerifier  # noqa: F401
    from stark_tpu.batch import BatchStarkProver
    from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
    from stark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    T = 1 << 14
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    air = FibonacciAir()
    trace = fibonacci_trace_mod_p(T)
    bp = BatchStarkProver(air, cfg, B)
    bp.prove_batch([trace] * B)  # compile + warm
    return bp, trace


def sweep(batch_sizes, nb: int = 4) -> None:
    for B in batch_sizes:
        bp, trace = _setup(B)
        seq = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(nb):
                bp.prove_batch([trace] * B)
            seq = min(seq, time.perf_counter() - t0)
        pipe = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = bp.prove_many([trace] * (nb * B), depth=2)
            pipe = min(pipe, time.perf_counter() - t0)
        assert len(out) == nb * B
        print(
            f"B={B} x {nb} batches: sequential {seq:.3f}s = "
            f"{nb * B / seq:.1f} proofs/s; pipelined {pipe:.3f}s = "
            f"{nb * B / pipe:.1f} proofs/s ({seq / pipe:.2f}x)",
            flush=True,
        )


def soak(waves: int = 5, B: int = 8) -> None:
    from stark_tpu import StarkConfig, StarkVerifier
    from stark_tpu.models.fibonacci import FibonacciAir

    def rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024

    bp, trace = _setup(B)
    T = 1 << 14
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    v = StarkVerifier(FibonacciAir(), cfg)
    ref = None
    for wave in range(waves):
        t0 = time.perf_counter()
        proofs = bp.prove_many([trace] * (10 * B), depth=2)
        dt = time.perf_counter() - t0
        assert len(proofs) == 10 * B
        if ref is None:
            ref = proofs[0]
            assert v.verify(ref)
        assert all(p == ref for p in proofs), "byte drift under soak"
        print(
            f"wave {wave}: {10 * B / dt:.1f} proofs/s, RSS {rss_mb()} MB",
            flush=True,
        )
    print(f"soak OK: {waves * 10 * B} proofs, byte-stable")


def flagship(nb: int = 2, B: int = 8) -> None:
    """Wide-AIR serving: the 8-register MDS flagship through prove_many
    with DEVICE-RESIDENT witnesses (traces_cols — no host witness bytes).
    Measured round 5: ~101 proofs/s (B=8, T=2^14, depth 2) on one chip.
    NOTE: the c=8 batch graph costs ~85 s of one-time tracing."""
    from stark_tpu import StarkConfig, StarkVerifier
    from stark_tpu.batch import BatchStarkProver
    from stark_tpu.models.examples import (
        MdsSquareAir,
        mds_square_trace_cols_device,
    )
    from stark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    T = 1 << 14
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=16)
    air = MdsSquareAir()
    cols = mds_square_trace_cols_device(T)
    bp = BatchStarkProver(air, cfg, B)
    proofs = bp.prove_many(traces_cols=[cols] * (nb * B), depth=2)  # warm
    assert StarkVerifier(air, cfg).verify(proofs[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        bp.prove_many(traces_cols=[cols] * (nb * B), depth=2)
        best = min(best, time.perf_counter() - t0)
    print(
        f"flagship (c=8, T=2^14) B={B} x {nb}: {nb * B / best:.1f} proofs/s",
        flush=True,
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--soak":
        soak(int(args[1]) if len(args) > 1 else 5)
    elif args and args[0] == "--flagship":
        flagship(int(args[1]) if len(args) > 1 else 2)
    else:
        sweep([int(a) for a in args] or [8, 16, 32])
