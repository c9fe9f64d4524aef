"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): NTT points/s/chip at 2^22 — the core primitive the
reference lacks entirely (its polynomial multiply is O(n^2) schoolbook,
reference src/univariate/mul.rs:6-29, and interpolation O(n^3),
interpolate.rs:6-44; no benchmark numbers are published anywhere in the
reference, see BASELINE.md).

``vs_baseline`` is the speedup over a single-thread host-CPU numpy
radix-2 NTT of the same size — the strongest CPU implementation of the
reference's *contract* measurable here (the reference's own O(n^2)/O(n^3)
algorithms are computationally infeasible at 2^22, which is the point).
The denominator is PINNED (``HOST_NTT_BASELINE_MS``) so the multiplier is
comparable across rounds; the live host measurement rides in extras.

Timing methodology: the TPU in this environment sits behind a relay whose
``block_until_ready`` can return before execution completes, and a host
round-trip costs ~30 ms.  Device kernels are therefore timed by *chaining*
k data-dependent applications and fetching one element (forcing real
execution), reporting the marginal per-application time
(T(k2) - T(k1)) / (k2 - k1) — dispatch/fetch overhead cancels.

Usage: python bench.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_NTT = 1 << 22
PRIME = 998244353

# Pinned vs_baseline denominator: single-thread host-numpy radix-2 NTT at
# 2^22, measured 2026-08-19 on this box (BASELINE.md round-2 final table).
# The live host measurement swings ~40% run-to-run with box load (1486.6 ms
# round 1 vs 2048.2 ms round 2), which made the headline multiplier
# incomparable across rounds; the pinned value keeps vs_baseline stable
# while the live number is still reported in extras as informational.
HOST_NTT_BASELINE_MS = 2048.2


def _chain_time(step, x0, k1=2, k2=12, reps=3, floor_s=2e-5):
    """Marginal seconds per application of ``step`` (array -> same-shape
    array), forcing execution with a 1-element fetch.

    ``floor_s``: physically impossible readings below this (differencing
    swamped by host-load noise) are retried up to twice; the last attempt
    is returned regardless so a pathological box still produces a number
    (flagged by being below the floor)."""

    def run(k):
        y = x0
        for _ in range(k):
            y = step(y)
        np.asarray(y.ravel()[0])  # forces the whole chain

    def best_of(k):
        t = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(k)
            t = min(t, time.perf_counter() - t0)
        return t

    run(2)  # compile + warm
    for _ in range(3):
        dt = max(best_of(k2) - best_of(k1), 1e-9) / (k2 - k1)
        if dt >= floor_s:
            break
    return dt


def _host_numpy_ntt(x: np.ndarray) -> float:
    """Timed host-CPU radix-2 NTT (the in-tree numpy engine — numerically
    correct and cross-checked against the device NTT in tests)."""
    from stark_tpu.ops.ntt import _host_ntt_core, get_plan

    plan = get_plan(x.shape[0])  # build twiddles outside the timed region
    t0 = time.perf_counter()
    _host_ntt_core(x, plan)
    return time.perf_counter() - t0


def _backend_reachable(timeout_s: int = 120) -> bool:
    """Probe the default JAX backend in a SUBPROCESS: when the axon relay
    is down, jax.devices() hangs indefinitely inside make_c_api_client at
    0% CPU — a hung bench run is worse than a CPU-backend bench line."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    quick = "--quick" in sys.argv
    import jax

    if not _backend_reachable():
        print(
            "bench: default backend unreachable; falling back to CPU",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stark_tpu.ops import ntt as NTT
    from stark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(
        allow_cpu=jax.config.jax_platforms == "cpu"
    )

    rng = np.random.default_rng(42)
    x = rng.integers(0, PRIME, size=N_NTT, dtype=np.uint32)
    xd = jnp.asarray(x)

    t_ntt = _chain_time(NTT.ntt, xd, k2=6 if quick else 12, floor_s=1e-4)
    extras = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "ntt_ms": round(t_ntt * 1e3, 3),
    }

    # A/B the Harvey lazy butterflies against the strict fused kernel when
    # the fused engine handles this transform (TPU, 1-D, >= 2^16).  Both
    # are bit-identical (pinned by tests/test_ntt_fused.py and re-checked
    # on-device here); the headline reports the better configuration and
    # extras record both timings.
    from stark_tpu.ops.ntt_fused import fused_available, fused_ntt

    # 16 MB HBM-roofline floor for a 2^22 NTT: readings below it are
    # host-load noise and must not be scored.
    _NTT_FLOOR_S = 1e-4

    if fused_available(N_NTT, xd.shape):
        lazy_step = lambda v: fused_ntt(v, lazy=True)  # noqa: E731
        same = bool(
            jnp.array_equal(NTT.ntt(xd), lazy_step(xd)).block_until_ready()
        )
        if same:
            t_lazy = _chain_time(
                lazy_step, xd, k2=6 if quick else 12, floor_s=_NTT_FLOOR_S
            )
            extras["ntt_lazy_ms"] = round(t_lazy * 1e3, 3)
            if _NTT_FLOOR_S <= t_lazy < t_ntt:
                t_ntt = t_lazy
                extras["ntt_best"] = "lazy"
        else:  # pragma: no cover - would be a kernel bug
            extras["ntt_lazy_ms"] = "MISMATCH vs strict — not scored"
    points_per_s = N_NTT / t_ntt

    t_host = _host_numpy_ntt(x)
    extras["host_numpy_ntt_ms"] = round(t_host * 1e3, 1)  # informational
    # vs_baseline uses the PINNED host reference (see HOST_NTT_BASELINE_MS)
    # so the multiplier is comparable across rounds; ntt_ms is the primary
    # device-side number.
    host_pps = N_NTT / (HOST_NTT_BASELINE_MS / 1e3)

    if not quick:
        # FRI fold at 2^22 (per-round hot op besides hashing); the double-up
        # keeps the chain shape-stable (~0.05 ms concat overhead included).
        from stark_tpu.fri import Fri
        from stark_tpu.ops.fieldops import primitive_nth_root

        fri = Fri(
            omega=primitive_nth_root(N_NTT),
            offset=3,
            domain_length=N_NTT,
            expansion_factor=4,
            num_colinearity_tests=16,
        )
        step = jax.jit(
            lambda c: jnp.concatenate(
                [f := fri.fold_codeword(c, 123456789, 0), f]
            )
        )
        extras["fold_2e22_ms"] = round(_chain_time(step, xd) * 1e3, 3)

        # Batched leaf hashing at 2^20 lanes (Merkle commit inner loop) on
        # the PRODUCTION wide-level engine: the tile-native row-tuple
        # layout with unrolled mixes (hash_batch.leaf_hash_rows — what
        # every tree level >= FUSE_MAX_WIDTH actually runs).  Round 2
        # mistakenly benched the stacked compat entry point, whose rolled
        # fori_loop mixes are tuned for small widths and run ~2.2x slower
        # at 2^20 lanes (BASELINE.md round-3 note).  The chain feeds digest
        # row 0 back in as values to stay shape-stable.
        from stark_tpu.ops import hash_batch as HB

        xh2d = xd[: 1 << 20].reshape((1 << 20) // HB.LANE, HB.LANE)
        hstep = jax.jit(
            lambda v: HB.leaf_hash_rows_core(v)[0].astype(jnp.uint32)
            + jnp.uint32(1)
        )
        t_hash = _chain_time(hstep, xh2d)
        extras["leaf_hash_Mlanes_per_s"] = round((1 << 20) / t_hash / 1e6, 2)

        # Wide-trace row hashing at c=8 registers (the multi-chunk absorb
        # path, hash.rs:7-35: 8 u64s = 64 bytes = 2 absorb chunks/leaf) at
        # 2^18 lanes — the trace-commitment inner loop of the MDS flagship
        # workload (models/examples.MdsSquareAir).
        n_rh = 1 << 18
        cols3d = jnp.tile(
            xd[:n_rh].reshape(1, n_rh // HB.LANE, HB.LANE), (8, 1, 1)
        )
        rstep = jax.jit(
            lambda v: jnp.tile(
                (HB.row_hash_rows_core(v)[0].astype(jnp.uint32)
                 + jnp.uint32(1))[None],
                (8, 1, 1),
            )
        )
        t_rh = _chain_time(rstep, cols3d)
        extras["row_hash_c8_Mlanes_per_s"] = round(n_rh / t_rh / 1e6, 2)

        # End-to-end STARK proof (Fibonacci AIR) wall time, steady state.
        from stark_tpu import StarkConfig, StarkProver, StarkVerifier
        from stark_tpu.models.fibonacci import (
            FibonacciAir,
            fibonacci_trace_mod_p,
        )

        from stark_tpu.utils.profiling import PhaseTimer

        T = 1 << 14
        cfg = StarkConfig(
            trace_length=T, blowup=4, num_colinearity_tests=16
        )
        air = FibonacciAir()
        trace = fibonacci_trace_mod_p(T)
        prover = StarkProver(air, cfg)
        proof = prover.prove(trace)  # compile + warm
        # Best-of-3: single timed runs through the relay draw occasional
        # multi-hundred-ms scheduling stalls (measured 0.07 -> 1.5 s
        # outliers on an otherwise idle box).
        t_prove = float("inf")
        for _ in range(3):
            timer = PhaseTimer()
            t0 = time.perf_counter()
            proof = prover.prove(trace, timer=timer)
            dt = time.perf_counter() - t0
            if dt < t_prove:
                t_prove = dt
                extras["prove_phases_ms"] = timer.ms()
        verifier = StarkVerifier(air, cfg)
        assert verifier.verify(proof)
        t_verify = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            verifier.verify(proof)
            t_verify = min(t_verify, time.perf_counter() - t0)
        extras["prove_T2e14_s"] = round(t_prove, 3)
        extras["verify_T2e14_s"] = round(t_verify, 3)
        extras["proof_bytes_T2e14"] = len(proof)

        # Batched throughput (the serving mode) — only when the persistent
        # compile cache is warm, so a cold driver run stays bounded.
        import glob
        import os

        # The cache dir is keyed by host CPU features (utils/cache.py).
        warm = any(
            os.listdir(d)
            for d in glob.glob(
                os.path.join(os.path.dirname(__file__), ".jax_cache*")
            )
            if os.path.isdir(d)
        )
        if warm:
            from stark_tpu.batch import BatchStarkProver

            B = 8
            bp = BatchStarkProver(air, cfg, B)
            bp.prove_batch([trace] * B)  # compile + warm
            t_batch = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                bp.prove_batch([trace] * B)
                t_batch = min(t_batch, time.perf_counter() - t0)
            extras["batch8_proofs_per_s"] = round(B / t_batch, 2)

            # Pipelined serving (prove_many, depth 2): device executes
            # batch k+1 while the host fetches/emits batch k.
            NB = 4
            t_pm = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                bp.prove_many([trace] * (NB * B), depth=2)
                t_pm = min(t_pm, time.perf_counter() - t0)
            extras["pipeline_proofs_per_s"] = round(NB * B / t_pm, 2)

        # Amortized batch verification (serving symmetry: one native
        # path-authentication call across the batch).
        vproofs = [proof] * 8
        verifier.verify_batch(vproofs)  # warm
        t_vb = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ok = verifier.verify_batch(vproofs)
            t_vb = min(t_vb, time.perf_counter() - t0)
        assert all(ok)
        extras["verify_batch8_proofs_per_s"] = round(8 / t_vb, 2)

    result = {
        "metric": "NTT points/s/chip at 2^22",
        "value": round(points_per_s, 0),
        "unit": "points/s",
        "vs_baseline": round(points_per_s / host_pps, 2),
        "extras": extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
