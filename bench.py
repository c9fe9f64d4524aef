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



def _mark(msg: str) -> None:
    """Progress timestamps on stderr (driver captures stdout only) —
    attributes fixed warm-up/tracing costs when a run blows its budget."""
    _mark.t0 = getattr(_mark, "t0", time.perf_counter())
    print(f"[bench t+{time.perf_counter() - _mark.t0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)

def _robust_best(runs, max_extra=5, outlier=2.5, deadline=None):
    """Relay-robust best-of wall timing over a SET of workloads,
    interleaved.

    ``runs``: dict name -> (thunk, floor_s, min_reps).  Each round times
    every still-active workload once (interleaving spreads relay
    congestion windows across metrics instead of sinking one).  A
    workload stays active until it has min_reps samples AND its best is
    within ``outlier``x its physical floor (device exec + transfer + RTT,
    measured via scripts/profile_prove.py and documented at the call
    site) — or until min_reps + max_extra samples, whichever first.
    Returns dict name -> (best_s, n_reps); n_reps > min_reps flags that
    relay stalls were being ridden out (recorded in extras so a depressed
    number is self-explaining).

    ``deadline`` (perf_counter value): once past it, workloads stop after
    min_reps even if still above their outlier threshold — under heavy
    relay congestion the stall-riding reps compound exactly when the run
    is already slow, and a bounded bench beats a perfect one.
    """
    best = {k: float("inf") for k in runs}
    n = {k: 0 for k in runs}
    active = set(runs)
    while active:
        for k in list(active):
            thunk, floor_s, min_reps = runs[k]
            t0 = time.perf_counter()
            thunk()
            best[k] = min(best[k], time.perf_counter() - t0)
            n[k] += 1
            over = deadline is not None and time.perf_counter() > deadline
            if n[k] >= min_reps and (
                over
                or best[k] <= outlier * floor_s
                or n[k] >= min_reps + max_extra
            ):
                active.discard(k)
    return {k: (best[k], n[k]) for k in runs}


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
    # Soft wall budget for stall-riding extra reps (see _robust_best):
    # warm-cache runs finish in ~6-8 min; past this point every workload
    # settles for its min_reps best.
    deadline = time.perf_counter() + 480
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

    # Relay-stall guard for the HEADLINE metric: chained marginal NTT time
    # beyond _NTT_STALL_S at 2^22 is a congested relay window (measured
    # best 0.42-0.48 ms, typical <= 0.65 across rounds), not the kernel —
    # re-measure up to twice and keep the best.
    # Per-engine thresholds: the strict Stockham chain legitimately runs
    # ~1.0-1.1 ms (not the scored config when lazy wins), the lazy fused
    # kernel 0.42-0.65 ms — a shared 0.7 ms threshold made the strict
    # chain ALWAYS re-measure 3x (~50 s of warm-up for nothing).
    _NTT_STALL_S = 0.7e-3
    _NTT_STALL_STRICT_S = 1.3e-3
    _mark("ntt chain (strict)")
    t_ntt = float("inf")
    ntt_tries = 0
    while ntt_tries < 3 and t_ntt > _NTT_STALL_STRICT_S:
        t_ntt = min(
            t_ntt,
            _chain_time(NTT.ntt, xd, k2=6 if quick else 12, floor_s=1e-4),
        )
        ntt_tries += 1
    extras = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "ntt_ms": round(t_ntt * 1e3, 3),
        "ntt_tries": ntt_tries,
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
            _mark("ntt chain (lazy)")
            t_lazy = float("inf")
            tries = 0
            while tries < 3 and t_lazy > _NTT_STALL_S:
                t_lazy = min(
                    t_lazy,
                    _chain_time(
                        lazy_step,
                        xd,
                        k2=6 if quick else 12,
                        floor_s=_NTT_FLOOR_S,
                    ),
                )
                tries += 1
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
        _mark("fold/hash primitives")
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
        _mark("T=2^14 prove warm-up")
        prover = StarkProver(air, cfg)
        proof = prover.prove(trace)  # compile + warm
        verifier = StarkVerifier(air, cfg)
        assert verifier.verify(proof)

        # Relay-robust interleaved best-of (see _robust_best): floors are
        # the device-exec + transfer + relay-RTT attributions from
        # scripts/profile_prove.py (NOTES round-4/5: T=2^14 prove = 17 ms
        # exec + 7 transfer + 30 RTT).  Samples beyond min_reps mean the
        # harness was riding out relay stalls — reported in extras.
        phase_box = {}

        def prove_once():
            timer = PhaseTimer()
            t0 = time.perf_counter()
            prover.prove(trace, timer=timer)
            dt = time.perf_counter() - t0
            if dt < phase_box.get("best", float("inf")):
                phase_box["best"] = dt
                phase_box["phases"] = timer.ms()

        res = _robust_best(
            deadline=deadline,
            runs={
                "prove": (prove_once, 0.050, 3),
                "verify": (lambda: verifier.verify(proof), 0.004, 3),
            }
        )
        extras["prove_phases_ms"] = phase_box["phases"]
        extras["prove_T2e14_s"] = round(res["prove"][0], 3)
        extras["verify_T2e14_s"] = round(res["verify"][0], 3)
        extras["proof_bytes_T2e14"] = len(proof)
        reps_used = {
            "prove_T2e14": res["prove"][1],
            "verify_T2e14": res["verify"][1],
        }

        def _emit_progressive():
            # Progressive emits: minutes of uncacheable warm-up tracing
            # separate the measurement blocks; each emit leaves a complete
            # JSON line in the tail in case an external timeout kills the
            # run mid-block (consumers parse the LAST line printed).
            print(
                json.dumps(
                    {
                        "metric": "NTT points/s/chip at 2^22",
                        "value": round(points_per_s, 0),
                        "unit": "points/s",
                        "vs_baseline": round(points_per_s / host_pps, 2),
                        "extras": {
                            **extras,
                            "timing_reps": dict(reps_used),
                            "preliminary": True,
                        },
                    }
                ),
                flush=True,
            )

        _emit_progressive()

        # Batched throughput (the serving mode) — only when the persistent
        # compile cache is warm, so a cold driver run stays bounded.
        import glob
        import os

        # The cache dir is keyed by host CPU features (utils/cache.py).
        # The batch/large blocks additionally require the REAL backend:
        # on the CPU fallback (relay down) a T=2^20 capstone or a B=32
        # batch costs tens of minutes — worse than missing extras.
        warm = any(
            os.listdir(d)
            for d in glob.glob(
                os.path.join(os.path.dirname(__file__), ".jax_cache*")
            )
            if os.path.isdir(d)
        ) and jax.default_backend() == "tpu"
        if warm:
            from stark_tpu.batch import BatchStarkProver

            B = 8
            _mark("batch B=8 warm-up")
            bp = BatchStarkProver(air, cfg, B)
            bp.prove_batch([trace] * B)  # compile + warm
            # Pipelined serving (prove_many, depth 2): device executes
            # batch k+1 while the host fetches/emits batch k.  B=32 is
            # the round-4 serving headline configuration.
            B32 = 32
            _mark("batch B=32 warm-up")
            bp32 = BatchStarkProver(air, cfg, B32)
            bp32.prove_batch([trace] * B32)  # compile + warm
            _mark("batch timing")
            res_b = _robust_best(
                deadline=deadline,
                runs={
                    # Floors from the round-5 jax.profiler attribution
                    # (NOTES): batch8 = 36 ms exec + ~60 ms transfer
                    # (1.8 MB at the relay's ~30 MB/s) + ~30 ms RTT;
                    # pipelined runs overlap exec under fetch+emit, so
                    # the floor is ~transfer + emit per batch.
                    "batch8": (
                        lambda: bp.prove_batch([trace] * B),
                        0.12,
                        3,
                    ),
                    "pipe8x4": (
                        lambda: bp.prove_many([trace] * (4 * B), depth=2),
                        0.40,
                        2,
                    ),
                    "pipe32x2": (
                        lambda: bp32.prove_many(
                            [trace] * (2 * B32), depth=2
                        ),
                        0.55,
                        2,
                    ),
                }
            )
            extras["batch8_proofs_per_s"] = round(B / res_b["batch8"][0], 2)
            extras["pipeline_proofs_per_s"] = round(
                4 * B / res_b["pipe8x4"][0], 2
            )
            extras["pipeline_b32_proofs_per_s"] = round(
                2 * B32 / res_b["pipe32x2"][0], 2
            )
            reps_used.update(
                {k: v[1] for k, v in res_b.items()}
            )

        # Amortized batch verification (serving symmetry: one native
        # path-authentication call across the batch).
        vproofs = [proof] * 8
        ok = verifier.verify_batch(vproofs)  # warm
        assert all(ok)
        res_vb = _robust_best(
            deadline=deadline,
            runs={"verify_batch8": (lambda: verifier.verify_batch(vproofs), 0.02, 3)}
        )
        extras["verify_batch8_proofs_per_s"] = round(
            8 / res_vb["verify_batch8"][0], 2
        )

        _mark("progressive emit (pre large workloads)")
        _emit_progressive()

        # ---- Headline large-scale workloads (BASELINE configs 4/5 and
        # the MDS flagship) — warm-cache-guarded like the batch block so
        # a cold driver run stays bounded.  Floors: NOTES round-5
        # attributions (capstone exec 60.6 ms + ~14 transfer + ~30 RTT;
        # max-size scales ~2x; MDS witness ~6 ms C walk + prove).
        if warm:
            from stark_tpu.models.fibonacci import (
                fibonacci_trace_cols_device,
            )
            from stark_tpu.models.examples import (
                MdsSquareAir,
                mds_square_trace_cols_device,
            )

            # Config 4 capstone: T=2^20, N=2^22.
            T20 = 1 << 20
            cfg20 = StarkConfig(
                trace_length=T20, blowup=4, num_colinearity_tests=16
            )
            _mark("capstone warm-up")
            pr20 = StarkProver(air, cfg20)
            p20 = pr20.prove(trace_cols=fibonacci_trace_cols_device(T20))
            v20 = StarkVerifier(air, cfg20)
            assert v20.verify(p20)
            cap_box = {}

            def cap_once():
                timer = PhaseTimer()
                t0 = time.perf_counter()
                pr20.prove(
                    trace_cols=fibonacci_trace_cols_device(T20), timer=timer
                )
                dt = time.perf_counter() - t0
                if dt < cap_box.get("best", float("inf")):
                    cap_box["best"] = dt
                    cap_box["phases"] = timer.ms()

            # Max size: T=2^21, N=2^23 — the field's 2-adicity cap
            # (BASELINE.md: p = 119*2^23+1; a bigger domain cannot exist).
            T21 = 1 << 21
            cfg21 = StarkConfig(
                trace_length=T21, blowup=4, num_colinearity_tests=16
            )
            _mark("max-size warm-up")
            pr21 = StarkProver(air, cfg21)
            p21 = pr21.prove(trace_cols=fibonacci_trace_cols_device(T21))

            # MDS flagship e2e: witness generation + prove (T=2^16, c=8).
            T16 = 1 << 16
            cfg16 = StarkConfig(
                trace_length=T16, blowup=4, num_colinearity_tests=16
            )
            _mark("mds warm-up")
            mair = MdsSquareAir()
            prm = StarkProver(mair, cfg16)
            pm = prm.prove(trace_cols=mds_square_trace_cols_device(T16))
            assert StarkVerifier(mair, cfg16).verify(pm)

            # Flagship pipelined serving: 8-register AIR through
            # prove_many with device-resident witnesses (traces_cols).
            # OPT-IN (STARK_TPU_BENCH_FLAGSHIP=1): the c=8 batch mega
            # graph costs ~85 s of python TRACING per process (measured;
            # tracing is not covered by the persistent compile cache), too
            # much risk for an unattended scored run.  Measured when on:
            # ~101 proofs/s (B=8, T=2^14, depth 2) — see NOTES round 5.
            import os as _os

            flagship = _os.environ.get("STARK_TPU_BENCH_FLAGSHIP") == "1"
            if flagship:
                from stark_tpu.batch import BatchStarkProver

                mcols14 = mds_square_trace_cols_device(T)
                bpm = BatchStarkProver(mair, cfg, 8)
                bpm.prove_many(traces_cols=[mcols14] * 16, depth=2)  # warm

            _mark("large-workload timing")
            res_l = _robust_best(
                deadline=deadline,
                runs={
                    "cap_prove": (cap_once, 0.100, 3),
                    "cap_verify": (lambda: v20.verify(p20), 0.030, 3),
                    "max_prove": (
                        lambda: pr21.prove(
                            trace_cols=fibonacci_trace_cols_device(T21)
                        ),
                        0.170,
                        2,
                    ),
                    "mds_e2e": (
                        lambda: prm.prove(
                            trace_cols=mds_square_trace_cols_device(T16)
                        ),
                        0.055,
                        3,
                    ),
                    **(
                        {
                            "mds_pipe8x2": (
                                lambda: bpm.prove_many(
                                    traces_cols=[mcols14] * 16, depth=2
                                ),
                                0.14,
                                2,
                            )
                        }
                        if flagship
                        else {}
                    ),
                }
            )
            extras["capstone_prove_T2e20_s"] = round(res_l["cap_prove"][0], 3)
            extras["capstone_verify_T2e20_s"] = round(
                res_l["cap_verify"][0], 3
            )
            extras["capstone_phases_ms"] = cap_box["phases"]
            extras["capstone_proof_bytes"] = len(p20)
            extras["max_prove_T2e21_s"] = round(res_l["max_prove"][0], 3)
            extras["max_proof_bytes"] = len(p21)
            extras["mds_e2e_T2e16_s"] = round(res_l["mds_e2e"][0], 3)
            extras["mds_proof_bytes"] = len(pm)
            if flagship:
                extras["mds_pipeline_proofs_per_s"] = round(
                    16 / res_l["mds_pipe8x2"][0], 2
                )
            reps_used.update({k: v[1] for k, v in res_l.items()})

        extras["timing_reps"] = reps_used

    _mark("done")
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
