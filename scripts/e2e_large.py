"""Measure the large end-to-end STARK configs on the real TPU.

BASELINE.md configs 3/4 at scale: prove + verify wall time, steady state,
with the per-phase breakdown from PhaseTimer.  Run when the axon relay is
up:

    python scripts/e2e_large.py [t_log2=20] [model=fib]

``model`` is any CLI registry name (fib/fib2/square/cube/mds); fib and
mds generate their witness ON DEVICE (block-seed decompositions — see
models/fibonacci.py and models/examples.py), the others upload host rows.
The MDS flagship line in BASELINE.md is ``e2e_large.py 16 mds``.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    model = sys.argv[2] if len(sys.argv) > 2 else "fib"
    T = 1 << lg

    import jax

    from stark_tpu import StarkConfig, StarkProver, StarkVerifier
    from stark_tpu.models import get_model
    from stark_tpu.utils.cache import enable_compilation_cache
    from stark_tpu.utils.profiling import PhaseTimer

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices()[0])

    air, trace_fn, min_blowup = get_model(model)
    cfg = StarkConfig(
        trace_length=T,
        blowup=max(4, min_blowup),
        num_colinearity_tests=16,
    )
    prover = StarkProver(air, cfg)

    # Witness generated ON DEVICE where a block decomposition exists (a
    # 2^20-row trace is a 4 MB upload at the relay's ~30 MB/s otherwise);
    # equality with the host generators is pinned by tests/test_models.py.
    if model == "fib":
        from stark_tpu.models.fibonacci import fibonacci_trace_cols_device

        kw = {"trace_cols": fibonacci_trace_cols_device(T).block_until_ready()}
    elif model == "mds":
        from stark_tpu.models.examples import mds_square_trace_cols_device

        kw = {"trace_cols": mds_square_trace_cols_device(T).block_until_ready()}
    else:
        kw = {"trace_rows": trace_fn(T)}

    t0 = time.perf_counter()
    proof = prover.prove(**kw)  # compile + warm
    print(f"cold prove: {time.perf_counter() - t0:.2f} s")

    best = float("inf")
    for _ in range(3):
        timer = PhaseTimer()
        t0 = time.perf_counter()
        proof = prover.prove(timer=timer, **kw)
        dt = time.perf_counter() - t0
        if dt < best:
            best, best_phases = dt, timer.ms()
    lg_n = lg + (cfg.blowup.bit_length() - 1)
    print(f"prove[{model}] T=2^{lg} (N=2^{lg_n}): {best:.3f} s steady")
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
