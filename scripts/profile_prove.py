"""Capture a jax.profiler device trace of one warm prove and summarize it.

Closes SURVEY §5's tracing gap beyond host wall-clock phases
(utils/profiling.PhaseTimer): the xplane/Chrome-trace capture attributes
time to individual DEVICE ops (the fused mega-prove jit, the tail
fori_loops, gathers, transfers), which host timers cannot see through the
relay's async dispatch.

    python scripts/profile_prove.py [t_log2=14] [outdir=/tmp/stark_trace]

Prints the top device ops by total duration and leaves the full trace
(xplane.pb + trace.json.gz, TensorBoard-loadable) in ``outdir``.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, ".")


def summarize(outdir: str, top: int = 20) -> None:
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    device_pids = {
        e.get("pid")
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    tot: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            tot[e.get("name")] += e.get("dur", 0)
            cnt[e.get("name")] += 1
    print(f"device busy total: {sum(tot.values()) / 1e3:.2f} ms")
    for name, d in tot.most_common(top):
        print(f"{d / 1e3:9.3f} ms  x{cnt[name]:<4} {name[:90]}")


def main() -> None:
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stark_trace"
    model = sys.argv[3] if len(sys.argv) > 3 else "fib"
    T = 1 << lg

    import jax

    from stark_tpu import StarkConfig, StarkProver
    from stark_tpu.models import get_model
    from stark_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices()[0])
    air, trace_fn, min_blowup = get_model(model)
    cfg = StarkConfig(
        trace_length=T,
        blowup=max(4, min_blowup),
        num_colinearity_tests=16,
    )
    prover = StarkProver(air, cfg)
    # Same device-witness routing as scripts/e2e_large.py.
    if model == "fib":
        from stark_tpu.models.fibonacci import fibonacci_trace_cols_device

        kw = {"trace_cols": fibonacci_trace_cols_device(T).block_until_ready()}
    elif model == "mds":
        from stark_tpu.models.examples import mds_square_trace_cols_device

        kw = {"trace_cols": mds_square_trace_cols_device(T).block_until_ready()}
    else:
        kw = {"trace_rows": trace_fn(T)}
    prover.prove(**kw)  # compile + warm

    with jax.profiler.trace(outdir):
        prover.prove(**kw)
    print("trace written to", outdir)
    summarize(outdir)


if __name__ == "__main__":
    main()
