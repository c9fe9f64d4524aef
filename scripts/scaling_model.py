"""Communication-volume accounting for the sharded four-step NTT.

Compiles parallel/pntt.sharded_ntt at D = 2/4/8 (virtual CPU mesh; GSPMD
partitioning is platform-independent) and counts the collective bytes the
compiled HLO actually moves per device, alongside the analytic model —
the evidence base for BASELINE.md's config-5 scaling section.

Usage: python scripts/scaling_model.py [n_log2=22]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8 --xla_cpu_max_isa=AVX2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


_SHAPE_RE = re.compile(r"(u8|u16|u32|u64|s8|s16|s32|s64|f32|bf16)\[([\d,]*)\]")
_BYTES = {"u8": 1, "s8": 1, "u16": 2, "s16": 2, "bf16": 2, "u32": 4,
          "s32": 4, "f32": 4, "u64": 8, "s64": 8}


def _shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def collective_bytes(hlo: str) -> dict[str, int]:
    """Per-device output bytes of each collective op kind in an SPMD HLO
    module (post-partitioning shapes are already per-device)."""
    out: dict[str, int] = {}
    for line in hlo.splitlines():
        m = re.search(r"= *(.*?) (all-to-all|all-gather"
                      r"|all-reduce|collective-permute|reduce-scatter)\(",
                      line)
        if m:
            kind = m.group(2)
            out[kind] = out.get(kind, 0) + _shape_bytes(m.group(1))
    return out


def main() -> None:
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 22)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stark_tpu.parallel.mesh import AXIS, make_mesh
    from stark_tpu.parallel import pntt

    print(f"# sharded four-step NTT, n = 2^{n.bit_length() - 1}")
    print("# analytic per device: 3 all_to_alls x 4*(n/D)*(D-1)/D bytes "
          "(each device keeps 1/D of every transpose)")
    for D in (2, 4, 8):
        mesh = make_mesh(D)
        sh = NamedSharding(mesh, P(AXIS))
        x = jax.device_put(
            jnp.zeros((n,), jnp.uint32), sh
        )
        fn = pntt._sharded_ntt_fn(mesh, n, False, 0, pntt.OVERLAP_CHUNKS)
        # Reach the underlying jit to lower/compile without executing.
        R, C, tw, tws = pntt._fourstep_consts(n, False)
        K = max(1, min(pntt.OVERLAP_CHUNKS, min(R, C) // D))
        tw_sh = NamedSharding(mesh, P(AXIS, None))
        jfn = jax.jit(
            jax.shard_map(
                lambda a, b, c: pntt._local_fourstep_overlap(
                    a, b, c, R=R, C=C, D=D, inverse=False, K=K
                ),
                mesh=mesh,
                in_specs=(P(AXIS), P(AXIS, None), P(AXIS, None)),
                out_specs=P(AXIS),
            )
        )
        twd = jax.device_put(jnp.asarray(tw), tw_sh)
        twsd = jax.device_put(jnp.asarray(tws), tw_sh)
        hlo = jfn.lower(x, twd, twsd).compile().as_text()
        got = collective_bytes(hlo)
        n_a2a = len(re.findall(r" all-to-all\(", hlo))
        analytic = 3 * 4 * (n // D) * (D - 1) // D
        print(
            f"D={D}: K={K} overlap chunks, {n_a2a} all_to_alls; "
            "HLO collective OUTPUT bytes/device: "
            + (", ".join(f"{k}={v/1e6:.3f} MB" for k, v in sorted(got.items()))
               or "none")
            + f"; ICI wire bytes/device = {analytic/1e6:.3f} MB"
        )
        # Sanity: execute once so the numbers describe a real program.
        y = fn(x)
        assert y.shape == (n,)

    # -- ICI efficiency model (BASELINE.md config 5) -----------------------
    # T1: measured single-chip lazy fused NTT at 2^22 on v5e (BENCH_r03).
    T1 = 0.556e-3 * (n / (1 << 22)) * ((n.bit_length() - 1) / 22.0)
    HBM = 819e9          # v5e HBM bytes/s (public spec)
    print("\n# strong-scaling efficiency model, v5e ICI "
          "(45 GB/s one-way per link, public spec)")
    print("# E = T1 / (D * T_D);  T_D = compute + comm (no overlap) or "
          "max(compute, comm) (full overlap); twiddle pass ~= 3 HBM passes")
    print("# 'overlapped' corresponds to pntt._local_fourstep_overlap "
          "(K independent exchange->butterfly chains per phase; "
          f"default K={__import__('stark_tpu.parallel.pntt', fromlist=['x']).OVERLAP_CHUNKS}), "
          "scheduled by XLA's async collectives on real ICI")
    for D in (2, 4, 8):
        compute = T1 / D + 3 * 4 * (n / D) / HBM
        wire = 3 * 4 * (n / D) * (D - 1) / D
        for links, label in ((2, "1-D ring, 2 links"), (4, "2-D torus, 4 links")):
            bw = links * 45e9
            comm = wire / bw
            e_no = T1 / (D * (compute + comm))
            e_ov = T1 / (D * max(compute, comm))
            print(
                f"D={D} {label}: comm {comm*1e6:7.1f} us, compute "
                f"{compute*1e6:6.1f} us -> E = {e_no*100:5.1f}% "
                f"(no overlap) / {e_ov*100:5.1f}% (overlapped)"
            )


if __name__ == "__main__":
    main()
