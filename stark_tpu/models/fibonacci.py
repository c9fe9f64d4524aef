"""Fibonacci AIR — the flagship workload (reference trace.rs:36-49 is the
generator; the constraint system is new, since the reference has none).

Single register t; transition t(w^2 x) = t(w x) + t(x) on rows 0..T-3;
boundary t(row 0) = 1, t(row 1) = 1.
"""

from __future__ import annotations

from stark_tpu.models.air import Air, BoundaryConstraint
from stark_tpu.ops.fieldops import P


class FibonacciAir(Air):
    num_registers = 1
    frame_offsets = (0, 1, 2)
    constraint_degree = 1

    def transition_constraints(self, frame, ops):
        t0 = frame[0][0]
        t1 = frame[1][0]
        t2 = frame[2][0]
        return [ops.sub(t2, ops.add(t1, t0))]

    def boundary_constraints(self, trace_length: int):
        return [
            BoundaryConstraint(row=0, register=0, value=1),
            BoundaryConstraint(row=1, register=0, value=1),
        ]


def fibonacci_trace_mod_p(length: int) -> "np.ndarray":
    """The Fibonacci sequence in F_p — the honest witness for FibonacciAir,
    as a (length, 1) uint32 ndarray.

    (Trace.fibonacci keeps the reference's exact-integer semantics; proving
    needs the field-reduced sequence so the transition holds mod p.  The
    ndarray return feeds StarkProver.prove's zero-conversion ingestion
    path — a 2^20-row python list costs ~0.15 s just to convert.)
    """
    import numpy as np

    def gen():
        a, b = 1, 1
        for _ in range(length):
            yield a
            a, b = b, (a + b) % P

    return np.fromiter(gen(), dtype=np.uint32, count=length).reshape(
        length, 1
    )


import functools


@functools.lru_cache(maxsize=None)
def _fib_block_fn(length: int):
    import jax
    import jax.numpy as jnp

    from stark_tpu.ops import fieldops as F

    def fn(s0, s1, u0, u1):
        # a[k*B + j] = F_{kB+1}*F_{j+1} + F_{kB}*F_j  (rank-2 expansion)
        out = F.addmod(
            F.mulmod(s1[:, None], u1[None, :]),
            F.mulmod(s0[:, None], u0[None, :]),
        )
        return out.reshape(1, -1)[:, :length]

    return jax.jit(fn)


def fibonacci_trace_cols_device(length: int):
    """(1, length) uint32 DEVICE trace columns, elementwise equal to
    ``fibonacci_trace_mod_p(length).T`` — without uploading the witness.

    A 2^20-row trace is a 4 MB host->device transfer (~130 ms through
    this deployment's relay); generating it on device cuts the upload to
    ~O(sqrt(T)) block seeds.  Block decomposition: with a_i = F_{i+1}
    (F_1 = F_2 = 1), the addition formula F_{m+n} = F_m F_{n+1} +
    F_{m-1} F_n at m = kB+1, n = j gives
    a_{kB+j} = F_{kB+1} F_{j+1} + F_{kB} F_j — a rank-2 outer product of
    O(sqrt(T)) host-computed seed vectors, all mod p.

    Matches the reference witness semantics (trace.rs:36-49 generates the
    exact integers; proving uses the mod-p reduction, trace.rs:29-34)."""
    import jax.numpy as jnp
    import numpy as np

    assert length >= 1
    B = 1 << max(0, (length.bit_length() - 1) // 2)  # ~sqrt(length)
    B = min(B, length)
    nb = (length + B - 1) // B

    # F_0..F_B (host ints mod p): the within-block ladder.
    fj = [0, 1]
    for _ in range(B):
        fj.append((fj[-1] + fj[-2]) % P)
    u0 = np.array(fj[0:B], dtype=np.uint32)       # F_j
    u1 = np.array(fj[1 : B + 1], dtype=np.uint32)  # F_{j+1}
    fB_1, fB, fB1 = fj[B - 1], fj[B], fj[B + 1]

    # Block seeds (F_{kB}, F_{kB+1}) stepped with the B-advance matrix.
    s0 = np.empty(nb, dtype=np.uint32)
    s1 = np.empty(nb, dtype=np.uint32)
    m0, m1 = 0, 1  # (F_0, F_1)
    for k in range(nb):
        s0[k], s1[k] = m0, m1
        m0, m1 = (
            (fB * m1 + fB_1 * m0) % P,   # F_{m+B}
            (fB1 * m1 + fB * m0) % P,    # F_{m+B+1}
        )

    return _fib_block_fn(length)(
        jnp.asarray(s0), jnp.asarray(s1), jnp.asarray(u0), jnp.asarray(u1)
    )
