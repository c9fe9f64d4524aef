"""Additional AIR examples beyond the reference's Fibonacci workload.

The reference ships only the Fibonacci trace generator (reference
src/trace.rs:36-49) and no constraint system at all; these AIRs exercise
the composer's generality: multiple registers, multiple constraints, and
constraint degree > 1 (which drives the degree-adjustment bookkeeping in
stark.py).
"""

from __future__ import annotations

from stark_tpu.models.air import Air, BoundaryConstraint
from stark_tpu.ops.fieldops import P


class TwoRegisterFibonacciAir(Air):
    """Fibonacci as a width-2 trace: (a, b) -> (b, a+b).

    Two registers, frame depth 1, two transition constraints — the smallest
    AIR that exercises multi-register rows and multi-constraint
    composition.
    """

    num_registers = 2
    frame_offsets = (0, 1)
    constraint_degree = 1

    def transition_constraints(self, frame, ops):
        a0, b0 = frame[0]
        a1, b1 = frame[1]
        return [
            ops.sub(a1, b0),                 # a' = b
            ops.sub(b1, ops.add(a0, b0)),    # b' = a + b
        ]

    def boundary_constraints(self, trace_length: int):
        return [
            BoundaryConstraint(row=0, register=0, value=1),
            BoundaryConstraint(row=0, register=1, value=1),
        ]


def two_register_fibonacci_trace(length: int) -> list[list[int]]:
    rows, a, b = [], 1, 1
    for _ in range(length):
        rows.append([a, b])
        a, b = b, (a + b) % P
    return rows


class SquareAir(Air):
    """t' = t^2: a degree-2 transition constraint.

    Exercises constraint_degree > 1 (quotient degrees, x^shift adjustment).
    """

    num_registers = 1
    frame_offsets = (0, 1)
    constraint_degree = 2

    def transition_constraints(self, frame, ops):
        t0 = frame[0][0]
        t1 = frame[1][0]
        return [ops.sub(t1, ops.mul(t0, t0))]

    def boundary_constraints(self, trace_length: int):
        return [BoundaryConstraint(row=0, register=0, value=3)]


def square_trace(length: int) -> list[list[int]]:
    rows, t = [], 3
    for _ in range(length):
        rows.append([t])
        t = (t * t) % P
    return rows
