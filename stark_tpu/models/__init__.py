from stark_tpu.models.trace import Trace
from stark_tpu.models.air import Air, BoundaryConstraint
from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p

__all__ = [
    "Trace",
    "Air",
    "BoundaryConstraint",
    "FibonacciAir",
    "fibonacci_trace_mod_p",
]
