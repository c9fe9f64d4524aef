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


def get_model(name: str):
    """Model registry for the CLI and tools: name -> (air, trace_fn,
    min_blowup).  ``trace_fn(T)`` returns prover-ready trace rows."""
    from stark_tpu.models import examples as ex
    from stark_tpu.models.fibonacci import fibonacci_trace_mod_p

    registry = {
        "fib": (FibonacciAir, fibonacci_trace_mod_p, 4),
        "fib2": (ex.TwoRegisterFibonacciAir, ex.two_register_fibonacci_trace, 4),
        "square": (ex.SquareAir, ex.square_trace, 4),
        "cube": (ex.CubeAir, ex.cube_trace, 8),
        "mds": (ex.MdsSquareAir, ex.mds_square_trace, 4),
    }
    air_cls, trace_fn, min_blowup = registry[name]
    return air_cls(), trace_fn, min_blowup


MODEL_NAMES = ("fib", "fib2", "square", "cube", "mds")
