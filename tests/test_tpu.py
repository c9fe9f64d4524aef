"""On-device (real TPU backend) correctness subset: ``pytest -m tpu``.

The main suite runs on a virtual CPU mesh (tests/conftest.py forces the
platform before any backend use), so the fused Pallas/TPU kernels'
on-device correctness was previously asserted only as a bench.py side
effect.  These tests run each check in a SUBPROCESS against the default
(axon TPU) backend — the platform choice is process-wide, so a subprocess
is the only way to reach the real chip from inside the CPU-forced suite.

Marked ``tpu`` (select with -m tpu) and ``slow`` (excluded from the
default -m "not slow" run: they need the relay, and remote cold compiles
can take minutes).  Each test SKIPS when the backend probe fails.
"""

import subprocess
import sys

import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

_PROBE_TIMEOUT = 120
_RUN_TIMEOUT = 1500

_PRELUDE = """
import jax
from stark_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
assert jax.default_backend() not in ("cpu",), jax.default_backend()
import jax.numpy as jnp
import numpy as np
"""


def _tpu_reachable() -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=_PROBE_TIMEOUT,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_on_tpu(code: str, env: dict | None = None) -> None:
    import os

    if not _tpu_reachable():
        pytest.skip("TPU backend unreachable")
    r = subprocess.run(
        [sys.executable, "-c", _PRELUDE + code],
        timeout=_RUN_TIMEOUT,
        capture_output=True,
        text=True,
        env={**os.environ, **(env or {})},
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-4000:]}"


def test_fused_ntt_matches_stockham_on_device():
    """Strict AND lazy fused NTT == the Stockham chain at 2^18, on chip
    (the CPU suite pins this via interpret paths; here it is the real
    Mosaic compilation being checked)."""
    _run_on_tpu(
        """
from stark_tpu.ops import ntt as NTT
from stark_tpu.ops.ntt_fused import fused_available, fused_ntt
n = 1 << 18
rng = np.random.default_rng(5)
x = jnp.asarray(rng.integers(0, 998244353, size=n, dtype=np.uint32))
assert fused_available(n, x.shape)
want = np.asarray(NTT.ntt(x))
assert np.array_equal(np.asarray(fused_ntt(x, lazy=False)), want), "strict"
assert np.array_equal(np.asarray(fused_ntt(x, lazy=True)), want), "lazy"
print("fused NTT OK")
"""
    )


def test_pallas_fold_matches_jnp_on_device():
    _run_on_tpu(
        """
from stark_tpu.fri import Fri, _fold_kernel
from stark_tpu.ops import fieldops as F
from stark_tpu.ops import pallas_kernels as PK
from stark_tpu.ops.fieldops import primitive_nth_root
n = 1 << 18
fri = Fri(omega=primitive_nth_root(n), offset=3, domain_length=n,
          expansion_factor=4, num_colinearity_tests=8)
rng = np.random.default_rng(7)
cw = jnp.asarray(rng.integers(0, 998244353, size=n, dtype=np.uint32))
alpha = 123456789123456789
got = np.asarray(fri.fold_codeword(cw, alpha, 0))
assert PK.pallas_enabled(), "expected the Pallas fold on TPU"  # env-gated
P = 998244353
a_red = alpha % P
want = np.asarray(_fold_kernel(
    cw[: n // 2], cw[n // 2:], fri._plan.inv_x_mont(0),
    jnp.uint32(a_red), jnp.uint32(int(F.shoup_precompute(a_red))),
    jnp.uint32(pow(2, P - 2, P)),
    jnp.uint32(int(F.shoup_precompute(pow(2, P - 2, P)))),
))
assert np.array_equal(got, want)
print("pallas fold OK")
""",
        env={"STARK_TPU_PALLAS": "1"},  # the Pallas fold is env-gated
    )


def test_chained_prove_bytes_on_device_match_cpu(tmp_path):
    """The single-fetch chained prove on the REAL chip must emit the same
    bytes as the CPU prover in this (CPU-forced) process — cross-backend
    transcript determinism, the strongest on-device protocol check.
    The expected proof travels via a file (too big for argv)."""
    from stark_tpu import StarkConfig, StarkProver, StarkVerifier
    from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p

    T = 1 << 10
    air = FibonacciAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=8)
    cpu_proof = StarkProver(air, cfg).prove(fibonacci_trace_mod_p(T))
    assert StarkVerifier(air, cfg).verify(cpu_proof)
    expected_file = tmp_path / "expected_proof.bin"
    expected_file.write_bytes(cpu_proof)
    _run_on_tpu(
        f"""
from stark_tpu import StarkConfig, StarkProver
from stark_tpu.models.fibonacci import FibonacciAir, fibonacci_trace_mod_p
T = {T}
cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=8)
proof = StarkProver(FibonacciAir(), cfg).prove(fibonacci_trace_mod_p(T))
expected = open({str(expected_file)!r}, "rb").read()
assert proof == expected, "TPU proof bytes != CPU proof bytes"
print("chained prove bytes OK")
"""
    )


def test_mds_wide_trace_bytes_on_device_match_cpu(tmp_path):
    """Round-4 wide flagship (c=8, degree-2, multi-chunk row hashing) on
    the REAL chip: bytes must match the CPU prover's."""
    from stark_tpu import StarkConfig, StarkProver, StarkVerifier
    from stark_tpu.models.examples import MdsSquareAir, mds_square_trace

    T = 1 << 10
    air = MdsSquareAir()
    cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=8)
    rows = mds_square_trace(T)
    cpu_proof = StarkProver(air, cfg).prove(rows)
    assert StarkVerifier(air, cfg).verify(cpu_proof)
    expected_file = tmp_path / "expected_mds.bin"
    expected_file.write_bytes(cpu_proof)
    _run_on_tpu(
        f"""
from stark_tpu import StarkConfig, StarkProver
from stark_tpu.models.examples import MdsSquareAir, mds_square_trace
T = {T}
cfg = StarkConfig(trace_length=T, blowup=4, num_colinearity_tests=8)
proof = StarkProver(MdsSquareAir(), cfg).prove(mds_square_trace(T))
expected = open({str(expected_file)!r}, "rb").read()
assert proof == expected, "TPU MDS proof bytes != CPU proof bytes"
print("mds wide bytes OK")
"""
    )


def test_degree3_cube_roundtrip_on_device():
    """Degree-3 AIR (h=2 composition widening, FRI expansion blowup/2)
    proves and verifies on the real chip."""
    _run_on_tpu(
        """
from stark_tpu import StarkConfig, StarkProver, StarkVerifier
from stark_tpu.models.examples import CubeAir, cube_trace
T = 1 << 10
cfg = StarkConfig(trace_length=T, blowup=8, num_colinearity_tests=8)
proof = StarkProver(CubeAir(), cfg).prove(cube_trace(T))
assert StarkVerifier(CubeAir(), cfg).verify(proof)
print("cube on-device OK")
"""
    )
