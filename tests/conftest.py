"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding (Mesh/pjit/shard_map collectives) is exercised without
TPU pod hardware via XLA's host-platform device-count flag, per the
framework's test strategy (SURVEY.md section 4).

Note: the environment may pre-import jax at interpreter startup (a
sitecustomize that registers a TPU PJRT plugin), which locks the
JAX_PLATFORMS env default before this file runs — so the platform is forced
through jax.config, not the environment.  XLA_FLAGS is still read at (lazy)
backend initialization, which has not happened yet at collection time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # This VM migrates between hosts with different AVX-512 feature sets
    # (observed: flaky SIGSEGV/SIGABRT inside XLA:CPU compile and
    # executable (de)serialization, plus 'machine type ... doesn't match'
    # AOT warnings).  Capping the ISA makes generated code portable
    # across the migration set.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

# Persistent compile cache: the per-width hash/tree graphs dominate test
# wall time on a cold process; entries are keyed by platform (and, inside
# enable_compilation_cache, by host CPU feature flags) so CPU and TPU
# runs coexist.  It cuts repeat suite runs by minutes.
from stark_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(allow_cpu=True)

import pytest


@pytest.fixture(autouse=True)
def _map_pressure_guard():
    """The full suite compiles thousands of XLA:CPU executables whose code
    mappings accumulate until the process hits vm.max_map_count (65530 by
    default) — the next compile then SEGFAULTS inside
    backend_compile_and_load (measured: maps grew 16k -> 64k over a suite
    run, death at the limit).  Clearing JAX's executable caches releases
    the mappings; recompiles are softened by the persistent cache."""
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 45000:
        jax.clear_caches()
