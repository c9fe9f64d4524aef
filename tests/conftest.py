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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

# Persistent compile cache: the per-width hash/tree graphs dominate test
# wall time on a cold process; entries are keyed by platform so CPU and
# TPU runs coexist in the same directory.  allow_cpu: the cache is written
# and read on this same machine (the cross-host AOT feature-mismatch risk
# does not apply), and it cuts repeat suite runs by minutes.
from stark_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache(allow_cpu=True)
