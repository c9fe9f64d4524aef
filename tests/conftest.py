"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding (Mesh/pjit/shard_map collectives) is exercised without
TPU pod hardware via XLA's host-platform device-count flag, per the
framework's test strategy (SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
