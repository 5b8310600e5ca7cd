"""Test configuration: force an 8-device virtual CPU mesh before jax import.

This is the JAX-native answer to "multi-node testing without a cluster"
(SURVEY.md §4): every sharding/pjit test runs against 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
