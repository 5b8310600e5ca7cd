"""Test configuration: force an 8-device virtual CPU mesh before any jax use.

This is the JAX-native answer to "multi-node testing without a cluster"
(SURVEY.md §4): every sharding/pjit test runs against 8 virtual CPU devices.

NOTE: this environment exports JAX_PLATFORMS=axon (remote TPU tunnel) and the
plugin wins over a re-exported env var, so we must force the platform through
jax.config, not os.environ.
"""

import os

# HIPIE_TESTS_TPU=1 leaves the platform alone so the @tpu-marked tests (real
# Mosaic kernel compilation, in-program A/B) run against the tunneled chip:
#   HIPIE_TESTS_TPU=1 python -m pytest tests -m tpu
_TPU_RUN = os.environ.get("HIPIE_TESTS_TPU", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_RUN and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
if not _TPU_RUN:
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs a real TPU (run with HIPIE_TESTS_TPU=1)")
    config.addinivalue_line(
        "markers", "slow: multi-minute test (excluded from the fast tier)")
    config.addinivalue_line(
        "markers", "fast: curated inner-loop tier (pytest -m fast), opt-in "
                   "per module via pytestmark — measured cold on a 1-core "
                   "host, see README. The full suite is the merge gate.")
