"""Test configuration: run the suite on CPU with 8 virtual devices.

SURVEY.md §4.7: the sandbox has one real TPU chip; distributed semantics are
tested with XLA's fake-backend trick and float64 is enabled for oracle-grade
comparisons.

Note: this sandbox's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) imports
jax and initializes the remote-TPU "axon" backend in *every* interpreter at
startup, before this file runs. Setting env vars is therefore not enough —
we must switch the platform through jax.config after the fact. The XLA_FLAGS
below still takes effect because the CPU client is only instantiated on
first use. Set TPUFWI_TEST_PLATFORM=axon to run the same suite on hardware.
"""

import os

platform = os.environ.get("TPUFWI_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", platform)
jax.config.update("jax_enable_x64", True)
