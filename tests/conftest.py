"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (SURVEY.md §5).

NOTE: the harness environment presets JAX_PLATFORMS=axon and a
sitecustomize that imports jax at interpreter startup, so environment
variables set here are too late — jax.config.update is the only reliable
override.  XLA_FLAGS is still read lazily at CPU client creation, so
setting it here (before the first jax operation) works.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
