"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths (`meteor_scatter_tpu.parallel`) are exercised
without TPU hardware, per SURVEY.md §4's test plan."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The TPU runtime plugin (sitecustomize) force-sets jax_platforms
# programmatically; pin it back to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
