"""Test configuration: force the CPU backend with 8 virtual devices.

The test container pins JAX_PLATFORMS=axon (real-TPU tunnel) via
sitecustomize, so the env var alone is not enough — we override through
jax.config before any backend is initialized.  Multi-device tests use the
virtual CPU mesh as a stand-in for a TPU pod slice (single-process
multi-device, per SURVEY §4: same global seed => same sharded trajectories).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
