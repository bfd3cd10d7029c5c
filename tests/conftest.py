"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available; sharding logic is tested on a
virtual CPU mesh per the driver contract.  The session environment pins
JAX_PLATFORMS=axon (one real TPU via a tunnel) and a sitecustomize
registers the axon PJRT plugin at interpreter startup, so we must
override via jax.config *after* import but before backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
