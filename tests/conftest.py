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

# Persistent compilation cache: the VO builds per-instance jit closures,
# so every VisualOdometry() in the suite recompiles the same programs —
# the dominant cost of the integration tests on this 2-core host.  The
# disk cache absorbs repeats across tests AND across suite runs.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
