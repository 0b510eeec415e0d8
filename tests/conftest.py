"""Test configuration: run on CPU with 8 virtual devices (the JAX analogue
of the reference's cpu-10-threads coverage trick,
test_gradcheck_pushpull.py:21-27) and enable float64 for numerics tests."""
import os

# Force CPU for tests even when a TPU platform (e.g. 'axon') is configured
# in the environment: the suite runs numerics in float64 and simulates an
# 8-device mesh, neither of which belongs on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# (the env var alone is not honored once a TPU platform plugin is
# registered; the config update is authoritative)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles many small programs
# (one per static order/bound combination); cache them across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
