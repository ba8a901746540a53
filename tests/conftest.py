# Test configuration: run on CPU with 8 virtual devices (the idiomatic fake
# backend for testing TPU sharding without a pod — SURVEY.md §4) and with
# float64 enabled (the reference's tolerances, 1e-10..1e-13, need it).
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); override via
# config, which takes precedence after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
