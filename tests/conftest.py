"""Force JAX onto an 8-device virtual CPU mesh for the test suite.

Real-TPU runs happen via bench.py / the driver; unit tests must be
CPU-runnable and exercise multi-device sharding on virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

The environment registers an 'axon' TPU platform via sitecustomize before
pytest imports this file, so we both set the env vars and force the platform
through jax.config (which wins after import).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
