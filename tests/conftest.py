"""Test configuration: force an 8-device virtual CPU mesh.

Unit/physics tests run on CPU (like the reference's CPU-platform CI,
reference: .travis.yml + tests/test_simulation.py:25); sharding tests use
the 8 virtual devices. Benchmarks run separately on real TPU hardware.

Note: the environment's sitecustomize imports jax and points it at the
remote TPU backend before conftest runs, so flipping the platform must go
through jax.config (env vars alone are read too early).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
