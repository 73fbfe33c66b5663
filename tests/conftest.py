"""Test harness config.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path; the real-TPU benchmark is `bench.py`).

NOTE: this box's sitecustomize registers the axon TPU plugin and forces
`jax_platforms="axon,cpu"` AFTER reading env vars, so `JAX_PLATFORMS=cpu` in
the environment is NOT enough — the jax config itself must be updated before
any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
