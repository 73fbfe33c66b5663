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

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: most suite time is XLA recompiling the same
# modem programs in every test process (1-core box). Cold decode 29 s →
# 15 s warm (measured); invalidates itself on any HLO change, so it is
# safe across code edits. Lives untracked in the repo (.gitignore'd).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="include tests marked slow (the full tier; also GF3X_SLOW=1)")


def pytest_collection_modifyitems(config, items):
    """Two test tiers (VERDICT r3 item 7): the default run is the FAST tier
    — the 8 slowest breadth/duplication tests skip (each marker's comment
    names the sibling coverage that remains) — so TPU work on this 1-core
    box isn't starved; `pytest --slow` (or GF3X_SLOW=1) runs everything —
    do that once per round. Measured (2026-08-18): full tier 43:44, fast
    tier 28:22 on a cold compile cache; the persistent cache below cuts
    re-runs further (cold 29 s → warm 15 s on the flagship decode)."""
    if (config.getoption("--slow")
            or os.environ.get("GF3X_SLOW", "") not in ("", "0")):
        return
    skip = pytest.mark.skip(reason="slow tier: run with pytest --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
