"""Backend detection for kernel auto-switches.

`jax.default_backend()` alone is wrong on this box: the sitecustomize makes
the axon TPU the default platform, but computations may still target CPU
devices (the multichip dry run pins everything to a virtual CPU mesh via
`jax.default_device`). Pallas kernels must only engage when the computation
actually lands on a TPU.
"""

from __future__ import annotations

import jax

__all__ = ["computation_on_tpu"]


def computation_on_tpu() -> bool:
    """True when jitted computations will run on a TPU by default —
    respects an active `jax.default_device(...)` context."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", None) == "tpu"
    except Exception:
        pass
    return jax.default_backend() == "tpu"
