"""Backend detection for kernel auto-switches.

`jax.default_backend()` alone is wrong on this box: the sitecustomize makes
the axon TPU the default platform, but computations may still target CPU
devices (the multichip dry run pins everything to a virtual CPU mesh via
`jax.default_device`). Pallas kernels must only engage when the computation
actually lands on a TPU.

`pallas_ok()` adds one more gate on top: the `xla_twin_only()` context.
A `pallas_call` traced under GSPMD auto-partitioning (jit with
`in_shardings` over a >1-device mesh, NOT `shard_map`) has no partitioning
rule — GSPMD would replicate its operands (a silent full all-gather of the
symbol matrix) or fail to compile. The supported multi-chip routes are
therefore (a) `parallel.mesh.sharded_decode`'s `shard_map`, under which the
kernels see per-shard LOCAL shapes and need no partitioner, and (b) the
GSPMD sample-axis route, which traces inside `xla_twin_only()` so every
kernel call site routes to its XLA twin (matmul DFTs etc. stay on — XLA
partitions plain HLO fine; only `pallas_call` is gated).
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["computation_on_tpu", "pallas_ok", "xla_twin_only"]

_XLA_TWIN_ONLY = 0


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


def pallas_ok() -> bool:
    """Whether Pallas kernel call sites may engage: on a TPU and not under
    `xla_twin_only()`. Every `pallas_call` router in the package checks
    THIS (not `computation_on_tpu`), so one trace-time context reliably
    forces the XLA-twin formulation of the whole receive chain."""
    return _XLA_TWIN_ONLY == 0 and computation_on_tpu()


@contextlib.contextmanager
def xla_twin_only():
    """Force every kernel router to its XLA twin for traces begun inside
    this context (trace-time Python state — enter it AROUND the jit CALL
    that triggers tracing, as `parallel.mesh.sharded_decode(seq_axis=...)`
    does). Use when a program must be pure partitionable HLO: GSPMD
    sharding without shard_map, AOT export, etc."""
    global _XLA_TWIN_ONLY
    _XLA_TWIN_ONLY += 1
    try:
        yield
    finally:
        _XLA_TWIN_ONLY -= 1
