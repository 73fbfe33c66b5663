"""Multi-chip scaling (SURVEY.md §3.2, §6.8).

The reference is single-process NumPy with no distribution; the TPU-native
analog is pure data parallelism over independent frames: shard the frame
batch across chips over ICI with `jax.sharding.NamedSharding` and let
XLA/GSPMD insert whatever collectives result gathering needs. A second mesh
axis ('sp') optionally shards the *recording sample axis* — the long-context
analog (SURVEY.md §6.7) — which GSPMD serves with FFT-side all-gathers;
useful when single recordings exceed one chip's memory.

No hand-written collectives are required in the signal chain: frames are
embarrassingly parallel (SURVEY.md §6.8: "the communication backend reduces
to XLA's ICI all-gather of results").
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "sharded_decode", "sharded_pipeline_step"]


def make_mesh(
    n_devices: Optional[int] = None,
    axes: tuple[str, ...] = ("dp",),
    shape: Optional[tuple[int, ...]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a device mesh. Defaults: 1-D 'dp' axis over all local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) if len(axes) == 1 else None
        if shape is None:
            raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def shard_batch(x, mesh: Mesh, axis: str = "dp"):
    """Place a host batch onto the mesh, sharded over its leading axis."""
    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def sharded_decode(modem, mesh: Mesh, seq_axis: Optional[str] = None):
    """Compile `modem.demodulate` with the frame batch sharded over 'dp'
    (and optionally samples over `seq_axis`). Returns f(rx) -> (bits, diag).

    rx: (B, T) float32 with B divisible by the 'dp' axis size.
    """
    in_spec = P("dp", seq_axis)
    return jax.jit(
        modem.demodulate,
        in_shardings=NamedSharding(mesh, in_spec),
        out_shardings=NamedSharding(mesh, P("dp")),
    )


def sharded_pipeline_step(modem, mesh: Mesh, margin: int = 512):
    """The full framework step, sharded: encode a bit batch, impair it on
    device (per-row random delay + AWGN via a jax PRNG), decode — SYNC
    INCLUDED (the most bandwidth-interesting stage under sharding; the r2
    version decoded at start=0 and skipped it) — and reduce the pre-FEC
    BER: the modem-domain analog of a distributed "training step"
    (SURVEY.md §6.3: channel impairments are the fault-injection loop).

    Returns f(info_bits (B, payload_bits) u8, key, snr_db) ->
    (ber scalar, bits_ok scalar, decoded bits (B, payload_bits)).
    """
    from jax import numpy as jnp

    def step(info_bits, key, snr_db):
        wav = modem.modulate_frames(info_bits)              # (B, frame_len)
        kd, kn = jax.random.split(key)
        pad = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, margin)])
        delays = jax.random.randint(kd, wav.shape[:-1], 0, margin)
        rx = jax.vmap(lambda r, d: jnp.roll(r, d, axis=-1))(pad, delays)
        p = jnp.mean(rx**2, axis=-1, keepdims=True)
        nvar = p / (10.0 ** (snr_db / 10.0))
        rx = rx + jax.random.normal(kn, rx.shape, rx.dtype) * jnp.sqrt(nvar)
        bits, diag = modem.demodulate(rx)                   # chirp sync included
        ber = jnp.mean((bits != info_bits).astype(jnp.float32))
        sync_err = jnp.max(jnp.abs(diag.sync_start - delays))
        ok = jnp.all(bits == info_bits) & (sync_err <= modem.cfg.cp // 4)
        return ber, ok, bits

    return jax.jit(
        step,
        in_shardings=(
            NamedSharding(mesh, P("dp", None)),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
        out_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("dp")),
        ),
    )
