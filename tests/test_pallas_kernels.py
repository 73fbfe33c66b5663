"""Pallas kernel logic tests (interpreter mode on the CPU test mesh).

The real-TPU speed/parity runs happen in bench.py and the verify drives;
these check that the kernels' message schedules match their XLA twins
bit-for-bit, which is what guarantees TPU decodes equal golden decodes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gf3x.fec.ldpc import LdpcCode
from gf3x.fec.codes import N_BLOCK_COLS
from gf3x.ops.pallas.ldpc_bp import LANES, minsum_totals_tpu


@pytest.mark.parametrize("z", [24, 96])
def test_ldpc_pallas_kernel_matches_xla(z):
    code = LdpcCode(z)
    rng = np.random.default_rng(z)
    B = LANES  # one lane block
    u = rng.integers(0, 2, size=(B, code.k), dtype=np.uint8)
    c = code.encode(u)
    sigma = 0.75
    y = (1.0 - 2.0 * c) + rng.normal(0, sigma, c.shape)
    llr = (2 * y / sigma**2).astype(np.float32)

    bits_xla = np.asarray(code.decode_jax(jnp.asarray(llr), 8, use_pallas=False))

    lam_t = jnp.asarray(llr).reshape(B, N_BLOCK_COLS, z).transpose(1, 2, 0)
    tot = minsum_totals_tpu(lam_t, z, 8, interpret=True)
    total = np.asarray(tot).transpose(2, 0, 1).reshape(B, code.n)
    bits_pal = (total < 0).astype(np.uint8)[:, : code.k]

    assert np.array_equal(bits_pal, bits_xla)
    assert np.mean(bits_xla != u) < 0.01  # and it actually decodes
