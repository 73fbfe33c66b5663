"""ctypes binding for the native host LDPC codec (see ldpc.cc).

Builds the shared library on first use (g++ via make; ~1 s, cached next to
the source). pybind11 is not in this image, so the boundary is a plain C
ABI + ctypes (SURVEY.md §8 environment constraints).
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["NativeLdpc", "available"]

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libgf3xldpc.so"


@functools.lru_cache(maxsize=1)
def _lib():
    if not _SO.exists() or _SO.stat().st_mtime < (_DIR / "ldpc.cc").stat().st_mtime:
        subprocess.run(["make", "-s", "-C", str(_DIR)], check=True)
    lib = ctypes.CDLL(str(_SO))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.gf3x_ldpc_encode.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, u8p]
    lib.gf3x_ldpc_encode.restype = None
    lib.gf3x_ldpc_decode.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, u8p]
    lib.gf3x_ldpc_decode.restype = ctypes.c_int
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


class NativeLdpc:
    """Host C++ codec for the same code family as `gf3x.fec.ldpc.LdpcCode`.

    Shares the base matrix and parity projector with the Python/JAX side
    (single source of truth), runs the identical layered (block-row-serial)
    normalized min-sum schedule in float32.
    """

    def __init__(self, z: int, alpha: float = 0.8, rate: str = "1/2"):
        from ..fec.codes import block_rows, build_H_blocks, gf2_solve_parity

        self.z, self.alpha, self.rate = z, alpha, rate
        self.m = block_rows(rate) * z
        self.n = 24 * z
        self.k = self.n - self.m
        self._P = np.ascontiguousarray(gf2_solve_parity(z, rate),
                                       dtype=np.uint8)
        chk, var = [], []
        for (i, j, s) in build_H_blocks(z, rate):     # row-major, same order
            for c in range(z):                        # as the JAX decoder
                chk.append(i * z + c)
                var.append(j * z + (c + s) % z)
        self._chk = np.asarray(chk, dtype=np.int32)
        self._var = np.asarray(var, dtype=np.int32)

    def encode(self, u: np.ndarray) -> np.ndarray:
        u = np.ascontiguousarray(np.atleast_2d(u), dtype=np.uint8)
        n_cw = u.shape[0]
        out = np.empty((n_cw, self.n), dtype=np.uint8)
        _lib().gf3x_ldpc_encode(self._P, self.m, self.k, u, n_cw, out)
        return out

    def decode(self, llr: np.ndarray, iters: int = 25,
               early_exit: bool = True) -> tuple[np.ndarray, int]:
        """(n_cw, n) float LLRs (positive ⇒ bit 0) → (info bits, n_valid)."""
        llr = np.ascontiguousarray(np.atleast_2d(llr), dtype=np.float32)
        n_cw = llr.shape[0]
        out = np.empty((n_cw, self.n), dtype=np.uint8)
        ok = _lib().gf3x_ldpc_decode(
            self._chk, self._var, len(self._chk), self.m, self.n,
            llr, n_cw, iters, ctypes.c_float(self.alpha),
            int(early_exit), out)
        return out[:, : self.k], int(ok)
