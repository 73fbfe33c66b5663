"""QC-LDPC code construction (reference FEC layer, SURVEY.md §3 "FEC codec").

The GF3 genre uses the course-provided C `ldpc` library with 802.16-style
rate-1/2 codes (SURVEY.md §3, Tier B). We construct the same family from
scratch: a 12×24 quasi-cyclic base matrix whose entries are circulant shifts
(−1 = zero block), lifted by a configurable factor z. Shifts scale as
⌊s·z/96⌋ from the z=96 mother matrix (the 802.16e rate-1/2 convention).

Only the *structure* matters for the rebuild: any full-rank dual-diagonal
QC matrix gives a valid systematic code, and all parity/consistency is
enforced by construction tests (H·cᵀ = 0), not by matching an external
artifact (the reference mount is empty — SURVEY.md §0).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["BASE_MATRIX_R12", "expand_shifts", "build_H_blocks", "gf2_solve_parity"]

# 802.16e-style rate-1/2 base model matrix (12 × 24), z0 = 96.
# Columns 0-11: information blocks; column 12: the weight-3 column h_b;
# columns 13-23: dual-diagonal parity structure.
BASE_MATRIX_R12 = np.array([
    [-1, 94, 73, -1, -1, -1, -1, -1, 55, 83, -1, -1,  7,  0, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [-1, 27, -1, -1, -1, 22, 79,  9, -1, -1, -1, 12, -1,  0,  0, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [-1, -1, -1, 24, 22, 81, -1, 33, -1, -1, -1,  0, -1, -1,  0,  0, -1, -1, -1, -1, -1, -1, -1, -1],
    [61, -1, 47, -1, -1, -1, -1, -1, 65, 25, -1, -1, -1, -1, -1,  0,  0, -1, -1, -1, -1, -1, -1, -1],
    [-1, -1, 39, -1, -1, -1, 84, -1, -1, 41, 72, -1, -1, -1, -1, -1,  0,  0, -1, -1, -1, -1, -1, -1],
    [-1, -1, -1, -1, 46, 40, -1, 82, -1, -1, -1, 79,  0, -1, -1, -1, -1,  0,  0, -1, -1, -1, -1, -1],
    [-1, -1, 95, 53, -1, -1, -1, -1, -1, 14, 18, -1, -1, -1, -1, -1, -1, -1,  0,  0, -1, -1, -1, -1],
    [-1, 11, 73, -1, -1, -1,  2, -1, -1, 47, -1, -1, -1, -1, -1, -1, -1, -1, -1,  0,  0, -1, -1, -1],
    [12, -1, -1, -1, 83, 24, -1, 43, -1, -1, -1, 51, -1, -1, -1, -1, -1, -1, -1, -1,  0,  0, -1, -1],
    [-1, -1, -1, -1, -1, 94, -1, 59, -1, -1, 70, 72, -1, -1, -1, -1, -1, -1, -1, -1, -1,  0,  0, -1],
    [-1, -1,  7, 65, -1, -1, -1, -1, 39, 49, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,  0,  0],
    [43, -1, -1, -1, -1, 66, -1, 41, -1, -1, -1, 26,  7, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,  0],
], dtype=np.int64)

N_BLOCK_ROWS, N_BLOCK_COLS = BASE_MATRIX_R12.shape  # 12, 24
Z0 = 96


def expand_shifts(z: int) -> np.ndarray:
    """Scale the mother-matrix shifts to lifting factor z: ⌊s·z/96⌋."""
    B = BASE_MATRIX_R12.copy()
    pos = B >= 0
    B[pos] = (B[pos] * z) // Z0
    return B


def build_H_blocks(z: int):
    """Edge list of the lifted H: [(block_row, block_col, shift)], row-major.

    Each entry is a z×z circulant P^s: check c of block row i connects to
    variable (c + s) mod z of block col j.
    """
    B = expand_shifts(z)
    edges = [
        (i, j, int(B[i, j]))
        for i in range(N_BLOCK_ROWS)
        for j in range(N_BLOCK_COLS)
        if B[i, j] >= 0
    ]
    return edges


def _dense_H(z: int) -> np.ndarray:
    """Dense (12z × 24z) binary H — host-side only (construction + tests)."""
    m, n = N_BLOCK_ROWS * z, N_BLOCK_COLS * z
    H = np.zeros((m, n), dtype=np.uint8)
    for (i, j, s) in build_H_blocks(z):
        rows = np.arange(z)
        H[i * z + rows, j * z + (rows + s) % z] = 1
    return H


@functools.lru_cache(maxsize=None)
def gf2_solve_parity(z: int) -> np.ndarray:
    """Parity projector P (m × k) over GF(2): for info bits u, the parity
    bits are p = P·u (mod 2), giving codeword c = [u, p] with H·cᵀ = 0.

    Computed once per z on the host by bit-packed Gaussian elimination of
    B·X = A where H = [A | B]. This dense projector turns the *device*
    encoder into a single (batch × k)·(k × m) matmul on the MXU — the
    TPU-native replacement for the reference's C back-substitution encoder
    (SURVEY.md §3.1 rebuild consequence).
    """
    H = _dense_H(z)
    m = N_BLOCK_ROWS * z
    k = N_BLOCK_COLS * z - m
    A = H[:, :k]
    B = H[:, k:]

    # bit-pack rows of the augmented [B | A] into uint64 words (solve B X = A)
    words = (m + k + 63) // 64
    aug = np.zeros((m, words), dtype=np.uint64)
    cols = np.concatenate([B, A], axis=1)
    idx = np.nonzero(cols)
    np.bitwise_or.at(aug, (idx[0], idx[1] // 64), np.uint64(1) << (idx[1] % 64).astype(np.uint64))

    # Gaussian elimination to reduced row echelon over the first m columns
    pivot_of_col = np.full(m, -1, dtype=np.int64)
    r = 0
    for c in range(m):
        w, b = c // 64, np.uint64(1) << np.uint64(c % 64)
        rows = np.nonzero(aug[r:, w] & b)[0]
        if rows.size == 0:
            continue
        pr = r + int(rows[0])
        if pr != r:
            aug[[r, pr]] = aug[[pr, r]]
        elim = np.nonzero(aug[:, w] & b)[0]
        elim = elim[elim != r]
        aug[elim] ^= aug[r]
        pivot_of_col[c] = r
        r += 1
        if r == m:
            break
    if np.any(pivot_of_col < 0):
        raise ValueError(f"parity part of H is singular for z={z}")

    # unpack: after RREF the row pivoting on column c holds row c of X = B⁻¹A
    # in its trailing k columns (bits m .. m+k−1)
    P = np.zeros((m, k), dtype=np.uint8)
    bitpos = m + np.arange(k)
    for c in range(m):
        row = aug[pivot_of_col[c]]
        P[c] = (row[bitpos // 64] >> (bitpos % 64).astype(np.uint64)).astype(np.uint8) & 1
    return P
