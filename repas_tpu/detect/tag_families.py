"""tag36h11 family data.

The reference detects tag36h11 via the pupil-apriltags C library
(april_tag_detector_solvepnp.py:154-162). The family's public codebook has
587 codewords with minimum Hamming distance 11 between any pair under all
four rotations; the subset embedded here covers ids 0-35 (the printed-tag
id range the reference pipelines use — its scripts reference ids 9 and 16,
mpa_final_view_with_export.py:27). The table is plain data and extensible:
append codewords to TAG36H11_CODES to widen id coverage.

Bit convention: a codeword's bit 35 (MSB) is the top-left data cell of the
upright tag, proceeding row-major (left-to-right, top-to-bottom) over the
6x6 data grid; a cell is 1 where the tag is white.
"""
from __future__ import annotations

import numpy as np

# First 36 codewords of the tag36h11 family codebook.
TAG36H11_CODES = [
    0x0000000D5D628584, 0x0000000D97F18B49, 0x0000000DD280910E,
    0x0000000E479E9C98, 0x0000000EBCBCA822, 0x0000000F31DAB3AC,
    0x0000000056A5D085, 0x000000010652E1D4, 0x000000022B1DFEAD,
    0x0000000265AD0472, 0x000000034FE91B86, 0x00000003FF962CD5,
    0x000000043A25329A, 0x0000000474B4385F, 0x00000004E9D243E9,
    0x00000005246149AE, 0x00000005997F5538, 0x0000000683BB6C4C,
    0x00000006BE4A132A, 0x00000007E3158EEA, 0x000000081DA494AF,
    0x0000000858339A74, 0x00000008CD51A5FE, 0x00000009F21CC2D7,
    0x0000000A2CABC89C, 0x0000000ADC58D9EB, 0x0000000B16E7DFB0,
    0x0000000B8C05EB3A, 0x0000000D25EF139D, 0x0000000D607E1962,
    0x0000000E4ABA3076, 0x00000002DDE6A3DA, 0x000000043D40C678,
    0x00000005620BE351, 0x000000064C47FA65, 0x0000000686D7002A,
]

GRID = 6           # data cells per side
NBITS = GRID * GRID


def code_to_bits(code: int) -> np.ndarray:
    """Codeword -> (6,6) bool grid, MSB = top-left, row-major."""
    bits = [(code >> (NBITS - 1 - i)) & 1 for i in range(NBITS)]
    return np.array(bits, dtype=bool).reshape(GRID, GRID)


def tag_family_bits(codes=None) -> np.ndarray:
    """(N, 36) bool table for the family."""
    codes = TAG36H11_CODES if codes is None else codes
    return np.stack([code_to_bits(c).reshape(-1) for c in codes])


def rotation_perms() -> np.ndarray:
    """(4, 36) index permutations: perm[k][i] gives the flat index in the
    OBSERVED grid of the canonical grid's flat cell i after the observed
    tag is the canonical one rotated k*90deg counter-clockwise (numpy
    rot90 convention).
    """
    base = np.arange(NBITS).reshape(GRID, GRID)
    # rot90(A,k).flat == A.flat[rot90(base,k).flat]
    return np.stack([np.rot90(base, k).reshape(-1)
                     for k in range(4)]).astype(np.int32)
