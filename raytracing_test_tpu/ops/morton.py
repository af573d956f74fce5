"""Morton (Z-order) encoding utilities.

Reference parity: getMortonPos (src/main.cpp:45-66) spreads each coordinate's low
10 bits with the parallel-prefix masks 0x030000FF / 0x0300F00F / 0x030C30C3 and
interleaves as z<<4 | y<<2 | x per 2-bit digit — i.e. each 6-bit Morton digit is
the reference tree's child index (z2<<4 | y2<<2 | x2, tetrahexa_tree.cpp:85).

The render kernels here do not need incremental Morton descent (the device-side
structure is a dense grid, core/flatten.py), but Morton order is used for brick
layout locality and the encoder is kept bit-exact for parity tests and for the
host tree's traversal cache. Works on numpy arrays and jax arrays alike.
"""

from __future__ import annotations

import numpy as np

# 2-bit spread masks (src/main.cpp:48-51): n -> bits of n spread so that bit k of n
# lands at bit 2k... actually in the reference's scheme each coordinate contributes
# 2-bit GROUPS interleaved at stride 6; masks spread 10 bits into pairs.
_M0 = 0x030000FF
_M1 = 0x0300F00F
_M2 = 0x030C30C3


def spread2(n):
    """Spread the low 10 bits of n into 2-bit groups at 6-bit stride.

    Bit-exact with the shader/main.cpp bit cascade:
        n = (n | (n << 16)) & 0x030000FF
        n = (n | (n <<  8)) & 0x0300F00F
        n = (n | (n <<  4)) & 0x030C30C3
    """
    n = n & 0x3FF if isinstance(n, int) else n.astype(np.uint32) & np.uint32(0x3FF)
    n = (n | (n << 16)) & _M0
    n = (n | (n << 8)) & _M1
    n = (n | (n << 4)) & _M2
    return n


def morton_encode(x, y, z):
    """(x, y, z) -> 30-bit Morton code, digit layout z<<4 | y<<2 | x per level."""
    return (spread2(z) << 4) | (spread2(y) << 2) | spread2(x)


def morton_digits(code: int, max_depth: int = 5):
    """Split a 30-bit Morton code into 6-bit child indices, root-first.

    Digit k (k=0 is the first child selection below the root) is
    (code >> ((max_depth - 1 - k) * 6)) & 0x3f, matching the shader's descent
    (src/shaders/low_res.frag:506-518 uses posOffset = (MAX_DEPTH-1-depth)*6).
    """
    return [(code >> ((max_depth - 1 - k) * 6)) & 0x3F for k in range(max_depth)]


def child_index(x: int, y: int, z: int, depth: int, max_depth: int = 5) -> int:
    """Child slot (0..63) selected at ``depth`` when descending to (x,y,z).

    depth=0 is the root's child selection, consuming address bits
    [2*(max_depth-1-depth), +2) of each axis (ref: tetrahexa_tree.cpp:127-129).
    """
    shift = 2 * (max_depth - 1 - depth)
    cx = (x >> shift) & 0b11
    cy = (y >> shift) & 0b11
    cz = (z >> shift) & 0b11
    return cz << 4 | cy << 2 | cx
