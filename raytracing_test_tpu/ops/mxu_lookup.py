"""MXU-based table lookups: turning gathers into matmuls.

XLA's TPU gather is scalar-latency bound (~1e8 lookups/s measured on v5e, flat
in table size) — fatal for a per-step voxel lookup. For tables that fit a
64x64 factorization (<= 4096 entries), a lookup can instead be expressed as two
one-hot contractions that run on the MXU/VPU at ~8e8+ lookups/s:

    idx = hi*64 + lo
    M1  = onehot(hi) @ table.reshape(64, 64*C)      (MXU, bf16 x bf16 -> f32)
    out = sum_j onehot(lo)[:, j] * M1[:, j, :]      (VPU select-reduce)

Exactness: table values are split into bytes (0..255), which bf16 represents
exactly; one-hot products and f32 accumulation are then exact, so u32 words
survive bit-for-bit.

This is the lookup engine for the render-time occupancy hierarchy
(core/flatten.py packs brick occupancy into exactly 4096 u32 words for the
256x128x256 default window).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_words_to_bytes_f32(words: np.ndarray) -> np.ndarray:
    """u32[W] -> f32[W, 4] little-endian bytes, padded to W=4096."""
    w = np.asarray(words, dtype=np.uint32)
    assert w.ndim == 1 and w.shape[0] <= 4096, w.shape
    out = np.zeros((4096, 4), dtype=np.float32)
    for b in range(4):
        out[: w.shape[0], b] = ((w >> (8 * b)) & 0xFF).astype(np.float32)
    return out


def mxu_word_lookup(table_bytes: jax.Array, idx: jax.Array) -> jax.Array:
    """Lookup u32 words (as exact byte planes) by index.

    table_bytes: f32[4096, 4] from pack_words_to_bytes_f32.
    idx: int32[N] in [0, 4096).
    returns: int32[N] (the u32 word bit pattern; safe for bit ops).
    """
    hi = (idx >> 6).astype(jnp.int32)
    lo = (idx & 63).astype(jnp.int32)
    ar = jnp.arange(64, dtype=jnp.int32)
    oh_hi = (hi[:, None] == ar[None, :]).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == ar[None, :]).astype(jnp.float32)
    tab = table_bytes.reshape(64, 64 * 4).astype(jnp.bfloat16)
    m1 = jax.lax.dot_general(
        oh_hi, tab, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, 256]
    m1 = m1.reshape(-1, 64, 4)
    bytes_ = jnp.einsum("nj,njb->nb", oh_lo, m1)  # exact 0..255 floats
    b = bytes_.astype(jnp.int32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def mxu_bit_lookup(table_bytes: jax.Array, bit_idx: jax.Array) -> jax.Array:
    """Test bit ``bit_idx`` of a packed bitfield stored as u32 words.

    bit_idx: int32[N] in [0, 131072). returns int32[N] in {0, 1}.
    """
    word = mxu_word_lookup(table_bytes, bit_idx >> 5)
    return (word >> (bit_idx & 31)) & 1


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """bool[n] -> u32[ceil(n/32)] little-endian bit packing."""
    b = np.asarray(bits).astype(np.uint8).ravel()
    pad = (-len(b)) % 32
    if pad:
        b = np.concatenate([b, np.zeros(pad, np.uint8)])
    b = b.reshape(-1, 32).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return (b << shifts[None, :]).sum(axis=1, dtype=np.uint32)
