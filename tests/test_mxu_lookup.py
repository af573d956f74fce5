"""MXU one-hot table lookups: exactness on both supported decompositions."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_test_tpu.ops import mxu_lookup as M


def test_word_lookup_exact_4096():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 2**32, 3000, dtype=np.uint32)
    tb = jnp.asarray(M.pack_words_to_bytes_f32(words, pad_to=4096))
    idx = rng.integers(0, 3000, 50000).astype(np.int32)
    got = np.asarray(jax.jit(M.mxu_word_lookup)(tb, jnp.asarray(idx))).astype(np.uint32)
    np.testing.assert_array_equal(got, words[idx])


def test_word_lookup_exact_16384():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 2**32, 16384, dtype=np.uint32)
    tb = jnp.asarray(M.pack_words_to_bytes_f32(words, pad_to=16384))
    idx = rng.integers(0, 16384, 50000).astype(np.int32)
    got = np.asarray(jax.jit(M.mxu_word_lookup)(tb, jnp.asarray(idx))).astype(np.uint32)
    np.testing.assert_array_equal(got, words[idx])


def test_bit_and_nibble_lookups():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 131072).astype(bool)
    tb = jnp.asarray(M.pack_words_to_bytes_f32(M.pack_bits(bits)))
    bidx = rng.integers(0, 131072, 20000).astype(np.int32)
    got = np.asarray(jax.jit(M.mxu_bit_lookup)(tb, jnp.asarray(bidx)))
    np.testing.assert_array_equal(got, bits[bidx].astype(np.int32))

    nibs = rng.integers(0, 16, 32768).astype(np.uint8)
    tb2 = jnp.asarray(M.pack_words_to_bytes_f32(M.pack_nibbles(nibs)))
    nidx = rng.integers(0, 32768, 20000).astype(np.int32)
    got2 = np.asarray(jax.jit(M.mxu_nibble_lookup)(tb2, jnp.asarray(nidx)))
    np.testing.assert_array_equal(got2, nibs[nidx].astype(np.int32))
