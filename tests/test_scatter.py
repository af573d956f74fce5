"""Dedup scatter-add (ops/scatter.py): the VJP must equal XLA's plain
scatter-add up to FP association, in both the compact and the fallback branch."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_test_tpu.ops.scatter import take_rows


def _grad_pair(V, N, C, n_unique, compact_div, seed=0):
    rng = np.random.default_rng(seed)
    idx = jnp.asarray(rng.integers(0, n_unique, N).astype(np.int32))
    tab = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    def loss_dedup(t):
        return (take_rows(t, idx, compact_div) * w).sum()

    def loss_plain(t):
        return (jnp.take(t, idx, axis=0) * w).sum()

    gd = jax.jit(jax.grad(loss_dedup))(tab)
    gp = jax.jit(jax.grad(loss_plain))(tab)
    return np.asarray(gd), np.asarray(gp)


def test_compact_branch_matches_plain():
    gd, gp = _grad_pair(V=4096, N=8192, C=4, n_unique=300, compact_div=8)
    # prefix-difference association error ~ eps * prefix magnitude
    np.testing.assert_allclose(gd, gp, rtol=1e-4, atol=1e-4)


def test_fallback_branch_matches_plain():
    # more unique indices than the compact budget -> the cond fallback
    gd, gp = _grad_pair(V=65536, N=4096, C=4, n_unique=65536, compact_div=8)
    np.testing.assert_allclose(gd, gp, rtol=1e-5, atol=1e-5)


def test_small_n_uses_plain_path():
    gd, gp = _grad_pair(V=512, N=128, C=3, n_unique=64, compact_div=8)
    np.testing.assert_allclose(gd, gp, rtol=1e-6, atol=1e-6)


def test_forward_is_take():
    rng = np.random.default_rng(3)
    tab = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 100, 5000).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(take_rows(tab, idx)), np.asarray(jnp.take(tab, idx, axis=0))
    )
