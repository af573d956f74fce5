"""Seed-exact OpenSimplex parity vs golden values dumped from the reference's
vendored C++ implementation (include/OpenSimplexNoise.cpp) at seeds 42/64/100."""

import numpy as np
import pytest

from raytracing_test_tpu.worldgen.opensimplex import OpenSimplex2D, build_perm

GOLD = np.load("tests/golden/opensimplex_golden.npz")


@pytest.mark.parametrize("seed", [42, 64, 100])
def test_scalar_matches_reference(seed):
    m = GOLD["seeds"] == seed
    xs, ys, vs = GOLD["x"][m], GOLD["y"][m], GOLD["v"][m]
    noise = OpenSimplex2D(seed)
    # subsample for speed; scalar path is the bit-exactness oracle
    idx = np.arange(0, len(xs), 7)
    got = np.array([noise.eval(x, y) for x, y in zip(xs[idx], ys[idx])])
    np.testing.assert_allclose(got, vs[idx], rtol=0, atol=1e-15)


@pytest.mark.parametrize("seed", [42, 64, 100])
def test_vectorized_matches_reference(seed):
    m = GOLD["seeds"] == seed
    noise = OpenSimplex2D(seed)
    got = noise.eval_vec(GOLD["x"][m], GOLD["y"][m])
    np.testing.assert_allclose(got, GOLD["v"][m], rtol=0, atol=1e-14)


def test_perm_is_permutation():
    p = build_perm(12345)
    assert sorted(p.tolist()) == list(range(256))


def test_vectorized_matches_scalar_random():
    rng = np.random.default_rng(0)
    x = rng.uniform(-100, 100, 500)
    y = rng.uniform(-100, 100, 500)
    noise = OpenSimplex2D(7)
    scalar = np.array([noise.eval(a, b) for a, b in zip(x, y)])
    np.testing.assert_allclose(noise.eval_vec(x, y), scalar, atol=1e-14)


def test_jax_backend_matches():
    import jax.numpy as jnp

    noise = OpenSimplex2D(42)
    x = np.linspace(-3, 3, 64)
    y = np.linspace(-2, 5, 64)
    ref = noise.eval_vec(x, y)
    got = np.asarray(noise.eval_vec(x, y, xp=jnp))
    # jax runs in f32 without x64; tolerance accordingly
    np.testing.assert_allclose(got, ref, atol=2e-5)
