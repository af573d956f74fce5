"""The reference's DDA consistency property, formalized.

test.cpp (built by test.bat) marches a ray 500 steps and PRINTS the
incremental position next to a closed-form reconstruction for eyeball
comparison. Here it is an assertion: after each incremental DDA crossing, the
hit point must equal the closed-form projection origin + t*dir where t is
computed analytically from the crossed boundary coordinate alone.
"""

import numpy as np
import pytest

from raytracing_test_tpu.render import renderer
import jax.numpy as jnp


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_incremental_dda_matches_closed_form(seed):
    rng = np.random.default_rng(seed)
    N, K = 64, 200
    origin = rng.uniform(5, 20, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    d_s, step, delta, abs_delta = renderer._build_ray(jnp.asarray(d))
    cell = jnp.floor(jnp.asarray(origin)).astype(jnp.int32)
    tmax = renderer._init_tmax(jnp.asarray(origin), cell, step, delta, abs_delta)

    d_s = np.asarray(d_s)
    step_n = np.asarray(step)
    abs_delta_n = np.asarray(abs_delta)
    cell_n = np.asarray(cell).copy()
    tmax_n = np.asarray(tmax).copy()

    for _ in range(K):
        ax = np.where(
            (tmax_n[:, 0] < tmax_n[:, 1]) & (tmax_n[:, 0] < tmax_n[:, 2]),
            0,
            np.where(tmax_n[:, 1] < tmax_n[:, 2], 1, 2),
        )
        ar = np.arange(N)
        t = tmax_n[ar, ax]
        cell_n[ar, ax] += step_n[ar, ax].astype(np.int32)
        tmax_n[ar, ax] += abs_delta_n[ar, ax]

        # closed form: the crossing on axis `ax` happens at the boundary
        # coordinate b = cell (for step>0) or cell+1 (for step<0);
        # t_closed = (b - origin[ax]) / dir[ax]
        b = np.where(step_n[ar, ax] > 0, cell_n[ar, ax], cell_n[ar, ax] + 1)
        t_closed = (b - origin[ar, ax]) / d_s[ar, ax]
        np.testing.assert_allclose(t, t_closed, rtol=2e-4, atol=2e-4)

        # and the incremental hit point lies on that boundary
        p = origin + t[:, None] * d_s
        np.testing.assert_allclose(p[ar, ax], b, rtol=2e-4, atol=3e-3)
