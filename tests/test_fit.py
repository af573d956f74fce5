"""End-to-end inverse rendering through the PUBLIC entry points.

VERDICT r04 item 5's acceptance: a fit of a small world driven through the
fused Pallas engine pair from ``app.fit.fit_world`` (the function the CLI
``fit`` subcommand calls), and the CLI accepting ``fit --engine fused``.
The engine internals are covered by tests/test_sharding.py
(test_fused_train_step_dp_matches_single_device); this file covers the
user-facing orchestration: target generation, guide re-thresholding, the
lazily-built fused step, escape-overflow aux plumbing, and the CLI flag.
"""

import numpy as np
import jax

from raytracing_test_tpu.config import FitConfig, WorldConfig
from raytracing_test_tpu.core import flatten
from raytracing_test_tpu.worldgen import terrain


def _small_world():
    wcfg = WorldConfig(width=24, length=48, grid_shape=(32, 32, 64))
    grid, pal = terrain.gen_world_grid(wcfg)
    return flatten.scene_from_grid(grid, pal), grid


def test_fit_world_fused_engine_public_entry():
    """fit_world(engine='fused') runs the Pallas engine pair (fused march
    seed + fused window accumulate) end to end: finite losses, updated
    parameters, and the guide/tables built lazily at the first step."""
    from raytracing_test_tpu.app import fit as fitmod
    from raytracing_test_tpu.parallel import sharding as shardlib

    scene, grid = _small_world()
    fcfg = FitConfig(
        engine="fused",
        views=2,
        steps=2,
        resolution=16,
        guided_steps=8,
        # one guide build at step 0, no mid-run re-threshold in 2 steps
        rethreshold_every=100,
    )
    params, losses = fitmod.fit_world(
        scene, grid.shape, fcfg, batch=64, log_every=1
    )
    assert len(losses) == fcfg.steps
    assert np.isfinite(losses).all(), losses
    init = shardlib.init_params(grid.shape)
    # the optimizer actually moved the field
    assert not np.allclose(
        np.asarray(params.density_raw), np.asarray(init.density_raw)
    )


def test_cli_accepts_fit_engine_fused(monkeypatch):
    """`fit --engine fused --shading` parses and routes engine/shading into
    cmd_fit's args (parser-level: choices=['', 'fused'] accepts it)."""
    from raytracing_test_tpu.app import cli

    seen = {}
    monkeypatch.setattr(cli, "cmd_fit", lambda args: seen.update(vars(args)))
    cli.main(["fit", "--engine", "fused", "--shading", "--steps", "1"])
    assert seen["engine"] == "fused"
    assert seen["shading"] is True
    assert seen["steps"] == 1
