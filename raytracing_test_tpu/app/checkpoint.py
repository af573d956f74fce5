"""Checkpoint / resume.

The reference has none — worlds are regenerated from noise seeds every run and
edits are lost on exit (SURVEY §5.4). Here both the world state (dense grid +
palette, i.e. seeds AND edits) and inverse-rendering fit state (params +
optimizer state + step) persist. Plain npz via numpy for the world; orbax (when
available) or npz for fit pytrees.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..core.tree import Palette


def save_world(path: str, grid: np.ndarray, palette: Palette, meta: Optional[dict] = None) -> None:
    np.savez_compressed(
        path,
        grid=grid,
        pal_flags=palette.flags,
        pal_color=palette.color,
        pal_meta=palette.metadata,
        **({f"meta_{k}": v for k, v in (meta or {}).items()}),
    )


def load_world(path: str) -> Tuple[np.ndarray, Palette]:
    data = np.load(path)
    pal = Palette(
        flags=data["pal_flags"],
        color=data["pal_color"],
        metadata=data["pal_meta"],
    )
    # rebuild the interning index
    for i in range(1, len(pal.flags)):
        pal._index[(int(pal.flags[i]), int(pal.color[i]), float(pal.metadata[i]))] = i
    return data["grid"], pal


def save_fit(path: str, params, opt_state, step: int) -> None:
    """Save a fit pytree (FitParams + optax state) to npz."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten((params, opt_state, step))
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    )


def load_fit(path: str, like_params, like_opt_state):
    """Load a fit pytree saved by save_fit; shapes must match ``like_*``."""
    import jax
    import jax.numpy as jnp

    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten((like_params, like_opt_state, 0))
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    params, opt_state, step = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, int(step)
