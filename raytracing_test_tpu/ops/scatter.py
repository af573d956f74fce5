"""Deduplicated scatter-add — the gather whose BACKWARD beats XLA's scatter.

XLA's TPU scatter-add is index-serialized: ~110 ms per 1M f32[4] rows on v5e,
insensitive to sorted/unique hints and linear in row count (measured; see
CLAUDE.md). The differentiable renderer's backward is a scatter per scan step,
so this is the headline wall. But its updates are highly duplicated: at 1024²
over a 256-world, ~8-16 rays cross each surface voxel per step. Sorting is
cheap on TPU (~24 ms for 1M keys + 4 payloads), so the VJP here:

    sort updates by cell id              (vector unit, cheap)
    prefix-sum payloads                  (vector unit, cheap)
    run ends -> per-cell totals          (prefix difference)
    compact run ends to K = N/8 slots    (bounded nonzero)
    scatter K unique rows                (~8x fewer serialized rows)

with a `lax.cond` fallback to the plain full-width scatter when a batch
really has more than K unique cells — always correct, fast in the common
case. FP note: per-cell totals come from differences of an f32 cumsum over
the WHOLE sorted batch, so each cell's absolute gradient error scales with
the global prefix magnitude (not per-cell magnitudes): for large or
mixed-sign batches the noise floor grows with batch size (catastrophic
cancellation in the worst case). Gradient tests bound it at rtol ~1e-4 for
the renderer's workloads; treat that as the contract, not "~ulp".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dedup_scatter_add(zeros, idx, upd, compact_div: int):
    """zeros[V, C].at[idx].add(upd) with duplicate collapsing. idx must be
    in-bounds."""
    N = idx.shape[0]
    V = zeros.shape[0]
    K = max(256, N // compact_div)
    if K >= N:
        return zeros.at[idx].add(upd)

    ops = [idx] + [upd[:, c] for c in range(upd.shape[1])]
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    ls = sorted_ops[0]
    us = jnp.stack(sorted_ops[1:], axis=1)
    is_end = jnp.concatenate([ls[1:] != ls[:-1], jnp.ones(1, bool)])
    nuniq = is_end.sum()

    def compact(_):
        pref = jnp.cumsum(us, axis=0)
        end_pos = jnp.nonzero(is_end, size=K, fill_value=N - 1)[0]
        # run j spans (end_pos[j-1], end_pos[j]]; its total is the prefix diff
        prev_end = jnp.concatenate([jnp.full((1,), -1, end_pos.dtype), end_pos[:-1]])
        ends = jnp.take(pref, end_pos, axis=0)
        starts = jnp.where(
            (prev_end >= 0)[:, None],
            jnp.take(pref, jnp.maximum(prev_end, 0), axis=0),
            jnp.zeros((), pref.dtype),
        )
        vals = ends - starts
        keys = jnp.take(ls, end_pos)
        valid = jnp.arange(K) < nuniq
        keys = jnp.where(valid, keys, V)  # out-of-bounds rows drop
        vals = jnp.where(valid[:, None], vals, 0.0)
        return zeros.at[keys].add(vals, mode="drop")

    def full(_):
        return zeros.at[ls].add(us, indices_are_sorted=True)

    return jax.lax.cond(nuniq <= K, compact, full, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def take_rows(table, idx, compact_div: int = 8):
    """`jnp.take(table, idx, axis=0)` whose VJP is the dedup scatter.

    table: f32[V, C]; idx: i32[N] IN-BOUNDS (callers clamp first). No gradient
    flows to idx (it is integer). ``compact_div``: unique-row budget N/div for
    the compact branch.
    """
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx, compact_div):
    return jnp.take(table, idx, axis=0), (idx, table.shape)


def _take_rows_bwd(compact_div, res, g):
    idx, shape = res
    zeros = jnp.zeros(shape, g.dtype)
    return _dedup_scatter_add(zeros, idx, g, compact_div), None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)
