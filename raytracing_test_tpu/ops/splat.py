"""MXU box splat — a sort-free scatter-add for window gathers.

XLA's TPU scatter-add serializes rows (~110 ms per 1M f32[4] rows on v5e) and
the sort behind ops/scatter's dedup VJP is O(M log^2 M); both wall the
renderer's backward at window scale (24M rows per 1M-ray frame). This VJP
exploits the WINDOW STRUCTURE instead: rows arrive ray-major as [N rays x S
steps], consecutive rays are image neighbors, and an 8-step sub-window of 32
neighboring rays almost always fits a 16^3 cell box. So:

    tile = 32 rays x 8 steps = 256 rows
    box accumulation: grad_box[x,y,z,c] = sum_r ohx[r,x] ohy[r,y] ohz[r,z] g[r,c]
      -> one (16,256)@(256,256) MXU matmul per channel with the Khatri-Rao
         factor W[r, y*16+z] = ohy*ohz built on the VPU
    merge: one block scatter-add of 16^3x4 boxes at per-tile offsets
    outliers (rows outside their tile's box — depth discontinuities):
      compacted and scattered sparsely; overflow falls back to a full scatter

bf16 one-hots are exact; the row gradients are split hi+lo into two bf16
matmuls so the f32 accumulation is exact to ~1e-6 relative (gradient tests
compare against the plain scatter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GROUP_RAYS = 32  # rays per tile (consecutive in the ray list)
SUB_STEPS = 8  # window steps per tile
BOX = 16  # box edge (cells)
_CHUNK = 1024  # tiles per scan chunk (bounds the materialized W)


def _decode(lin, shape3):
    Sx, Sy, Sz = shape3
    z = lin % Sz
    y = (lin // Sz) % Sy
    x = lin // (Sy * Sz)
    return x, y, z


def _splat_chunk(shape3, x, y, z, g, grid):
    """Accumulate one chunk of tiles. x/y/z/g: [C, R] / [C, R, 4] tile rows;
    grid: [Sx, Sy, Sz, 4] running accumulator. Returns (grid, outlier bool[C, R])."""
    Sx, Sy, Sz = shape3
    C, R = x.shape
    f32 = jnp.float32

    ox = jnp.clip(jnp.min(x, axis=1), 0, max(Sx - BOX, 0))
    oy = jnp.clip(jnp.min(y, axis=1), 0, max(Sy - BOX, 0))
    oz = jnp.clip(jnp.min(z, axis=1), 0, max(Sz - BOX, 0))
    lx = x - ox[:, None]
    ly = y - oy[:, None]
    lz = z - oz[:, None]
    inlier = (
        (lx >= 0) & (lx < BOX) & (ly >= 0) & (ly < BOX) & (lz >= 0) & (lz < BOX)
    )
    gi = jnp.where(inlier[:, :, None], g, 0.0)

    ar = jnp.arange(BOX, dtype=jnp.int32)
    ohy = (ly[:, :, None] == ar[None, None, :]).astype(jnp.bfloat16)
    ohz = (lz[:, :, None] == ar[None, None, :]).astype(jnp.bfloat16)
    W = (ohy[:, :, :, None] * ohz[:, :, None, :]).reshape(C, R, BOX * BOX)
    ohx = (lx[:, :, None] == ar[None, None, :]).astype(jnp.bfloat16)

    g_hi = gi.astype(jnp.bfloat16)
    g_lo = (gi - g_hi.astype(f32)).astype(jnp.bfloat16)

    def contract(gpart):
        # lhs[c?,r,x] = ohx * g_c; box_c = lhs^T @ W  per channel
        outs = []
        for ch in range(4):
            lhs = ohx * gpart[:, :, ch : ch + 1]  # [C, R, BOX] bf16
            outs.append(
                jax.lax.dot_general(
                    lhs, W, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            )  # [C, BOX, BOX*BOX]
        return jnp.stack(outs, axis=-1)  # [C, BOX, BOX^2, 4]

    boxes = contract(g_hi) + contract(g_lo)
    boxes = boxes.reshape(C, BOX, BOX, BOX, 4)

    # merge: block scatter-add of the boxes at their offsets
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    offs = jnp.stack([ox, oy, oz], axis=1)
    grid = jax.lax.scatter_add(
        grid, offs, boxes, dnums,
        indices_are_sorted=False, unique_indices=False,
    )
    return grid, ~inlier


def splat_add(zeros, lin, upd, shape3, S: int, engine: str = "xla"):
    """zeros[V, 4].at[lin].add(upd) for window-structured rows.

    lin/upd: [M] / [M, 4] with M = N*S, ray-major (each ray's S steps
    contiguous). Returns the accumulated [V, 4] table (V = Sx*Sy*Sz).
    ``engine``: "xla" contracts boxes with batched XLA matmuls (materializes
    the Khatri-Rao factor in HBM — measured 6.0 s per 1M x 24 window);
    "pallas" runs the same contraction in VMEM (kernels/splat_kernel.py)."""
    Sx, Sy, Sz = shape3
    M = lin.shape[0]
    N = M // S
    R = GROUP_RAYS * SUB_STEPS
    if min(Sx, Sy, Sz) < BOX or N % GROUP_RAYS or S % SUB_STEPS:
        return zeros.at[lin].add(upd)  # tiny/ragged cases: plain scatter

    x, y, z = _decode(lin, shape3)
    # [N, S] -> tiles of (GROUP_RAYS, SUB_STEPS): group ray blocks x step blocks
    def tile(v):
        v = v.reshape(N // GROUP_RAYS, GROUP_RAYS, S // SUB_STEPS, SUB_STEPS)
        return v.transpose(0, 2, 1, 3).reshape(-1, R)

    def tile4(v):
        v = v.reshape(N // GROUP_RAYS, GROUP_RAYS, S // SUB_STEPS, SUB_STEPS, 4)
        return v.transpose(0, 2, 1, 3, 4).reshape(-1, R, 4)

    xt, yt, zt = tile(x), tile(y), tile(z)
    gt = tile4(upd)
    T = xt.shape[0]
    chunk = min(_CHUNK, T)
    t_pad = (-T) % chunk
    if t_pad:  # pad with zero tiles (they splat empty boxes at the origin)
        zi = jnp.zeros((t_pad, R), xt.dtype)
        xt, yt, zt = (jnp.concatenate([v, zi]) for v in (xt, yt, zt))
        gt = jnp.concatenate([gt, jnp.zeros((t_pad, R, 4), gt.dtype)])
    n_chunks = (T + t_pad) // chunk

    grid = zeros.reshape(Sx, Sy, Sz, 4)

    chunk_fn = _splat_chunk if engine == "xla" else _splat_chunk_pallas

    def chunk_body(carry, idx):
        grid, out_cnt = carry
        sl = lambda v: jax.lax.dynamic_slice_in_dim(v, idx * chunk, chunk, axis=0)
        g2, outlier = chunk_fn(shape3, sl(xt), sl(yt), sl(zt), sl(gt), grid)
        return (g2, out_cnt + outlier.sum()), outlier

    (grid, n_out), outliers = jax.lax.scan(
        chunk_body, (grid, jnp.zeros((), jnp.int32)), jnp.arange(n_chunks)
    )
    flat = grid.reshape(-1, 4)

    # outliers: compact to a bounded slot count and scatter sparsely
    out_mask = outliers.reshape(n_chunks * chunk, R)[:T]
    # un-tile back to row order [M]
    out_mask = (
        out_mask.reshape(N // GROUP_RAYS, S // SUB_STEPS, GROUP_RAYS, SUB_STEPS)
        .transpose(0, 2, 1, 3)
        .reshape(M)
    )
    K = max(1024, M // 16)

    def sparse(_):
        (idx,) = jnp.nonzero(out_mask, size=K, fill_value=0)
        valid = jnp.arange(K) < n_out
        keys = jnp.where(valid, jnp.take(lin, idx), zeros.shape[0])
        vals = jnp.where(valid[:, None], jnp.take(upd, idx, axis=0), 0.0)
        return flat.at[keys].add(vals, mode="drop")

    def dense(_):
        masked = jnp.where(out_mask[:, None], upd, 0.0)
        return flat.at[lin].add(masked)

    return jax.lax.cond(n_out <= K, sparse, dense, None)


def _splat_chunk_pallas(shape3, x, y, z, g, grid):
    """_splat_chunk with the box contraction on the Pallas kernel (the
    inlier-mask / offset / merge logic is identical)."""
    from ..kernels.splat_kernel import splat_boxes_pallas

    Sx, Sy, Sz = shape3
    ox = jnp.clip(jnp.min(x, axis=1), 0, max(Sx - BOX, 0))
    oy = jnp.clip(jnp.min(y, axis=1), 0, max(Sy - BOX, 0))
    oz = jnp.clip(jnp.min(z, axis=1), 0, max(Sz - BOX, 0))
    lx = x - ox[:, None]
    ly = y - oy[:, None]
    lz = z - oz[:, None]
    inlier = (
        (lx >= 0) & (lx < BOX) & (ly >= 0) & (ly < BOX) & (lz >= 0) & (lz < BOX)
    )
    gi = jnp.where(inlier[:, :, None], g, 0.0)
    zi = jnp.where(inlier, lx, 0), jnp.where(inlier, ly, 0), jnp.where(inlier, lz, 0)
    boxes = splat_boxes_pallas(zi[0], zi[1], zi[2], gi,
                               interpret=not _pallas_ok())

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3, 4),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    offs = jnp.stack([ox, oy, oz], axis=1)
    grid = jax.lax.scatter_add(
        grid, offs, boxes, dnums,
        indices_are_sorted=False, unique_indices=False,
    )
    return grid, ~inlier


def _pallas_ok() -> bool:
    from ..kernels.support import pallas_supported

    return pallas_supported()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def take_rows_splat(table, lin, shape3, S: int, engine: str = "xla"):
    """jnp.take(table, lin, axis=0) whose VJP is the MXU box splat.

    table: f32[V, 4] (V = prod(shape3)); lin: i32[M] IN-BOUNDS row-major cell
    ids, ray-major window order (M = N*S). No gradient flows to lin."""
    return jnp.take(table, lin, axis=0)


def _trs_fwd(table, lin, shape3, S, engine):
    return jnp.take(table, lin, axis=0), lin


def _trs_bwd(shape3, S, engine, lin, g):
    zeros = jnp.zeros((shape3[0] * shape3[1] * shape3[2], 4), g.dtype)
    return splat_add(zeros, lin, g, shape3, S, engine=engine), None


take_rows_splat.defvjp(_trs_fwd, _trs_bwd)
