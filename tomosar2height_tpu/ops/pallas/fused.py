"""Differentiable wrappers over the chunk-aligned Morton tile kernels.

Forward passes run the Pallas TPU kernels (gather_kernel.py /
scatter_kernel.py); backward passes are the XLA-composed reference-parity
expressions (ops/sampling.py semantics for the sample, segment arithmetic for
the scatter) — exact transposes of the kernels' math, so training through the
fast path stays correct while only inference/forward pays for kernel tuning.

Layout contract: host_morton_bucket_aligned (ops/sorted_scatter.py) — points
tile-grouped and chunk-aligned, padding rows masked with PAD_CELL_SENTINEL
cell ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tomosar2height_tpu.ops.pallas.gather_kernel import pallas_tile_gather
from tomosar2height_tpu.ops.pallas.scatter_kernel import (
    ACHUNK,
    pallas_aligned_scatter_mean_plane,
)


def make_aux(xy: jnp.ndarray):
    """(B, Npad, 2) normalized coords -> (aux_x, aux_y) chunk rows
    (B, Npad/CHUNK, CHUNK) f32 — the gather kernel's lane-packed layout."""
    from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK

    b, npad, _ = xy.shape
    ax = xy[..., 0].astype(jnp.float32).reshape(b, npad // CHUNK, CHUNK)
    ay = xy[..., 1].astype(jnp.float32).reshape(b, npad // CHUNK, CHUNK)
    return ax, ay


def chunk_cells(cells: jnp.ndarray) -> jnp.ndarray:
    """(B, Npad) finest Morton ids -> (B, Npad/ACHUNK, ACHUNK) chunk rows."""
    b, npad = cells.shape
    return cells.reshape(b, npad // ACHUNK, ACHUNK)


# --- bilinear tile gather (grid_sample fast path) ---------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def tile_gather(plane, aux_x, aux_y, mask, tile_offsets, reso):
    """Bilinear-sample ``plane`` at aligned point coords; masked rows are 0.

    Differentiable in ``plane`` (coords/mask are data). Forward = Pallas
    kernel; backward = transpose of the bilinear weights via the XLA
    grid_sample implementation's vjp.
    """
    out = pallas_tile_gather(plane, aux_x, aux_y, tile_offsets, reso)
    return jnp.where(mask[..., None], out, 0).astype(plane.dtype)


def _tile_gather_fwd(plane, aux_x, aux_y, mask, tile_offsets, reso):
    out = tile_gather(plane, aux_x, aux_y, mask, tile_offsets, reso)
    return out, (plane, aux_x, aux_y, mask)


def _tile_gather_bwd(reso, res, g):
    from tomosar2height_tpu.ops.sampling import grid_sample_2d

    plane, aux_x, aux_y, mask = res
    b = plane.shape[0]
    xy = jnp.stack([aux_x.reshape(b, -1), aux_y.reshape(b, -1)], axis=-1)
    g = jnp.where(mask[..., None], g, 0)
    _, vjp = jax.vjp(lambda p: grid_sample_2d(p, xy.astype(p.dtype)), plane)
    (dplane,) = vjp(g.astype(plane.dtype))
    return dplane, None, None, None, None


tile_gather.defvjp(_tile_gather_fwd, _tile_gather_bwd)


# --- fused local pooling (pool_local fast path) -----------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def tile_pool(values, cells_chunked, tile_offsets, mask, reso, kind):
    """Per-cell ``kind``-reduce + per-point gather-back (pool_local,
    reference pointnet.py:92-99) on the aligned layout; masked rows are 0.

    Forward = the fused Pallas kernel; backward = the vjp of the XLA
    segment-op expression (for 'max' the subgradient routes to XLA's argmax
    choice, which may differ from the kernel's on exact ties).
    """
    from tomosar2height_tpu.ops.pallas.pool_kernel import pallas_tile_pool

    out = pallas_tile_pool(values, cells_chunked, tile_offsets, kind)
    return jnp.where(mask[..., None], out, 0).astype(values.dtype)


def _pool_ref(values, cells_chunked, mask, reso, kind):
    from tomosar2height_tpu.ops.scatter import segment_max, segment_mean
    from tomosar2height_tpu.ops.sorted_scatter import gather_cells_sorted

    b, nc, ac = cells_chunked.shape
    cells = cells_chunked.reshape(b, nc * ac)
    ncell = reso * reso
    if kind == "max":
        pooled = segment_max(values, cells, ncell, mask)
    else:
        pooled = segment_mean(values, cells, ncell, mask)
    out = gather_cells_sorted(pooled, cells)
    return jnp.where(mask[..., None], out, 0)


def _tile_pool_fwd(values, cells_chunked, tile_offsets, mask, reso, kind):
    out = tile_pool(values, cells_chunked, tile_offsets, mask, reso, kind)
    return out, (values, cells_chunked, mask)


def _tile_pool_bwd(reso, kind, res, g):
    values, cells_chunked, mask = res
    _, vjp = jax.vjp(lambda v: _pool_ref(v, cells_chunked, mask, reso, kind),
                     values)
    (dv,) = vjp(g.astype(values.dtype))
    return dv, None, None, None


tile_pool.defvjp(_tile_pool_fwd, _tile_pool_bwd)


# --- scatter-mean to plane (torch_scatter fast path) ------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tile_scatter_mean(values, cells_chunked, tile_offsets, reso, finest):
    """Aligned Morton scatter-mean -> (B, reso, reso, F) NHWC plane.

    Differentiable in ``values``; padding rows (sentinel cells) contribute
    nothing forward and receive zero gradient.
    """
    return pallas_aligned_scatter_mean_plane(
        values, cells_chunked, tile_offsets, reso, finest
    )


def _tile_scatter_fwd(values, cells_chunked, tile_offsets, reso, finest):
    out = tile_scatter_mean(values, cells_chunked, tile_offsets, reso, finest)
    return out, cells_chunked


def _tile_scatter_bwd(reso, finest, cells_chunked, g):
    b, nc, ac = cells_chunked.shape
    npad = nc * ac
    vdtype = g.dtype  # values and plane share the compute dtype
    ncell = reso * reso
    shift = 2 * (int(finest).bit_length() - int(reso).bit_length())
    cells = cells_chunked.reshape(b, npad)
    cell_r = (cells >> shift).astype(jnp.int32)
    valid = cell_r < ncell
    idx = jnp.where(valid, cell_r, 0)
    # d mean/d v_i = g[cell_i] / count[cell_i]
    offs = (jnp.arange(b, dtype=jnp.int32) * ncell)[:, None]
    seg = jnp.where(valid, idx + offs, b * ncell).reshape(-1)
    ones = jnp.ones((b * npad, 1), jnp.float32)
    counts = jax.ops.segment_sum(ones, seg, num_segments=b * ncell + 1)
    counts = counts[: b * ncell].reshape(b, ncell, 1)  # Morton-indexed
    # plane grad is row-major (B, R, R, F); reorder to the Morton cell order
    # the kernel scatters with, then divide by that cell's point count
    from tomosar2height_tpu.ops.sorted_scatter import plane_to_morton

    g_m = plane_to_morton(g)  # (B, ncell, F) Morton-ordered
    per_cell = g_m / jnp.maximum(counts.astype(g_m.dtype), 1.0)
    dv = jnp.take_along_axis(per_cell, idx[..., None], axis=1)
    dv = jnp.where(valid[..., None], dv, 0).astype(vdtype)
    return dv, None, None


tile_scatter_mean.defvjp(_tile_scatter_fwd, _tile_scatter_bwd)
