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


def make_aux(xy: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 2) normalized coords -> (B, N, 8) kernel aux lanes."""
    return jnp.pad(xy.astype(jnp.float32), ((0, 0), (0, 0), (0, 6)))


def chunk_cells(cells: jnp.ndarray) -> jnp.ndarray:
    """(B, Npad) finest Morton ids -> (B, Npad/ACHUNK, ACHUNK) chunk rows."""
    b, npad = cells.shape
    return cells.reshape(b, npad // ACHUNK, ACHUNK)


# --- bilinear tile gather (grid_sample fast path) ---------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def tile_gather(plane, aux, mask, tile_offsets, reso):
    """Bilinear-sample ``plane`` at aligned point coords; masked rows are 0.

    Differentiable in ``plane`` (coords/mask are data). Forward = Pallas
    kernel; backward = transpose of the bilinear weights via the XLA
    grid_sample implementation's vjp.
    """
    out = pallas_tile_gather(plane, aux, tile_offsets, reso)
    return jnp.where(mask[..., None], out, 0).astype(plane.dtype)


def _tile_gather_fwd(plane, aux, mask, tile_offsets, reso):
    return tile_gather(plane, aux, mask, tile_offsets, reso), (plane, aux, mask)


def _tile_gather_bwd(reso, res, g):
    from tomosar2height_tpu.ops.sampling import grid_sample_2d

    plane, aux, mask = res
    g = jnp.where(mask[..., None], g, 0)
    _, vjp = jax.vjp(lambda p: grid_sample_2d(p, aux[..., :2].astype(p.dtype)), plane)
    (dplane,) = vjp(g.astype(plane.dtype))
    return dplane, None, None, None


tile_gather.defvjp(_tile_gather_fwd, _tile_gather_bwd)


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
    return out, (cells_chunked, values.shape, values.dtype)


def _tile_scatter_bwd(reso, finest, res, g):
    cells_chunked, vshape, vdtype = res
    b, npad, f = vshape
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
