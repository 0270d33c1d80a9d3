"""Morton-sorted segmented reductions: scatter without scatters.

XLA's TPU scatter serializes duplicate indices, making the reference-style
point->grid transfer (torch_scatter; pointnet.py:92-111, alto.py:76-95) the
profiled hot spot (~6 ms per 16k-point scatter at 256^2). This module replaces
it with a sort-once design:

1. The HOST sorts each patch's points by their Morton (z-order) cell id at the
   finest plane resolution and ships per-cell segment offsets
   (:func:`host_morton_bucket`).
2. On device, a segment reduction over sorted points is a cumulative sum, two
   monotonic gathers, and a difference — pure vector ops, no scatter
   (:func:`sorted_segment_mean`). Max-reductions use a segmented
   ``associative_scan`` (:func:`sorted_segment_max`).
3. Morton order makes EVERY coarser resolution's cells contiguous too: parent
   cell i spans children 4i..4i+3, so level-d offsets are just
   ``offsets[::4**d]`` (:func:`coarsen_offsets`) — one host sort serves the
   whole ALTO pyramid.
4. A Morton-ordered cell vector becomes a row-major NHWC plane with a static
   reshape/transpose chain (:func:`morton_to_plane`) — no gather.

Empty cells reduce to 0, matching torch_scatter's zero-init semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --- host side -------------------------------------------------------------------


def morton_interleave_np(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Interleave bits of (x, y) -> z-order code (y high bits), vectorized numpy."""
    code = np.zeros_like(x, dtype=np.int64)
    for b in range(bits):
        code |= ((x >> b) & 1) << (2 * b)
        code |= ((y >> b) & 1) << (2 * b + 1)
    return code


def host_morton_bucket(points: np.ndarray, mask: np.ndarray, reso: int):
    """Sort padded points by Morton cell id; padded points sort to the end.

    Args:
        points: (N, 3) float32 normalized to [0, 1].
        mask: (N,) bool validity.
        reso: finest plane resolution (power of two).

    Returns:
        order (N,) int64 permutation, cell (N,) int32 Morton ids (sorted order;
        padded entries get 4**bits i.e. one-past-last), offsets (reso*reso + 1,)
        int32 segment starts into the sorted arrays.
    """
    bits = int(reso).bit_length() - 1
    assert (1 << bits) == reso, "plane resolution must be a power of two"
    xi = np.clip((points[:, 0] * reso).astype(np.int64), 0, reso - 1)
    yi = np.clip((points[:, 1] * reso).astype(np.int64), 0, reso - 1)
    code = morton_interleave_np(xi, yi, bits)
    ncell = reso * reso
    code = np.where(mask, code, ncell)  # padding sorts last
    order = np.argsort(code, kind="stable")
    code_sorted = code[order]
    offsets = np.searchsorted(code_sorted, np.arange(ncell + 1)).astype(np.int32)
    return order, code_sorted.astype(np.int32), offsets


POINT_WIRE_SCALE = 65535.0
"""u16 wire-point quantization scale: coords in [0, 1] ship as uint16
(6 bytes/point instead of 12), ~7.8 mm xy / ~3 mm z error at flagship patch
extents — far below the model's accuracy floor. The DEQUANTIZATION is one
f32 multiply by ``1/65535`` (not a division), identical on host and device,
so Morton cell ids recomputed on device stay bit-exact with the host
layout."""

_DEQ16 = np.float32(1.0 / POINT_WIRE_SCALE)


def quantize_points_u16(points: np.ndarray) -> np.ndarray:
    """f32 [0, 1] coords -> uint16 wire format."""
    return np.clip(np.round(points * POINT_WIRE_SCALE), 0.0,
                   POINT_WIRE_SCALE).astype(np.uint16)


def dequantize_points_np(q: np.ndarray) -> np.ndarray:
    """uint16 wire points -> f32 (bit-exact with :func:`dequantize_points`)."""
    return q.astype(np.float32) * _DEQ16


def dequantize_points(q: jnp.ndarray) -> jnp.ndarray:
    """Device-side u16 -> f32 (same IEEE multiply as the host version)."""
    return q.astype(jnp.float32) * jnp.float32(1.0 / POINT_WIRE_SCALE)


PAD_CELL_SENTINEL = np.int32(1 << 30)
"""Cell id assigned to padding rows in the aligned layout: large enough that
``(sentinel >> 2*level) - tile_base`` never lands in a tile's [0, tile_cells)
local range at any pyramid level (level <= 6, tile_base < 2**16)."""

ALIGNED_TILE_CELLS = 1024
"""Default cells per Morton tile of the chunk-aligned layout: matches the
chunk-grid kernels' 32x32 iteration tile (ops/pallas/level_kernel.py
TILE_CELLS). The round-2 per-op tile kernels (scatter/gather/pool_kernel.py,
``sorted_impl='fused'``) keep 16x16 tiles — their layouts pass
``tile_cells=256`` explicitly. Bigger tiles average more points against the
128-row chunk quantum, cutting the layout's row inflation (2.0x -> ~1.25x at
the flagship 16k-point/256^2 shapes) and with it every chunk-grid kernel's
grid-step count."""


def morton_cells_device(points: jnp.ndarray, mask: jnp.ndarray, reso: int,
                        pad_value: int) -> jnp.ndarray:
    """Recompute the sorted layouts' per-row Morton cell ids ON DEVICE.

    Bit-exact with the host layouts (same IEEE f32 multiply, truncation and
    clip as :func:`host_morton_bucket`), so the training/serving wire can
    skip shipping the (B, Npad) int32 ``cells`` array entirely — points and
    mask already ride the wire and determine it. ``pad_value`` is
    PAD_CELL_SENTINEL for the chunk-aligned layout, ``reso*reso`` for the
    plain sorted layout.
    """
    bits = int(reso).bit_length() - 1
    assert (1 << bits) == reso, "plane resolution must be a power of two"
    xy = points.astype(jnp.float32)  # host quantized on f32 coords
    xi = jnp.clip((xy[..., 0] * reso).astype(jnp.int32), 0, reso - 1)
    yi = jnp.clip((xy[..., 1] * reso).astype(jnp.int32), 0, reso - 1)
    code = jnp.zeros_like(xi)
    for b in range(bits):
        code = code | (((xi >> b) & 1) << (2 * b))
        code = code | (((yi >> b) & 1) << (2 * b + 1))
    return jnp.where(mask, code, jnp.int32(pad_value))


def aligned_bucket_size(bucket: int, reso: int, chunk: int = 128,
                        tile_cells: int = ALIGNED_TILE_CELLS) -> int:
    """Static point-array length of the chunk-aligned Morton layout.

    Every tile's padded range adds < chunk rows, so bucket + ntiles*chunk always
    fits; the constant size keeps XLA programs cacheable across patches.
    """
    ntiles = (reso * reso) // tile_cells
    return ((bucket + chunk - 1) // chunk) * chunk + ntiles * chunk


def host_morton_bucket_aligned(
    points: np.ndarray,
    mask: np.ndarray,
    reso: int,
    chunk: int = 128,
    tile_cells: int = ALIGNED_TILE_CELLS,
):
    """Morton-sort points and pad every tile's point run to a CHUNK multiple.

    The chunk-aligned layout is the input contract of the fused Pallas tile
    kernels (ops/pallas/gather_kernel.py, scatter_kernel.py): each Morton tile
    of ``tile_cells`` cells owns a contiguous, chunk-aligned row range, so tile
    grid steps DMA whole chunks with no inter-tile row sharing (writes never
    collide) and one-hot rows never need masking.

    Args:
        points: (N, 3) float32 normalized to [0, 1].
        mask: (N,) bool validity.
        reso: finest plane resolution (power of two).
        chunk: row-alignment quantum (the kernels' inner matmul chunk).
        tile_cells: cells per Morton tile (a square spatial block; 1024 for
            the chunk-grid kernels' 32x32 tiles, 256 for the round-2 16x16
            per-op kernels).

    Returns:
        dict with
          points  (Npad, 3) f32 — tile-grouped, chunk-aligned (pad rows 0.5),
          mask    (Npad,) bool — False on all padding rows,
          cells   (Npad,) int32 — finest Morton ids; PAD_CELL_SENTINEL on pads,
          tile_offsets (ntiles + 1,) int32 — chunk-multiple row offsets,
        where Npad == aligned_bucket_size(len(points), reso, chunk).
    """
    n = points.shape[0]
    ntiles = (reso * reso) // tile_cells
    npad = aligned_bucket_size(n, reso, chunk, tile_cells)
    if (points.shape[1] == 3 and reso & (reso - 1) == 0
            and (reso * reso) % tile_cells == 0):
        # C++ fast path (bit-identical layout, ~20x; loader hot path)
        from tomosar2height_tpu import native

        out = native.morton_align(points, mask, reso, chunk, tile_cells,
                                  npad, int(PAD_CELL_SENTINEL))
        if out is not None:
            return out
    order, code_sorted, offsets = host_morton_bucket(points, mask, reso)

    tile_off = offsets[::tile_cells].astype(np.int64)  # (ntiles + 1,)
    counts = np.diff(tile_off)
    padded = ((counts + chunk - 1) // chunk) * chunk
    astarts = np.zeros(ntiles + 1, dtype=np.int64)
    np.cumsum(padded, out=astarts[1:])
    assert astarts[-1] <= npad

    # dst[i] = aligned position of sorted point i (vectorized per-tile shift)
    src_valid = int(tile_off[-1])  # real points (padding sorted past last cell)
    tile_of_sorted = np.searchsorted(tile_off, np.arange(src_valid), side="right") - 1
    dst = np.arange(src_valid) + (astarts[:-1] - tile_off[:-1])[tile_of_sorted]

    out_pts = np.full((npad, 3), 0.5, dtype=np.float32)
    out_mask = np.zeros((npad,), dtype=bool)
    out_cells = np.full((npad,), PAD_CELL_SENTINEL, dtype=np.int32)
    out_pts[dst] = points[order[:src_valid]]
    out_mask[dst] = True
    out_cells[dst] = code_sorted[:src_valid]
    return {
        "points": out_pts,
        "mask": out_mask,
        "cells": out_cells,
        "tile_offsets": astarts.astype(np.int32),
    }


def trim_aligned_batch(points, mask, cells, tile_offsets, quantum: int = 4096):
    """Trim a batch of aligned layouts to the smallest ``quantum``-multiple
    row count covering every entry's used rows (``tile_offsets[:, -1]``).

    aligned_bucket_size is a worst-case STATIC bound (every tile padding to a
    full chunk); real patches use far fewer rows, and the chunk-grid kernels
    pay per-chunk block traffic even for skipped tail chunks. Rounding to a
    quantum keeps the XLA program count small (a handful of variants instead
    of one per patch).
    """
    used = int(np.max(tile_offsets[:, -1])) if len(tile_offsets) else 0
    npad = max(((used + quantum - 1) // quantum) * quantum, quantum)
    npad = min(npad, points.shape[1])
    return points[:, :npad], mask[:, :npad], cells[:, :npad], tile_offsets


def coarsen_tile_offsets(tile_offsets: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Tile offsets for a 2^levels-coarser plane: stride-4^levels subsample
    (a coarse tile is the union of 4^levels consecutive fine Morton tiles, so
    chunk alignment is preserved)."""
    return tile_offsets[..., :: 4 ** levels]


def coarsen_offsets(offsets: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Offsets for a 2^levels-coarser resolution: stride-4^levels subsample
    (Morton parents cover contiguous child ranges)."""
    stride = 4 ** levels
    return offsets[..., ::stride]


def morton_perm(reso: int) -> np.ndarray:
    """Static permutation p with plane.reshape(-1)[i] = morton_vec[p[i]]
    (row-major linear index -> Morton code)."""
    bits = int(reso).bit_length() - 1
    yy, xx = np.meshgrid(np.arange(reso), np.arange(reso), indexing="ij")
    return morton_interleave_np(xx.ravel(), yy.ravel(), bits)


def _plane_axes(bits: int) -> Tuple[tuple, tuple]:
    # morton vector dims after reshape to [2]*2b (+C): (y_{b-1}, x_{b-1}, ... y_0, x_0)
    # target row-major: (y_{b-1..0}, x_{b-1..0})
    ys = tuple(2 * i for i in range(bits))        # positions of y bits (msb first)
    xs = tuple(2 * i + 1 for i in range(bits))    # positions of x bits
    return ys, xs


def morton_to_plane(vec: jnp.ndarray, reso: int) -> jnp.ndarray:
    """(B, reso*reso, C) Morton-ordered -> (B, reso, reso, C) row-major,
    via reshape/transpose only (zero-copy for XLA layout assignment)."""
    b, n, c = vec.shape
    bits = int(reso).bit_length() - 1
    x = vec.reshape((b,) + (2,) * (2 * bits) + (c,))
    ys, xs = _plane_axes(bits)
    perm = (0,) + tuple(1 + a for a in ys) + tuple(1 + a for a in xs) + (2 * bits + 1,)
    return x.transpose(perm).reshape(b, reso, reso, c)


def plane_to_morton(plane: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`morton_to_plane`: (B, R, R, C) -> (B, R*R, C) Morton order."""
    b, r, _, c = plane.shape
    bits = int(r).bit_length() - 1
    ys, xs = _plane_axes(bits)
    x = plane.reshape((b,) + (2,) * (2 * bits) + (c,))
    # current dims (after reshape): (y_{b-1..0}, x_{b-1..0}); want interleaved
    inv = np.empty(2 * bits, dtype=int)
    for i, a in enumerate(ys):
        inv[a] = i
    for i, a in enumerate(xs):
        inv[a] = bits + i
    perm = (0,) + tuple(1 + v for v in inv) + (2 * bits + 1,)
    return x.transpose(perm).reshape(b, r * r, c)


# --- device side ----------------------------------------------------------------


def sorted_segment_sum_counts(values: jnp.ndarray, offsets: jnp.ndarray):
    """Per-segment (sum, count) for cell-sorted values.

    Args:
        values: (B, N, C) sorted by cell; padded rows must be zero or be
            excluded by offsets (padding sorts past the last cell).
        offsets: (B, S+1) int32 segment starts.

    Returns:
        sums (B, S, C), counts (B, S, 1).
    """
    csum = jnp.cumsum(values, axis=1, dtype=jnp.promote_types(values.dtype, jnp.float32))
    zero = jnp.zeros_like(csum[:, :1])
    csum = jnp.concatenate([zero, csum], axis=1)  # (B, N+1, C)
    starts = offsets[:, :-1].astype(jnp.int32)
    ends = offsets[:, 1:].astype(jnp.int32)
    take = lambda idx: jnp.take_along_axis(csum, idx[..., None], axis=1)
    sums = (take(ends) - take(starts)).astype(values.dtype)
    counts = (ends - starts)[..., None].astype(values.dtype)
    return sums, counts


def sorted_segment_mean(values: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Masked per-cell mean over sorted points; empty cells are 0."""
    sums, counts = sorted_segment_sum_counts(values, offsets)
    return sums / jnp.maximum(counts, 1.0)


def scatter_mean_morton(
    values: jnp.ndarray,
    offsets: jnp.ndarray,
    cells: jnp.ndarray,
    reso: int,
    impl: str = "cumsum",
) -> jnp.ndarray:
    """Morton-ordered per-cell mean with a selectable backend.

    impl='pallas' routes through the tiled one-hot-matmul TPU kernel
    (ops/pallas/scatter_kernel.py) when the plane has >= one full Morton tile;
    'cumsum' is the pure-XLA fallback. Returns (B, reso*reso, C).
    """
    if impl == "pallas" and (reso * reso) % 256 == 0:
        from tomosar2height_tpu.ops.pallas import pallas_scatter_mean

        return pallas_scatter_mean(values, cells, offsets, reso)
    return sorted_segment_mean(values, offsets)


def scatter_mean_plane_morton(
    values: jnp.ndarray,
    offsets: jnp.ndarray,
    cells: jnp.ndarray,
    reso: int,
    impl: str = "cumsum",
) -> jnp.ndarray:
    """Morton-sorted points -> row-major NHWC plane (B, reso, reso, C).

    impl='pallas' uses the fused kernel that emits plane blocks directly
    (no Morton transpose chain); 'cumsum' goes through
    :func:`sorted_segment_mean` + :func:`morton_to_plane`.
    """
    if impl == "pallas" and (reso * reso) % 256 == 0:
        from tomosar2height_tpu.ops.pallas import pallas_scatter_mean_plane

        return pallas_scatter_mean_plane(values, cells, offsets, reso)
    return morton_to_plane(sorted_segment_mean(values, offsets), reso)


def _segmented_max_op(a, b):
    """Associative segmented-max combine on (value, start_flag) pairs."""
    va, fa = a
    vb, fb = b
    return jnp.where(fb, vb, jnp.maximum(va, vb)), fa | fb


def sorted_segment_max(values: jnp.ndarray, offsets: jnp.ndarray,
                       starts_mask: jnp.ndarray, empty_value: float = 0.0) -> jnp.ndarray:
    """Per-cell max over sorted points via a segmented associative scan.

    Args:
        values: (B, N, C) sorted by cell.
        offsets: (B, S+1).
        starts_mask: (B, N) bool, True where a new cell's run begins
            (ship from host or derive from the sorted cell ids).

    Returns:
        (B, S, C); empty cells get ``empty_value``.
    """
    flags = starts_mask[..., None]
    flags = jnp.broadcast_to(flags, values.shape)
    run_max, _ = jax.lax.associative_scan(_segmented_max_op, (values, flags), axis=1)
    # segment's max sits at its last element (index end-1); empty -> end == start
    ends = offsets[:, 1:].astype(jnp.int32)
    starts = offsets[:, :-1].astype(jnp.int32)
    idx = jnp.maximum(ends - 1, 0)
    gathered = jnp.take_along_axis(run_max, idx[..., None], axis=1)
    empty = (ends == starts)[..., None]
    return jnp.where(empty, jnp.asarray(empty_value, values.dtype), gathered)


def gather_cells_sorted(cell_values: jnp.ndarray, cell_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-point gather-back from Morton-ordered cell values.

    Args:
        cell_values: (B, S, C).
        cell_ids: (B, N) sorted Morton ids (padded entries == S are clipped —
            their gathered value is garbage and must be masked downstream,
            identical to the unsorted path's contract).
    """
    s = cell_values.shape[1]
    idx = jnp.minimum(cell_ids.astype(jnp.int32), s - 1)
    return jnp.take_along_axis(cell_values, idx[..., None], axis=1)


def run_starts(cell_ids: jnp.ndarray) -> jnp.ndarray:
    """(B, N) bool start-of-run flags from sorted cell ids (device-side helper)."""
    first = jnp.ones_like(cell_ids[:, :1], dtype=bool)
    rest = cell_ids[:, 1:] != cell_ids[:, :-1]
    return jnp.concatenate([first, rest], axis=1)
