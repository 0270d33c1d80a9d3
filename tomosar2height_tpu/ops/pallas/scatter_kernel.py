"""Pallas TPU kernel: point->grid scatter-mean as tiled one-hot matmuls.

The framework's hottest transfer is pooling ~16k ragged points into a 256^2
feature plane (reference torch_scatter scatter_mean; 13 instances per ALTO
forward). XLA lowers it to a serialized scatter-add; this kernel reformulates
it for the MXU (PointAcc-style, PAPERS.md):

- points arrive Morton-cell-sorted with per-cell ``offsets`` (host bucketing,
  ops/sorted_scatter.py), so every Morton-aligned tile of ``TILE_CELLS`` cells
  owns a contiguous point range;
- the grid iterates (batch, tile); each step loops over the CHUNK-aligned
  128-point windows covering its range, builds a [CHUNK, TILE_CELLS] one-hot
  from the cell ids, and accumulates ``one_hot.T @ values`` (and counts) with
  MXU matmuls — a scatter with zero scatter instructions. Rows belonging to
  neighboring tiles produce all-zero one-hot rows (their cells fall outside
  the tile's id range), so no explicit row masking is needed;
- channels are padded to the 128-lane width (the HBM layout pads anyway, so
  the DMAs move no extra bytes) and Mosaic's slice-alignment rules are met;
- per-tile means are written as the Morton-ordered cell vector; the caller
  reshapes to a row-major plane via :func:`...sorted_scatter.morton_to_plane`.

Tile-range offsets ride in via ``PrefetchScalarGridSpec`` so the DMA windows
are known before each kernel body runs (pallas_guide.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_CELLS = 256   # cells per Morton tile (a 16x16 spatial block)
TILE_SIDE = 16     # spatial side of a tile
CHUNK = 128        # points per inner matmul chunk (MXU sublane-friendly)
LANE = 128         # TPU lane width; channel dim padded to a multiple


def _deinterleave_bits(v, bits: int, phase: int):
    """Extract every-other bit of v starting at ``phase`` (traced-int safe)."""
    out = v * 0
    for b in range(bits):
        out = out | (((v >> (2 * b + phase)) & 1) << b)
    return out


# static [256] permutation: row-major in-tile index -> Morton in-tile index
_TILE_PERM = np.zeros(TILE_CELLS, dtype=np.int32)
for _q in range(TILE_CELLS):
    _y, _x = _q // TILE_SIDE, _q % TILE_SIDE
    _m = 0
    for _b in range(4):
        _m |= ((_x >> _b) & 1) << (2 * _b)
        _m |= ((_y >> _b) & 1) << (2 * _b + 1)
    _TILE_PERM[_q] = _m
# one-hot matrix form: P[i, j] = 1 iff morton cell j lands at row-major slot i;
# applied as a 256x256 matmul on the MXU (VMEM gathers are not Mosaic-friendly)
_TILE_PERM_MAT = np.zeros((TILE_CELLS, TILE_CELLS), dtype=np.float32)
_TILE_PERM_MAT[np.arange(TILE_CELLS), _TILE_PERM] = 1.0


def _scatter_tile_kernel(
    tile_offsets_ref,  # scalar-prefetch: (B, T+1) int32
    values_ref,        # HBM: (B, Npad, Cp)
    cells_ref,         # HBM: (B, Npad, LANE) int32 (cell id broadcast in lane 0)
    out_ref,           # VMEM block: (1, 1, TILE_CELLS, Cp)
    acc_ref,           # VMEM scratch: (TILE_CELLS, Cp) f32
    cnt_ref,           # VMEM scratch: (TILE_CELLS, 1) f32
    vchunk_ref,        # VMEM scratch: (CHUNK, Cp)
    cchunk_ref,        # VMEM scratch: (CHUNK, LANE) int32
    sem_v,
    sem_c,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = tile_offsets_ref[b, t]
    end = tile_offsets_ref[b, t + 1]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)

    tile_base = t * TILE_CELLS
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_CELLS), 1)

    first_k = start // CHUNK
    # skip empty tiles entirely (cdiv alone would schedule one chunk when an
    # empty tile's range sits mid-chunk: start == end = 200 -> k in [1, 2))
    last_k = jnp.where(start == end, first_k, pl.cdiv(end, CHUNK))

    def body(k, _):
        chunk_start = pl.multiple_of(k * CHUNK, CHUNK)
        cp_v = pltpu.make_async_copy(
            values_ref.at[b, pl.ds(chunk_start, CHUNK), :], vchunk_ref, sem_v
        )
        cp_c = pltpu.make_async_copy(
            cells_ref.at[b, pl.ds(chunk_start, CHUNK), :], cchunk_ref, sem_c
        )
        cp_v.start()
        cp_c.start()
        cp_v.wait()
        cp_c.wait()

        local = cchunk_ref[:, :1] - tile_base  # (CHUNK, 1)
        # rows whose cell lies outside [0, TILE_CELLS) match no column
        onehot = (local == cell_iota).astype(jnp.float32)
        # HIGHEST precision: the default bf16 matmul truncates the scattered
        # values (one-hot weights are exact either way)
        acc_ref[:] += jax.lax.dot_general(
            onehot, vchunk_ref[:].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cnt_ref[:] += jnp.sum(onehot, axis=0)[:, None]
        return 0

    jax.lax.fori_loop(first_k, last_k, body, 0)
    out_ref[0, 0] = (acc_ref[:] / jnp.maximum(cnt_ref[:], 1.0)).astype(out_ref.dtype)


def _scatter_tile_kernel_plane(
    tile_offsets_ref, values_ref, cells_ref, perm_ref, out_ref,
    acc_ref, cnt_ref, vchunk_ref, cchunk_ref, sem_v, sem_c,
):
    """Variant emitting row-major (TILE_SIDE, TILE_SIDE, Cp) plane blocks:
    the Morton->row-major shuffle happens in-register via a 256x256 one-hot
    permutation matmul, eliminating the host-graph transpose chain."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = tile_offsets_ref[b, t]
    end = tile_offsets_ref[b, t + 1]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)

    tile_base = t * TILE_CELLS
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_CELLS), 1)

    def body(k, _):
        chunk_start = pl.multiple_of(k * CHUNK, CHUNK)
        cp_v = pltpu.make_async_copy(
            values_ref.at[b, pl.ds(chunk_start, CHUNK), :], vchunk_ref, sem_v
        )
        cp_c = pltpu.make_async_copy(
            cells_ref.at[b, pl.ds(chunk_start, CHUNK), :], cchunk_ref, sem_c
        )
        cp_v.start()
        cp_c.start()
        cp_v.wait()
        cp_c.wait()
        local = cchunk_ref[:, :1] - tile_base
        onehot = (local == cell_iota).astype(jnp.float32)
        acc_ref[:] += jax.lax.dot_general(
            onehot, vchunk_ref[:].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cnt_ref[:] += jnp.sum(onehot, axis=0)[:, None]
        return 0

    # skip empty tiles entirely (cdiv would still schedule one chunk when the
    # tile's range sits inside a chunk: start == end = 200 -> k in [1, 2))
    first_k = start // CHUNK
    last_k = jnp.where(start == end, first_k, pl.cdiv(end, CHUNK))
    jax.lax.fori_loop(first_k, last_k, body, 0)
    mean = acc_ref[:] / jnp.maximum(cnt_ref[:], 1.0)
    row_major = jax.lax.dot_general(
        perm_ref[:], mean, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = row_major.reshape(TILE_SIDE, TILE_SIDE, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("reso", "interpret"))
def pallas_scatter_mean_plane(
    values: jnp.ndarray,
    cells: jnp.ndarray,
    offsets: jnp.ndarray,
    reso: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Like :func:`pallas_scatter_mean` but returns the row-major NHWC plane
    (B, reso, reso, C) directly — no Morton reshape/transpose afterwards."""
    b, n, c = values.shape
    ncell = reso * reso
    assert ncell % TILE_CELLS == 0
    n_tiles = ncell // TILE_CELLS
    side_tiles = reso // TILE_SIDE
    bits = side_tiles.bit_length() - 1
    cp = ((c + LANE - 1) // LANE) * LANE

    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK + CHUNK
    values_p = jnp.pad(values, ((0, 0), (0, n_pad - n), (0, cp - c)))
    cells_p = jnp.pad(cells.astype(jnp.int32), ((0, 0), (0, n_pad - n)),
                      constant_values=ncell + TILE_CELLS)
    cells_wide = jnp.broadcast_to(cells_p[..., None], (b, n_pad, LANE))
    tile_offsets = offsets[:, ::TILE_CELLS].astype(jnp.int32)

    def out_index(b_, t_, *_):
        ty = _deinterleave_bits(t_, bits, 1)
        tx = _deinterleave_bits(t_, bits, 0)
        return (b_, ty, tx, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_CELLS, TILE_CELLS), lambda b_, t_, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_SIDE, TILE_SIDE, cp), out_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_CELLS, cp), jnp.float32),
            pltpu.VMEM((TILE_CELLS, 1), jnp.float32),
            pltpu.VMEM((CHUNK, cp), values.dtype),
            pltpu.VMEM((CHUNK, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _scatter_tile_kernel_plane,
        out_shape=jax.ShapeDtypeStruct((b, reso, reso, cp), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, values_p, cells_wide, jnp.asarray(_TILE_PERM_MAT))
    return out[..., :c]


ACHUNK = 128  # aligned-layout chunk quantum (matches gather_kernel.CHUNK);
# also the Mosaic HBM lane rule: manually-DMA'd tensors need 128-multiple
# minor dims, which ACHUNK-wide cell rows and lane-padded values satisfy


def _aligned_scatter_kernel(
    toff_ref,    # scalar-prefetch: (B, T+1) int32 chunk-aligned tile offsets
    values_ref,  # HBM: (B, Npad, F)
    cells_ref,   # HBM: (B, NC, ACHUNK) int32 finest Morton ids (row per chunk)
    perm_ref,    # VMEM: (TILE_CELLS, TILE_CELLS) Morton->row-major one-hot
    out_ref,     # VMEM block: (1, TILE_SIDE, TILE_SIDE, F)
    acc_ref,     # VMEM scratch: (TILE_CELLS, F) f32
    cnt_ref,     # VMEM scratch: (TILE_CELLS, 1) f32
    vchunk,      # VMEM scratch: (2, ACHUNK, F)
    cchunk,      # VMEM scratch: (2, 1, ACHUNK) int32
    sem_v,       # DMA sems (2,)
    sem_c,       # DMA sems (2,)
    *,
    level_shift: int,
    f32_precision: bool,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    start = toff_ref[b, t]
    end = toff_ref[b, t + 1]
    k0 = start // ACHUNK
    k1 = end // ACHUNK

    acc_ref[:] = jnp.zeros_like(acc_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)

    tile_base = t * TILE_CELLS
    # one-hot TRANSPOSE built directly: M[j, i] = (local cell of point i == j)
    # with cells in the lane dim and the cell iota in the sublane dim — no
    # transpose op, and the cell DMA is ACHUNK ints instead of a LANE-wide
    # broadcast (the r01 kernel moved 128x the bytes here)
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, ACHUNK), 0)

    def dma(k, slot):
        return (
            pltpu.make_async_copy(values_ref.at[b, pl.ds(k * ACHUNK, ACHUNK), :],
                                  vchunk.at[slot], sem_v.at[slot]),
            pltpu.make_async_copy(cells_ref.at[b, pl.ds(k, 1), :],
                                  cchunk.at[slot], sem_c.at[slot]),
        )

    @pl.when(k0 < k1)
    def _():
        for d in dma(k0, k0 % 2):
            d.start()

    prec = jax.lax.Precision.HIGHEST if f32_precision else jax.lax.Precision.DEFAULT

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < k1)
        def _():
            for d in dma(k + 1, (k + 1) % 2):
                d.start()

        for d in dma(k, slot):
            d.wait()
        local = (cchunk[slot] >> level_shift) - tile_base  # (1, ACHUNK)
        m = (local == cell_iota).astype(vchunk.dtype)      # (TILE_CELLS, ACHUNK)
        acc_ref[:] += jax.lax.dot_general(
            m, vchunk[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        cnt_ref[:] += jnp.sum(m.astype(jnp.float32), axis=1)[:, None]
        return 0

    jax.lax.fori_loop(k0, k1, body, 0)
    mean = acc_ref[:] / jnp.maximum(cnt_ref[:], 1.0)
    row_major = jax.lax.dot_general(
        perm_ref[:], mean, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    out_ref[0] = row_major.reshape(TILE_SIDE, TILE_SIDE, -1).astype(out_ref.dtype)


def _aligned_scatter_mean_plane_impl(
    values: jnp.ndarray,
    cells_chunked: jnp.ndarray,
    tile_offsets: jnp.ndarray,
    reso: int,
    finest: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chunk-aligned Morton scatter-mean to a row-major NHWC plane.

    The fast path for the ALTO point->grid transfers (reference alto.py:76-88):
    inputs follow host_morton_bucket_aligned's layout contract — every tile of
    TILE_CELLS cells owns a chunk-aligned point range. Padding rows carry
    PAD_CELL_SENTINEL, whose local id never matches a tile cell, so they (and
    any stray value bits) reduce to exact zeros.

    Args:
        values: (B, Npad, F) float, aligned-layout point features.
        cells_chunked: (B, Npad // ACHUNK, ACHUNK) int32 finest Morton ids.
        tile_offsets: (B, ntiles + 1) int32 offsets at THIS reso (coarsened).
        reso: output plane resolution.
        finest: resolution the Morton ids were computed at.

    Returns:
        (B, reso, reso, F) plane; empty cells are 0.
    """
    b, npad, f = values.shape
    assert npad % ACHUNK == 0 and cells_chunked.shape[1] * ACHUNK == npad
    n_tiles = (reso * reso) // TILE_CELLS
    assert tile_offsets.shape[-1] == n_tiles + 1
    side_tiles = reso // TILE_SIDE
    bits = side_tiles.bit_length() - 1
    level_shift = 2 * (int(finest).bit_length() - int(reso).bit_length())
    fp = ((f + LANE - 1) // LANE) * LANE
    if fp != f:  # Mosaic lane rule for the manual value DMAs
        values = jnp.pad(values, ((0, 0), (0, 0), (0, fp - f)))

    def out_index(b_, t_, *_):
        ty = _deinterleave_bits(t_, bits, 1)
        tx = _deinterleave_bits(t_, bits, 0)
        return (b_, ty, tx, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_CELLS, TILE_CELLS), lambda b_, t_, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_SIDE, TILE_SIDE, fp), out_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_CELLS, fp), jnp.float32),
            pltpu.VMEM((TILE_CELLS, 1), jnp.float32),
            pltpu.VMEM((2, ACHUNK, fp), values.dtype),
            pltpu.VMEM((2, 1, ACHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _aligned_scatter_kernel,
        level_shift=level_shift,
        f32_precision=values.dtype == jnp.float32,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, reso, reso, fp), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, values, cells_chunked, jnp.asarray(_TILE_PERM_MAT, values.dtype))
    return out[..., :f]


@functools.partial(jax.jit, static_argnames=("reso", "interpret"))
def pallas_scatter_mean(
    values: jnp.ndarray,
    cells: jnp.ndarray,
    offsets: jnp.ndarray,
    reso: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Morton-ordered per-cell mean via the tiled one-hot-matmul kernel.

    Args:
        values: (B, N, C) float, Morton-cell-sorted.
        cells: (B, N) int32 sorted Morton ids (padding rows have id >= reso**2).
        offsets: (B, reso**2 + 1) int32 cell segment offsets.
        reso: plane resolution (power of two, reso**2 % TILE_CELLS == 0).

    Returns:
        (B, reso*reso, C) Morton-ordered cell means (0 for empty cells) — pass
        through ``morton_to_plane`` for the NHWC plane.
    """
    b, n, c = values.shape
    ncell = reso * reso
    assert ncell % TILE_CELLS == 0
    n_tiles = ncell // TILE_CELLS
    cp = ((c + LANE - 1) // LANE) * LANE

    # pad: channel dim to the lane width (free — HBM layout pads regardless),
    # point dim so CHUNK-aligned DMA windows never run off the end
    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK + CHUNK
    values_p = jnp.pad(values, ((0, 0), (0, n_pad - n), (0, cp - c)))
    cells_p = jnp.pad(cells.astype(jnp.int32), ((0, 0), (0, n_pad - n)),
                      constant_values=ncell + TILE_CELLS)
    # lane-width int payload so the cell DMA is aligned too
    cells_wide = jnp.broadcast_to(cells_p[..., None], (b, n_pad, LANE))

    tile_offsets = offsets[:, ::TILE_CELLS].astype(jnp.int32)  # (B, n_tiles + 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # values stay in HBM; DMA'd manually
            pl.BlockSpec(memory_space=pltpu.ANY),  # cells
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE_CELLS, cp), lambda b_, t_, *_: (b_, t_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_CELLS, cp), jnp.float32),
            pltpu.VMEM((TILE_CELLS, 1), jnp.float32),
            pltpu.VMEM((CHUNK, cp), values.dtype),
            pltpu.VMEM((CHUNK, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        _scatter_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, TILE_CELLS, cp), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, values_p, cells_wide)
    return out.reshape(b, ncell, cp)[..., :c]


# --- v3: one fat DMA per tile, ids ride as an f32 value lane ---------------------
#
# The v2 kernel is latency-bound (~2 us per 128-row chunk: 2 DMA round trips +
# a small matmul). v3 restructures for fat steps:
# - the wrapper upcasts values to f32 and appends the GLOBAL Morton id as a
#   feature lane (f32 is exact to 2^24, so over-reading a neighbor tile's rows
#   is safe: their local id never lands in [0, TILE_CELLS));
# - each tile is covered by WROWS(512)-row windows from its chunk-aligned
#   start — ~1 window per tile — with ONE DMA each;
# - the one-hot is built against a row-major-PERMUTED cell constant (Morton id
#   of the row-major cell index, bit-ops on an iota), so the accumulator comes
#   out row-major and the 256x256 permutation matmul disappears;
# - counts come from a ones-vector matmul (no lane->sublane transpose);
# - 4 Morton-sibling tiles share one grid step (static inner loop), quartering
#   the per-step machinery; their out sub-blocks tile the (1, 32, 32, Fp) step
#   output block.

V3_WROWS = 512      # rows per window DMA
V3_GROUP = 4        # Morton-sibling tiles per grid step


def _rm_morton_row(bits4: int = 4):
    """(1, TILE_CELLS) int32: Morton id of each row-major in-tile cell."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_CELLS), 1)
    y = j >> bits4
    x = j & (TILE_SIDE - 1)
    m = j * 0
    for b in range(bits4):
        m = m | (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))
    return m


def _scatter_v3_kernel(
    toff_ref,    # scalar-prefetch: (B, T+1) int32 (finest-tile granularity)
    vext_ref,    # HBM: (B, Npad, Fp) f32 — lane id_lane = global Morton id
    out_ref,     # VMEM block: (1, 2*TILE_SIDE, 2*TILE_SIDE, Fp)
    acc_ref,     # VMEM scratch: (TILE_CELLS, Fp) f32 (row-major cells)
    win_ref,     # VMEM scratch: (2, V3_WROWS, Fp) f32
    sem_v,       # DMA sems: (2,)
    *,
    id_lane: int,
    level_shift: int,
    n_batch: int,
):
    b = pl.program_id(0)
    g = pl.program_id(1)
    ng = pl.num_programs(1)
    rm_morton = _rm_morton_row()
    ones = jnp.ones((V3_WROWS, 1), jnp.float32)

    # window w of tile q in group gg starts at toff[4*gg+q] + w*V3_WROWS;
    # windows are tile-START-aligned (chunk-aligned), over-read is masked
    def win_dma(bb, gg, q, w, slot):
        # offsets are CHUNK(128)-multiples by the layout contract; Mosaic
        # needs the hint to prove 8-divisibility of the row slice
        start = pl.multiple_of(toff_ref[bb, gg * V3_GROUP + q], 128)
        return pltpu.make_async_copy(
            vext_ref.at[bb, pl.ds(start + w * V3_WROWS, V3_WROWS), :],
            win_ref.at[slot], sem_v.at[slot])

    for q in range(V3_GROUP):
        # Morton sibling order within the group: (y, x) = (q>>1, q&1)
        sub_y = (q >> 1) * TILE_SIDE
        sub_x = (q & 1) * TILE_SIDE
        t = g * V3_GROUP + q
        start = toff_ref[b, t]
        end = toff_ref[b, t + 1]
        nw = jnp.maximum(0, pl.cdiv(end - start, V3_WROWS))
        acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(nw > 0)
        def _():
            win_dma(b, g, q, 0, 0).start()

        def body(w, cnt_carry):
            slot = w % 2

            @pl.when(w + 1 < nw)
            def _():
                win_dma(b, g, q, w + 1, (w + 1) % 2).start()

            win_dma(b, g, q, w, slot).wait()
            vw = win_ref[slot]
            ids = vw[:, id_lane:id_lane + 1]  # (V3_WROWS, 1) f32 global ids
            # cell at this reso = morton >> level_shift (exact f32 divide,
            # ids >= 0); over-read rows (neighbor tiles, pad sentinel, and the
            # zero tail — only the last tile can reach it, local goes
            # negative) never land in [0, TILE_CELLS)
            local = (ids / (1 << level_shift)).astype(jnp.int32) - t * TILE_CELLS
            onehot = (local == rm_morton).astype(jnp.float32)  # (W, 256)
            acc_ref[:] += jax.lax.dot_general(
                onehot, vw, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cnt = jax.lax.dot_general(
                onehot, ones, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return cnt_carry + cnt

        cnt = jax.lax.fori_loop(0, nw, body, jnp.zeros((TILE_CELLS, 1),
                                                       jnp.float32))
        mean = acc_ref[:] / jnp.maximum(cnt, 1.0)
        out_ref[0, sub_y:sub_y + TILE_SIDE, sub_x:sub_x + TILE_SIDE, :] = (
            mean.reshape(TILE_SIDE, TILE_SIDE, -1).astype(out_ref.dtype))


def _scatter_v3_impl(values_ext, tile_offsets, reso, finest, id_lane,
                     interpret):
    b, npad, fp = values_ext.shape
    assert fp % LANE == 0 and npad % V3_WROWS == 0
    n_tiles = (reso * reso) // TILE_CELLS
    n_groups = max(n_tiles // V3_GROUP, 1)
    assert n_groups * V3_GROUP == n_tiles, "reso must give >= 4 tiles"
    side_g = reso // (2 * TILE_SIDE)
    bits = side_g.bit_length() - 1
    level_shift = 2 * (int(finest).bit_length() - int(reso).bit_length())

    def out_index(b_, g_, *_):
        gy = _deinterleave_bits(g_, bits, 1)
        gx = _deinterleave_bits(g_, bits, 0)
        return (b_, gy, gx, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_groups),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 2 * TILE_SIDE, 2 * TILE_SIDE, fp),
                               out_index, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_CELLS, fp), jnp.float32),
            pltpu.VMEM((2, V3_WROWS, fp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _scatter_v3_kernel, id_lane=id_lane, level_shift=level_shift,
        n_batch=b)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, reso, reso, fp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_offsets, values_ext)


@functools.partial(jax.jit, static_argnames=("reso", "finest", "interpret"))
def _scatter_v3_jit(values, cells_chunked, tile_offsets, reso, finest,
                    interpret):
    b, npad, f = values.shape
    cells = cells_chunked.reshape(b, npad)
    # global Morton id as an f32 lane (exact <= 2^24; pad sentinel stays huge)
    ids = jnp.minimum(cells, jnp.int32(1 << 24)).astype(jnp.float32)
    ext = jnp.concatenate([values.astype(jnp.float32), ids[..., None]],
                          axis=-1)
    fp = ((ext.shape[-1] + LANE - 1) // LANE) * LANE
    if fp != ext.shape[-1]:
        ext = jnp.pad(ext, ((0, 0), (0, 0), (0, fp - ext.shape[-1])))
    # pad rows so the last tile's windows never run off the array
    ext = jnp.pad(ext, ((0, 0), (0, V3_WROWS), (0, 0)))
    level = int(finest).bit_length() - int(reso).bit_length()
    toff = tile_offsets[:, :: 4 ** level] if level else tile_offsets
    out = _scatter_v3_impl(ext, toff, reso, finest, f, interpret)
    return out[..., :f].astype(values.dtype)


def pallas_scatter_mean_plane_v3(values, cells_chunked, tile_offsets,
                                 reso: int, finest: int,
                                 interpret: bool | None = None):
    """Fat-step aligned Morton scatter-mean (see v3 notes above). Takes the
    FINEST tile_offsets and coarsens internally. Requires reso >= 32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _scatter_v3_jit(values, cells_chunked, tile_offsets, reso, finest,
                           interpret)


@functools.partial(jax.jit, static_argnames=("reso", "finest", "interpret"))
def _aligned_scatter_jit(values, cells_chunked, tile_offsets, reso, finest,
                         interpret):
    return _aligned_scatter_mean_plane_impl(values, cells_chunked, tile_offsets,
                                            reso, finest, interpret)


def pallas_aligned_scatter_mean_plane(values, cells_chunked, tile_offsets,
                                      reso: int, finest: int,
                                      interpret: bool | None = None):
    """Public entry; off-TPU backends run the kernel in interpret mode so CPU
    tests exercise the identical program (slow but exact)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _aligned_scatter_jit(values, cells_chunked, tile_offsets, reso,
                                finest, interpret)
