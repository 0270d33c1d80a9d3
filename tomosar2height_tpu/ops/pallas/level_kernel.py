"""Pallas TPU kernel: one fused ALTO level round trip (gather -> MLP -> scatter).

Every ALTO Down/Up level round-trips the feature plane through the point set
(reference alto.py:97-138, 207-257): bilinear-sample the plane at the point
coords, run the ``fc_comm`` MLP (+ ``fc_c`` skip from the previous level's
point features), and scatter_mean the result back into the plane. Round 2
built one Pallas kernel per op on a chunk-aligned Morton layout; they won
per-op but lost at model level to the per-chunk DMA-management floor (~2 us
per 128-row chunk across 3 kernels + the XLA MLP between them; RESULTS.md).

This kernel fuses the WHOLE round trip into one pallas_call and restructures
the iteration so the floor disappears:

- the grid runs over (batch, point-chunk) instead of (batch, tile): the aux
  coords, cell ids, previous point features and output point features are all
  auto-pipelined BlockSpec blocks (Mosaic prefetches/double-buffers them), so
  the kernel body contains NO per-chunk DMA management for point data;
- each Morton tile of 256 cells owns a contiguous chunk-aligned point range
  (host_morton_bucket_aligned), so the output plane block (one 16x16 spatial
  tile, index-mapped from the scalar-prefetched tile-of-chunk array) is
  revisited across the tile's chunks and flushed exactly once at tile change;
  per-tile sum/count accumulators live in VMEM scratch;
- per chunk, ONE transposed bilinear-weight matrix turns the plane window
  into sampled features (MXU contraction, as in gather_kernel.py), the MLP
  runs as three resident-weight matmuls, and the scatter back is a one-hot-
  transpose matmul into the accumulator — zero gather/scatter instructions;
- the only manual DMA left is the per-TILE plane window (18 x 32 rows), one
  3D descriptor per tile, double-buffered and prefetched one tile ahead via
  a precomputed next-tile array;
- chunks past the layout's used rows (static worst-case padding) carry a
  tile sentinel and skip the body entirely; tiles with no points are zeroed
  by the XLA-side empty-tile mask (the kernel never visits their blocks).

Layout contract: host_morton_bucket_aligned (ops/sorted_scatter.py) with
``chunk == PCHUNK``. Border semantics match torch F.grid_sample(
padding_mode='border', align_corners=True). bf16 planes truncate the bilinear
weights to bf16 for the MXU contraction (sample positions quantize by ~2^-8)
— a documented approximation, covered by a tolerance test; f32 planes use
HIGHEST-precision matmuls and are exact to ~1e-6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Iteration tile (round-3b "super-tile"): 32x32 spatial, 1024 Morton cells.
# The aligned layout pads each tile's rows to the PCHUNK quantum, so the tile
# size sets the row inflation: 16x16 tiles average ~64 points against the
# 128-row quantum (2.0x inflation, 256 grid steps/item at the flagship
# 16k/256^2 shapes); 32x32 tiles average ~256 (1.25x, 160 steps/item).
# With the measured ~1 us/grid-step machinery floor (scripts/
# profile_gridstep.py) that is a ~35% cut of every chunk-grid kernel's cost.
TILE_SIDE = 32     # spatial side of an iteration tile
TILE_CELLS = 1024  # cells per iteration tile
SUB_SIDE = 16      # flush sub-tile (the Morton->row-major perm granularity)
SUB_CELLS = 256
N_SUB = (TILE_SIDE // SUB_SIDE) ** 2
WIN_Y = 34         # plane window rows: tile + 1-cell halo each side
WIN_X = 48         # window cols: halo widened so the col offset is 8-aligned
WIN_FLAT = WIN_Y * WIN_X
LANE = 128

PCHUNK = 128       # points per grid step (the aligned layout quantum)


def _deinterleave_bits(v, bits: int, phase: int):
    """Every-other bit of v starting at ``phase`` (traced-int safe)."""
    out = v * 0
    for b in range(bits):
        out = out | (((v >> (2 * b + phase)) & 1) << b)
    return out


# static [256, 256] one-hot: row-major in-SUB-tile slot <- Morton in-sub-tile
# cell. Flushes apply it per 16x16 sub-tile (N_SUB quadrant matmuls) — a
# full 1024x1024 perm would cost 16x the MACs and 4 MB of VMEM.
_TILE_PERM_MAT = np.zeros((SUB_CELLS, SUB_CELLS), dtype=np.float32)
for _q in range(SUB_CELLS):
    _y, _x = _q // SUB_SIDE, _q % SUB_SIDE
    _m = 0
    for _b in range(4):
        _m |= ((_x >> _b) & 1) << (2 * _b)
        _m |= ((_y >> _b) & 1) << (2 * _b + 1)
    _TILE_PERM_MAT[_q, _m] = 1.0


def _win_shape(reso: int):
    """Static (win_y, win_x) of the sampling window at this resolution
    (clamped to the plane: at reso == TILE_SIDE the window IS the plane)."""
    return min(WIN_Y, reso), min(WIN_X, reso)


def _tile_window_origin(t, bits: int, reso: int):
    """Clamped top-left (wy, wx) of tile t's win_y x win_x sampling window."""
    win_y, win_x = _win_shape(reso)
    ty = _deinterleave_bits(t, bits, 1)
    tx = _deinterleave_bits(t, bits, 0)
    wy = jnp.clip(ty * TILE_SIDE - 1, 0, max(reso - win_y, 0))
    wx = jnp.clip(tx * TILE_SIDE - 8, 0, max(reso - win_x, 0))
    # operands are 8-multiples but Mosaic can't see through the clip
    return wy, pl.multiple_of(wx, 8)


def _level_kernel(
    ct_ref,      # scalar-prefetch: (B, NC) int32 tile-of-chunk (== T for tail)
    pt_ref,      # scalar-prefetch: (B, NC) int32 next-tile-to-prefetch or -1
    plane_ref,   # HBM (ANY): (B, R, R, Fp)
    aux_ref,     # VMEM block (1, 1, 1, 2*PCHUNK) f32: [x | y] packed coords
    cells_ref,   # VMEM block (1, 1, 1, CL) int32: finest Morton ids (CL >= PCHUNK)
    mrow_ref,    # VMEM block (1, 1, 1, CL) f32: point validity (1/0)
    clast_ref,   # VMEM block (1, PCHUNK, Flp): previous point features
    w_in_ref,    # VMEM (Fp, Hp)
    b_in_ref,    # VMEM (1, Hp)
    w_out_ref,   # VMEM (Hp, Fp)
    b_out_ref,   # VMEM (1, Fp)
    w_c_ref,     # VMEM (Flp, Fp)
    b_c_ref,     # VMEM (1, Fp)
    perm_ref,    # VMEM (TILE_CELLS, TILE_CELLS) f32
    pout_ref,    # VMEM out block (1, TILE_SIDE, TILE_SIDE, Fp)
    cout_ref,    # VMEM out block (1, PCHUNK, Fp)
    cntout_ref,  # VMEM out block (1, 1, 1, TILE_CELLS) f32: per-cell counts
    win_ref,     # scratch VMEM (2, WIN_Y, WIN_X, Fp)
    acc_ref,     # scratch VMEM (TILE_CELLS, Fp) f32
    cnt_ref,     # scratch VMEM (1, TILE_CELLS) f32
    slot_ref,    # scratch SMEM (1,) int32: slot holding the current window
    sem_win,     # DMA sems (2,)
    *,
    reso: int,
    bits: int,
    n_tiles: int,
    nb: int,
    shift: int,
    f32_precision: bool,
):
    b = pl.program_id(0)
    k = pl.program_id(1)
    nc = pl.num_programs(1)
    win_y, win_x = _win_shape(reso)
    t = ct_ref[b, k]
    active = t < n_tiles
    t_prev = jnp.where(k > 0, ct_ref[b, jnp.maximum(k - 1, 0)], -1)
    is_first = active & ((k == 0) | (t_prev != t))
    step0 = (b == 0) & (k == 0)
    last_step = (b == nb - 1) & (k == nc - 1)

    def window_dma(bb, tt, slot):
        wy, wx = _tile_window_origin(tt, bits, reso)
        return pltpu.make_async_copy(
            plane_ref.at[bb, pl.ds(wy, win_y), pl.ds(wx, win_x), :],
            win_ref.at[slot],
            sem_win.at[slot],
        )

    @pl.when(step0)
    def _():
        slot_ref[0] = 1

    @pl.when(is_first)
    def _():
        slot_ref[0] = 1 - slot_ref[0]

    wslot = slot_ref[0]

    @pl.when(step0 & active)
    def _():
        window_dma(b, t, wslot).start()

    # within-batch prefetch: the first chunk of each tile starts the NEXT
    # tile's window into the free slot (pt precomputed on host/XLA side)
    nt = pt_ref[b, k]

    @pl.when(nt >= 0)
    def _():
        window_dma(b, nt, 1 - wslot).start()

    # batch-boundary prefetch: the last chunk of batch b starts batch b+1's
    # first window (one step of flight time; happens nb-1 times per call)
    @pl.when((k == nc - 1) & (~last_step))
    def _():
        bn = jnp.minimum(b + 1, nb - 1)
        tn = ct_ref[bn, 0]

        @pl.when(tn < n_tiles)
        def _():
            window_dma(bn, tn, 1 - wslot).start()

    @pl.when(is_first)
    def _():
        window_dma(b, t, wslot).wait()
        acc_ref[:] = jnp.zeros_like(acc_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    # tail chunks (t == n_tiles sentinel) skip the compute block entirely;
    # zero their point-output block so every c_out row is DEFINED (garbage /
    # NaN tails would poison the ref-vjp backward via c_last x d_o terms)
    @pl.when(~active)
    def _():
        cout_ref[0] = jnp.zeros_like(cout_ref[0])

    @pl.when(active)
    def _():
        dt = pout_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if f32_precision
                else jax.lax.Precision.DEFAULT)
        wy, wx = _tile_window_origin(t, bits, reso)

        # --- bilinear gather: one transposed-weight MXU contraction ---------
        aux = aux_ref[0, 0]                    # (1, 2*PCHUNK)
        xs = jax.lax.slice(aux, (0, 0), (1, PCHUNK))
        ys = jax.lax.slice(aux, (0, PCHUNK), (1, 2 * PCHUNK))
        xs = jnp.clip(xs * (reso - 1), 0.0, reso - 1)
        ys = jnp.clip(ys * (reso - 1), 0.0, reso - 1)
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = xs - x0
        fy = ys - y0
        lx = x0.astype(jnp.int32) - wx
        ly = y0.astype(jnp.int32) - wy
        c00 = ly * win_x + lx                  # (1, PCHUNK)
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (win_y * win_x, PCHUNK), 0)
        w_t = (
            (row_iota == c00).astype(jnp.float32) * ((1 - fy) * (1 - fx))
            + (row_iota == c00 + 1).astype(jnp.float32) * ((1 - fy) * fx)
            + (row_iota == c00 + win_x).astype(jnp.float32) * (fy * (1 - fx))
            + (row_iota == c00 + win_x + 1).astype(jnp.float32) * (fy * fx)
        )
        win = win_ref[wslot].reshape(win_y * win_x, win_ref.shape[-1])
        # bf16 runs truncate the bilinear weights to bf16 for the MXU
        # contraction (~2^-8 sample-position quantization) — accepted serving
        # approximation (ADVICE r02), tolerance-gated in
        # tests/test_fused_level.py::test_bf16_tolerance.
        sampled = jax.lax.dot_general(
            w_t.astype(dt), win,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)                           # (PCHUNK, Fp)

        # --- fc_comm MLP + fc_c skip (resident weights) ---------------------
        h = jax.lax.dot_general(
            sampled, w_in_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt) + b_in_ref[:]
        h = jnp.maximum(h, 0)
        o = jax.lax.dot_general(
            h, w_out_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt) + b_out_ref[:]
        o = o + jax.lax.dot_general(
            clast_ref[0], w_c_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt) + b_c_ref[:]
        # in-kernel masking: pad rows write exact zeros (the XLA-side where
        # pass cost ~0.1 ms/level at batch 8); f32 (1,PCHUNK)->(PCHUNK,1)
        # reshape is a legal 32-bit minor-dim insertion
        m_col = jax.lax.slice(mrow_ref[0, 0], (0, 0),
                              (1, PCHUNK)).reshape(PCHUNK, 1)
        o = o * m_col.astype(dt)
        cout_ref[0] = o

        # --- scatter-mean accumulation (one-hot-transpose matmul) -----------
        cells = cells_ref[0, 0]                # (1, CL) int32
        cells = jax.lax.slice(cells, (0, 0), (1, PCHUNK))
        local = (cells >> shift) - t * TILE_CELLS
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, PCHUNK), 0)
        m = (local == cell_iota).astype(dt)    # sentinel rows match no cell
        acc_ref[:] += jax.lax.dot_general(
            m, o, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # per-cell counts as a (1, PCHUNK) x (TILE_CELLS, PCHUNK)^T matmul:
        # lands lane-oriented so the counts OUTPUT block (consumed by the
        # fused backward's scatter-mean transpose) needs no transpose
        cnt_ref[:] += jax.lax.dot_general(
            jnp.ones((1, PCHUNK), dt), m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        # --- flush the tile's plane block on its last chunk -----------------
        t_next = jnp.where(k + 1 < nc, ct_ref[b, jnp.minimum(k + 1, nc - 1)], -1)

        @pl.when((k == nc - 1) | (t_next != t))
        def _():
            cntout_ref[0, 0] = cnt_ref[:]
            cnt_col = cnt_ref[:].reshape(TILE_CELLS, 1)
            mean = acc_ref[:] / jnp.maximum(cnt_col, 1.0)
            # Morton -> row-major per 16x16 SUB-tile (N_SUB quadrant
            # matmuls); sub-tile j's Morton quadrant is (x=j&1, y=j>>1)
            for j in range(N_SUB):
                sub = jax.lax.slice(
                    mean, (j * SUB_CELLS, 0), ((j + 1) * SUB_CELLS,
                                               mean.shape[1]))
                rm = jax.lax.dot_general(
                    perm_ref[:], sub,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                sy, sx = (j >> 1) & 1, j & 1
                pout_ref[0,
                         sy * SUB_SIDE:(sy + 1) * SUB_SIDE,
                         sx * SUB_SIDE:(sx + 1) * SUB_SIDE] = rm.reshape(
                    SUB_SIDE, SUB_SIDE, -1).astype(dt)


def _pad_lanes(x, mult=LANE):
    f = x.shape[-1]
    fp = ((f + mult - 1) // mult) * mult
    if fp == f:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, fp - f)])


def chunk_metadata(tile_offsets: jnp.ndarray, npad: int, reso: int,
                   finest: int):
    """XLA-side per-level chunk metadata for the fused kernel.

    Args:
        tile_offsets: (B, T_finest + 1) int32 chunk-aligned offsets at the
            FINEST resolution.
        npad: static aligned point-array length.
        reso: this level's plane resolution.
        finest: the layout's finest resolution.

    Returns:
        ct (B, NC) int32 tile-of-chunk at ``reso`` (== n_tiles for tail
        chunks), pt (B, NC) int32 tile to prefetch at each step (or -1).
    """
    level = int(finest).bit_length() - int(reso).bit_length()
    toff = tile_offsets[:, :: 4 ** level].astype(jnp.int32)  # (B, T+1)
    n_tiles = (reso // TILE_SIDE) ** 2
    nc = npad // PCHUNK
    rows = jnp.arange(nc, dtype=jnp.int32) * PCHUNK          # (NC,)
    # tile owning chunk k = #tile-ends <= row (batched searchsorted as a
    # compare-reduce; T x NC bools, trivially fused by XLA)
    ct = (rows[None, :, None] >= toff[:, None, 1:]).sum(-1).astype(jnp.int32)
    ct = jnp.minimum(ct, n_tiles - 1)
    used = toff[:, -1:]                                      # (B, 1)
    ct = jnp.where(rows[None, :] < used, ct, n_tiles)        # tail sentinel
    # prefetch target: at each tile's FIRST chunk, the tile after it (-1 else)
    prev = jnp.concatenate([jnp.full_like(ct[:, :1], -1), ct[:, :-1]], axis=1)
    is_first = (ct != prev) & (ct < n_tiles)
    next_k = jnp.take_along_axis(
        toff, jnp.minimum(ct + 1, n_tiles), axis=1) // PCHUNK
    nt = jnp.take_along_axis(
        jnp.concatenate([ct, jnp.full_like(ct[:, :1], n_tiles)], axis=1),
        jnp.minimum(next_k, nc), axis=1)
    pt = jnp.where(is_first & (nt < n_tiles), nt, -1)
    return ct, pt.astype(jnp.int32)


def empty_tile_mask(tile_offsets: jnp.ndarray, reso: int, finest: int):
    """(B, reso, reso) bool: True where the tile owning the pixel has points.

    The chunk-grid kernel never visits empty tiles, so their plane blocks
    hold stale memory; callers zero them with this mask.
    """
    from tomosar2height_tpu.ops.sorted_scatter import morton_to_plane

    level = int(finest).bit_length() - int(reso).bit_length()
    toff = tile_offsets[:, :: 4 ** level]
    nonempty = (toff[:, 1:] > toff[:, :-1])                  # (B, T) Morton
    side = reso // TILE_SIDE
    m = morton_to_plane(nonempty[..., None], side)[..., 0]   # (B, side, side)
    b = m.shape[0]
    m = jnp.broadcast_to(m[:, :, None, :, None],
                         (b, side, TILE_SIDE, side, TILE_SIDE))
    return m.reshape(b, reso, reso)


def _fused_level_impl(plane, aux, cells_row, mask_row, c_last, ct, pt,
                      weights, reso: int, finest: int, interpret: bool):
    """Run the fused level kernel. All inputs pre-padded to lane multiples.

    Returns (plane_out (B, R, R, Fp), c_out (B, Npad, Fp), counts
    (B, T, 1, 256) f32 per-cell point counts) — UNMASKED: empty tiles and
    tail/pad rows hold garbage (callers apply empty_tile_mask and the point
    mask; unvisited tiles' counts are garbage too).
    """
    w_in, b_in, w_out, b_out, w_c, b_c = weights
    b, r, _, fp = plane.shape
    nc = aux.shape[1]
    npad = nc * PCHUNK
    cl = cells_row.shape[-1]
    assert aux.ndim == 4 and cells_row.ndim == 4
    flp = c_last.shape[-1]
    hp = w_in.shape[-1]
    n_tiles = (reso // TILE_SIDE) ** 2
    bits = (reso // TILE_SIDE).bit_length() - 1
    shift = 2 * (int(finest).bit_length() - int(reso).bit_length())
    dt = plane.dtype

    def pout_index(b_, k_, ct_r, pt_r):
        t = jnp.minimum(ct_r[b_, k_], n_tiles - 1)
        ty = _deinterleave_bits(t, bits, 1)
        tx = _deinterleave_bits(t, bits, 0)
        return (b_, ty, tx, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # plane
            # the (8, 128)-divisibility rule for pipelined blocks forces a
            # singleton row dim on the per-chunk metadata rows
            pl.BlockSpec((1, 1, 1, 2 * PCHUNK),
                         lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, PCHUNK, flp), lambda b_, k_, *_: (b_, k_, 0)),
            pl.BlockSpec((fp, hp), lambda *_: (0, 0)),            # w_in
            pl.BlockSpec((1, hp), lambda *_: (0, 0)),             # b_in
            pl.BlockSpec((hp, fp), lambda *_: (0, 0)),            # w_out
            pl.BlockSpec((1, fp), lambda *_: (0, 0)),             # b_out
            pl.BlockSpec((flp, fp), lambda *_: (0, 0)),           # w_c
            pl.BlockSpec((1, fp), lambda *_: (0, 0)),             # b_c
            pl.BlockSpec((SUB_CELLS, SUB_CELLS), lambda *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_SIDE, TILE_SIDE, fp), pout_index),
            pl.BlockSpec((1, PCHUNK, fp), lambda b_, k_, *_: (b_, k_, 0)),
            pl.BlockSpec((1, 1, 1, TILE_CELLS),
                         lambda b_, k_, ct_r, pt_r: (
                             b_, jnp.minimum(ct_r[b_, k_], n_tiles - 1),
                             0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2,) + _win_shape(r) + (fp,), dt),
            pltpu.VMEM((TILE_CELLS, fp), jnp.float32),
            pltpu.VMEM((1, TILE_CELLS), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _level_kernel, reso=reso, bits=bits, n_tiles=n_tiles, nb=b,
        shift=shift, f32_precision=dt == jnp.float32,
    )
    plane_out, c_out, counts = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, r, r, fp), dt),
            jax.ShapeDtypeStruct((b, npad, fp), dt),
            jax.ShapeDtypeStruct((b, n_tiles, 1, TILE_CELLS), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ct, pt, plane, aux, cells_row, mask_row, c_last, w_in, b_in, w_out,
      b_out, w_c, b_c, jnp.asarray(_TILE_PERM_MAT, dt))
    return plane_out, c_out, counts


def make_aux_packed(xy: jnp.ndarray) -> jnp.ndarray:
    """(B, Npad, 2) coords -> (B, Npad/PCHUNK, 1, 2*PCHUNK) f32 packed
    [x | y] chunk rows (singleton dim: pipelined-block divisibility rule)."""
    b, npad, _ = xy.shape
    nc = npad // PCHUNK
    x = xy[..., 0].astype(jnp.float32).reshape(b, nc, 1, PCHUNK)
    y = xy[..., 1].astype(jnp.float32).reshape(b, nc, 1, PCHUNK)
    return jnp.concatenate([x, y], axis=-1)


def make_mask_row(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, Npad) bool -> (B, Npad/PCHUNK, 1, max(PCHUNK,128)) f32 validity."""
    b, npad = mask.shape
    nc = npad // PCHUNK
    out = mask.astype(jnp.float32).reshape(b, nc, 1, PCHUNK)
    if PCHUNK < LANE:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, LANE - PCHUNK)))
    return out


def make_cells_row(cells: jnp.ndarray) -> jnp.ndarray:
    """(B, Npad) finest Morton ids -> (B, Npad/PCHUNK, 1, max(PCHUNK,128))."""
    b, npad = cells.shape
    nc = npad // PCHUNK
    out = cells.astype(jnp.int32).reshape(b, nc, 1, PCHUNK)
    if PCHUNK < LANE:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, LANE - PCHUNK)),
                      constant_values=np.int32(1 << 30))
    return out


# --- reference XLA composition (backward pass + golden tests) --------------------


def _level_ref(plane, c_last, weights, xy, cells, mask, reso: int, finest: int):
    """The level round trip as plain XLA ops — the exact math the kernel
    computes (modulo matmul precision), used for the custom_vjp backward and
    the interpret-mode golden tests."""
    from tomosar2height_tpu.ops.sampling import grid_sample_2d
    from tomosar2height_tpu.ops.scatter import segment_mean
    from tomosar2height_tpu.ops.sorted_scatter import morton_to_plane

    w_in, b_in, w_out, b_out, w_c, b_c = weights
    dt = plane.dtype
    f = w_out.shape[-1]
    sampled = grid_sample_2d(plane, xy.astype(dt))
    h = jnp.maximum((sampled @ w_in).astype(dt) + b_in, 0)
    o = (h @ w_out).astype(dt) + b_out
    o = o + (c_last @ w_c).astype(dt) + b_c
    shift = 2 * (int(finest).bit_length() - int(reso).bit_length())
    ncell = reso * reso
    cell_r = (cells >> shift).astype(jnp.int32)
    valid = mask & (cell_r < ncell)
    idx = jnp.where(valid, cell_r, 0)
    vec = segment_mean(o, idx, ncell, valid)       # (B, ncell, F) Morton order
    plane_out = morton_to_plane(vec, reso)
    c_out = jnp.where(mask[..., None], o, 0)
    return plane_out[..., :f], c_out


# --- differentiable public wrapper -----------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_level(plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
                reso, finest):
    """One fused ALTO level round trip on the chunk-aligned Morton layout.

    Args:
        plane: (B, R, R, F) NHWC feature plane (post-convs).
        c_last: (B, Npad, Fl) previous level's point features (pad rows 0).
        weights: (w_in, b_in, w_out, b_out, w_c, b_c) — fc_comm fc_in/fc_out
            and fc_c kernels/biases, compute dtype.
        aux: (B, NC, 2*PCHUNK) packed coords (make_aux_packed).
        cells_row: (B, NC, >=128) finest Morton ids (make_cells_row).
        ct / pt: (B, NC) chunk metadata (chunk_metadata).
        tmask: (B, R, R) empty-tile mask (empty_tile_mask).
        mask: (B, Npad) point validity.
        reso, finest: plane / layout resolutions (static).

    Returns:
        plane_out (B, R, R, F) — scatter-mean of the new point features
        (empty cells/tiles 0); c_out (B, Npad, F) — new point features
        (masked rows 0). Differentiable in plane, c_last and weights;
        backward is the fused chunk-grid kernel (level_bwd_kernel.py) by
        default, or the XLA composition's vjp with
        ``set_level_bwd_impl('ref')``.
    """
    f = weights[2].shape[-1]
    plane_out, c_out, _ = _fused_level_padded(
        plane, c_last, weights, aux, cells_row, ct, pt, mask, reso, finest)
    plane_out = jnp.where(tmask[..., None], plane_out[..., :f], 0)
    # c_out rows are masked IN-KERNEL (exact zeros on pad rows)
    return plane_out, c_out[..., :f]


def _fused_level_padded(plane, c_last, weights, aux, cells_row, ct, pt, mask,
                        reso, finest):
    """Pad to lane multiples and run the kernel; returns PADDED outputs plus
    the per-cell counts (B, T, 1, 256) the fused backward consumes."""
    plane_p = _pad_lanes(plane)
    weights_p = _pad_weights(weights, plane_p.shape[-1])
    clast_p = _pad_lanes(c_last)
    interpret = jax.default_backend() != "tpu"
    return _fused_level_impl(
        plane_p, aux, cells_row, make_mask_row(mask), clast_p, ct, pt,
        weights_p, reso, finest, interpret)


def _pad_weights(weights, fp):
    w_in, b_in, w_out, b_out, w_c, b_c = weights
    hp = ((w_in.shape[-1] + LANE - 1) // LANE) * LANE
    f = w_out.shape[-1]
    fpo = ((f + LANE - 1) // LANE) * LANE
    w_in = jnp.pad(w_in, ((0, fp - w_in.shape[0]), (0, hp - w_in.shape[1])))
    b_in = jnp.pad(b_in, ((0, hp - b_in.shape[0])))[None, :]
    w_out = jnp.pad(w_out, ((0, hp - w_out.shape[0]), (0, fpo - f)))
    b_out = jnp.pad(b_out, ((0, fpo - f)))[None, :]
    flp = ((w_c.shape[0] + LANE - 1) // LANE) * LANE
    w_c = jnp.pad(w_c, ((0, flp - w_c.shape[0]), (0, fpo - f)))
    b_c = jnp.pad(b_c, ((0, fpo - f)))[None, :]
    return w_in, b_in, w_out, b_out, w_c, b_c


def _xy_from_aux(aux):
    b, nc = aux.shape[0], aux.shape[1]
    x = aux[..., :PCHUNK].reshape(b, nc * PCHUNK)
    y = aux[..., PCHUNK:2 * PCHUNK].reshape(b, nc * PCHUNK)
    return jnp.stack([x, y], axis=-1)


# Backward implementation selector. 'fused' = the chunk-grid Pallas backward
# (level_bwd_kernel.py); 'ref' = the XLA reference composition's vjp (debug /
# numerical cross-check). Read at TRACE time: like blocks.FAST_CONV, call
# set_level_bwd_impl before the first jit compilation of a training step —
# already-compiled shapes keep the backend they were traced with.
_BWD_IMPL = "fused"


def set_level_bwd_impl(impl: str) -> None:
    global _BWD_IMPL
    assert impl in ("fused", "ref"), impl
    _BWD_IMPL = impl


def _fused_level_fwd(plane, c_last, weights, aux, cells_row, ct, pt, tmask,
                     mask, reso, finest):
    f = weights[2].shape[-1]
    plane_out, c_out, counts = _fused_level_padded(
        plane, c_last, weights, aux, cells_row, ct, pt, mask, reso, finest)
    plane_out = jnp.where(tmask[..., None], plane_out[..., :f], 0)
    out = (plane_out, c_out[..., :f])
    res = (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask, counts)
    return out, res


def _fused_level_bwd(reso, finest, res, g):
    plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask, counts = res
    g_plane, g_c = g
    dt = plane.dtype
    if _BWD_IMPL == "ref":
        xy = _xy_from_aux(aux)
        b, nc = cells_row.shape[0], cells_row.shape[1]
        cells = cells_row[..., :PCHUNK].reshape(b, nc * PCHUNK)

        def ref(p, cl, w):
            return _level_ref(p, cl, w, xy, cells, mask, reso, finest)

        _, vjp = jax.vjp(ref, plane, c_last, weights)
        dp, dcl, dw = vjp((g_plane.astype(dt), g_c.astype(dt)))
        return dp, dcl, dw, None, None, None, None, None, None

    from tomosar2height_tpu.ops.pallas.level_bwd_kernel import (
        fused_level_bwd_call,
        windows_to_plane,
    )

    w_in, b_in, w_out, b_out, w_c, b_c = weights
    plane_p = _pad_lanes(plane)
    weights_p = _pad_weights(weights, plane_p.shape[-1])
    clast_p = _pad_lanes(c_last)
    g_plane_p = _pad_lanes(g_plane.astype(dt))
    g_c_p = _pad_lanes(g_c.astype(dt))
    interpret = jax.default_backend() != "tpu"
    d_win, dcl_p, dwi, dbi, dwo, dbo, dwc = fused_level_bwd_call(
        plane_p, g_plane_p, counts, aux, cells_row, make_mask_row(mask),
        clast_p, g_c_p, weights_p, ct, pt, reso, finest, interpret)
    # slice the lane padding off BEFORE the overlap-add: the shift/fold
    # chains are pure data movement, so feeding them fp=128 lanes for a
    # 32-channel level quadruples their HBM traffic for nothing
    dp = windows_to_plane(d_win[..., :plane.shape[-1]], tmask, reso)
    dcl = dcl_p[..., :c_last.shape[-1]].astype(c_last.dtype)
    dw = (
        dwi[:w_in.shape[0], :w_in.shape[1]].astype(w_in.dtype),
        dbi[0, :b_in.shape[0]].astype(b_in.dtype),
        dwo[:w_out.shape[0], :w_out.shape[1]].astype(w_out.dtype),
        dbo[0, :b_out.shape[0]].astype(b_out.dtype),
        dwc[:w_c.shape[0], :w_c.shape[1]].astype(w_c.dtype),
        # b_c and b_out both add into o: identical gradients
        dbo[0, :b_c.shape[0]].astype(b_c.dtype),
    )
    return dp.astype(dt), dcl, dw, None, None, None, None, None, None


fused_level.defvjp(_fused_level_fwd, _fused_level_bwd)
