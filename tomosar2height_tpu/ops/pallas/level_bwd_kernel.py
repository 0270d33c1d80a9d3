"""Pallas TPU kernel: the fused ALTO level round trip's BACKWARD pass.

Round 3 fused the forward level round trip (bilinear gather -> fc_comm MLP ->
fc_c skip -> scatter_mean; reference alto.py:97-138) into one chunk-grid
pallas_call (level_kernel.py), but its custom_vjp backward still ran the XLA
reference composition's vjp — so a fused2 training step cost fused-fwd +
ref-fwd + ref-bwd and lost to the plain path (RESULTS.md r3 training table).

This kernel computes the whole backward in ONE pallas_call with the same
chunk-grid structure (rematerialize-in-backward: the gather + MLP forward is
recomputed per chunk from the residual plane — 2 extra matmuls — instead of
saving per-point activations):

- grid over (batch, point-chunk); aux/cells/mask/c_last/g_c are auto-
  pipelined blocks exactly as in the forward;
- the plane-cotangent tile arrives as an auto-pipelined INPUT block (the
  forward's output index map reused), is permuted Morton-side and pre-scaled
  by 1/count (the scatter-mean transpose) once per tile into VMEM scratch;
  per-cell counts are a forward-kernel output (they depend only on the
  layout, not on any differentiated input);
- per chunk: recompute sampled/pre-activations, then
  d_o = (g_c + gather(g_plane/count)) * valid,
  d_h = d_o W_out^T, d_pre = d_h * (pre>0), d_s = d_pre W_in^T,
  d_cl = d_o W_c^T — all resident-weight MXU contractions;
- weight/bias gradients accumulate in f32 directly in REVISITED output
  blocks (constant index map -> VMEM-resident across the whole grid,
  written back once at the end);
- the plane gradient leaves the kernel as per-tile WIN_Y x WIN_X halo
  windows (the exact transpose of the forward's window gather, one
  ``w_t @ d_s`` per chunk into scratch, flushed per tile); the dense
  overlap-add back to (R, R) happens XLA-side in ~10 static pad/add ops
  (`windows_to_plane`) — window origins are canonicalized first so every
  tile's window sits at (ty*16-1, tx*16-8) and the fold is two shifted
  dense adds per axis.

Numerics mirror the forward: bf16 planes truncate the bilinear weights to
bf16 (the backward is then the exact transpose of the truncated forward);
f32 planes use HIGHEST-precision matmuls. Weight gradients accumulate and
return in f32 regardless (cast at the custom_vjp boundary).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomosar2height_tpu.ops.pallas.level_kernel import (
    LANE,
    N_SUB,
    PCHUNK,
    SUB_CELLS,
    SUB_SIDE,
    TILE_CELLS,
    TILE_SIDE,
    WIN_X,
    WIN_Y,
    _TILE_PERM_MAT,
    _deinterleave_bits,
    _tile_window_origin,
    _win_shape,
)


def _level_bwd_kernel(
    ct_ref,      # scalar-prefetch: (B, NC) int32 tile-of-chunk (== T for tail)
    pt_ref,      # scalar-prefetch: (B, NC) int32 next-tile-to-prefetch or -1
    plane_ref,   # HBM (ANY): (B, R, R, Fp) — residual, window-DMA'd per tile
    gtile_ref,   # VMEM block (1, TILE_SIDE, TILE_SIDE, Fp): plane cotangent tile
    cnt_ref,     # VMEM block (1, 1, 1, TILE_CELLS) f32: per-cell point counts
    aux_ref,     # VMEM block (1, 1, 1, 2*PCHUNK) f32: [x | y] packed coords
    cells_ref,   # VMEM block (1, 1, 1, CL) int32: finest Morton ids
    mrow_ref,    # VMEM block (1, 1, 1, CL) f32: point validity (1/0)
    clast_ref,   # VMEM block (1, PCHUNK, Flp): previous point features
    gc_ref,      # VMEM block (1, PCHUNK, Fp): c_out cotangent
    w_in_ref,    # VMEM (Fp, Hp)
    b_in_ref,    # VMEM (1, Hp)
    w_out_ref,   # VMEM (Hp, Fp)
    w_c_ref,     # VMEM (Flp, Fp)
    perm_ref,    # VMEM (TILE_CELLS, TILE_CELLS) f32
    dwin_ref,    # out block (1, 1, WIN_Y, WIN_X_r, Fp): plane-grad halo window
    dcl_ref,     # out block (1, PCHUNK, Flp): c_last gradient
    dwi_ref,     # out (Fp, Hp) f32 — revisited accumulator
    dbi_ref,     # out (1, Hp) f32
    dwo_ref,     # out (Hp, Fp) f32
    dbo_ref,     # out (1, Fp) f32
    dwc_ref,     # out (Flp, Fp) f32
    win_ref,     # scratch VMEM (2, WIN_Y, WIN_X_r, Fp)
    gsc_ref,     # scratch VMEM (TILE_CELLS, Fp) f32: g_plane tile, Morton/scaled
    dwacc_ref,   # scratch VMEM (WIN_FLAT, Fp) f32: window-grad accumulator
    slot_ref,    # scratch SMEM (1,) int32
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
    dt = dwin_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if f32_precision
            else jax.lax.Precision.DEFAULT)

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
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dbi_ref[:] = jnp.zeros_like(dbi_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)

    @pl.when(is_first)
    def _():
        slot_ref[0] = 1 - slot_ref[0]

    wslot = slot_ref[0]

    @pl.when(step0 & active)
    def _():
        window_dma(b, t, wslot).start()

    nt = pt_ref[b, k]

    @pl.when(nt >= 0)
    def _():
        window_dma(b, nt, 1 - wslot).start()

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
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)
        # scatter-mean transpose, hoisted per tile: Morton-permute the
        # cotangent tile (row-major -> Morton per 16x16 sub-tile quadrant,
        # the transpose of the forward's quad flush) and pre-divide by the
        # cell counts
        cnt = cnt_ref[0, 0]                      # (1, TILE_CELLS)
        recip = (1.0 / jnp.maximum(cnt, 1.0)).reshape(TILE_CELLS, 1)
        for j in range(N_SUB):
            sy, sx = (j >> 1) & 1, j & 1
            g_sub = gtile_ref[0,
                              sy * SUB_SIDE:(sy + 1) * SUB_SIDE,
                              sx * SUB_SIDE:(sx + 1) * SUB_SIDE].reshape(
                SUB_CELLS, gtile_ref.shape[-1])
            g_mor = jax.lax.dot_general(
                perm_ref[:], g_sub.astype(jnp.float32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            gsc_ref[j * SUB_CELLS:(j + 1) * SUB_CELLS] = (
                g_mor * jax.lax.slice(
                    recip, (j * SUB_CELLS, 0), ((j + 1) * SUB_CELLS, 1)))

    @pl.when(~active)
    def _():
        dcl_ref[0] = jnp.zeros_like(dcl_ref[0])

    @pl.when(active)
    def _():
        wy, wx = _tile_window_origin(t, bits, reso)

        # --- recompute the forward's gather + pre-activations ---------------
        aux = aux_ref[0, 0]
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
        c00 = ly * win_x + lx
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (win_y * win_x, PCHUNK), 0)
        w_t = (
            (row_iota == c00).astype(jnp.float32) * ((1 - fy) * (1 - fx))
            + (row_iota == c00 + 1).astype(jnp.float32) * ((1 - fy) * fx)
            + (row_iota == c00 + win_x).astype(jnp.float32) * (fy * (1 - fx))
            + (row_iota == c00 + win_x + 1).astype(jnp.float32) * (fy * fx)
        )
        w_t = w_t.astype(dt)                     # mirror the forward's dtype
        win = win_ref[wslot].reshape(win_y * win_x, win_ref.shape[-1])
        sampled = jax.lax.dot_general(
            w_t, win, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)                             # (PCHUNK, Fp)
        pre = jax.lax.dot_general(
            sampled, w_in_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt) + b_in_ref[:]
        # bf16 cmpf is unsupported on-target; f32 upcast is exact so the
        # mask is identical to the forward's max(pre, 0) support
        relu_m = (pre.astype(jnp.float32) > 0).astype(dt)
        h = pre * relu_m

        # --- d_o: c_out cotangent + scatter-mean transpose gather -----------
        cells = cells_ref[0, 0]
        cells = jax.lax.slice(cells, (0, 0), (1, PCHUNK))
        local = (cells >> shift) - t * TILE_CELLS
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, PCHUNK), 0)
        m = (local == cell_iota).astype(dt)      # sentinel rows match no cell
        g_pt = jax.lax.dot_general(
            m, gsc_ref[:].astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)                             # (PCHUNK, Fp)
        m_col = jax.lax.slice(mrow_ref[0, 0], (0, 0),
                              (1, PCHUNK)).reshape(PCHUNK, 1)
        d_o = (gc_ref[0] + g_pt) * m_col.astype(dt)

        # --- MLP transposes --------------------------------------------------
        d_h = jax.lax.dot_general(
            d_o, w_out_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt) * relu_m                    # (PCHUNK, Hp), post-relu
        d_s = jax.lax.dot_general(
            d_h, w_in_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)                             # (PCHUNK, Fp)
        dcl_ref[0] = jax.lax.dot_general(
            d_o, w_c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dcl_ref.dtype)

        # --- weight/bias gradients (f32 accumulators) ------------------------
        ones = jnp.ones((1, PCHUNK), dt)
        dwi_ref[:] += jax.lax.dot_general(
            sampled, d_h, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dbi_ref[:] += jax.lax.dot_general(
            ones, d_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dwo_ref[:] += jax.lax.dot_general(
            h, d_o, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dbo_ref[:] += jax.lax.dot_general(
            ones, d_o, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dwc_ref[:] += jax.lax.dot_general(
            clast_ref[0], d_o, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        # --- plane gradient: accumulate the halo window ----------------------
        dwacc_ref[:] += jax.lax.dot_general(
            w_t, d_s, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        t_next = jnp.where(k + 1 < nc, ct_ref[b, jnp.minimum(k + 1, nc - 1)], -1)

        @pl.when((k == nc - 1) | (t_next != t))
        def _():
            dwin_ref[0, 0] = dwacc_ref[:].reshape(
                win_y, win_x, -1).astype(dt)


def fused_level_bwd_call(plane, g_plane, counts, aux, cells_row, mask_row,
                         c_last, g_c, weights, ct, pt, reso: int, finest: int,
                         interpret: bool):
    """Run the backward kernel. All inputs pre-padded to lane multiples.

    Returns (d_win (B, T, WIN_Y, WIN_X_r, Fp) — per-tile halo windows,
    UNMASKED for unvisited tiles; d_clast (B, Npad, Flp); dw_in (Fp, Hp) f32;
    db_in (1, Hp); dw_out (Hp, Fp); db_out (1, Fp); dw_c (Flp, Fp)).
    ``db_c`` equals ``db_out`` (both biases add into o) and is not emitted.
    """
    w_in, b_in, w_out, _b_out, w_c, _b_c = weights
    b, r, _, fp = plane.shape
    nc = aux.shape[1]
    cl = cells_row.shape[-1]
    flp = c_last.shape[-1]
    hp = w_in.shape[-1]
    n_tiles = (reso // TILE_SIDE) ** 2
    bits = (reso // TILE_SIDE).bit_length() - 1
    shift = 2 * (int(finest).bit_length() - int(reso).bit_length())
    dt = plane.dtype
    win_y, win_x = _win_shape(r)

    def tile_index(b_, k_, ct_r, pt_r):
        t = jnp.minimum(ct_r[b_, k_], n_tiles - 1)
        ty = _deinterleave_bits(t, bits, 1)
        tx = _deinterleave_bits(t, bits, 0)
        return (b_, ty, tx, 0)

    def mtile_index(b_, k_, ct_r, pt_r):
        return (b_, jnp.minimum(ct_r[b_, k_], n_tiles - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # plane
            pl.BlockSpec((1, TILE_SIDE, TILE_SIDE, fp), tile_index),
            pl.BlockSpec((1, 1, 1, TILE_CELLS), mtile_index),     # counts
            pl.BlockSpec((1, 1, 1, 2 * PCHUNK),
                         lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, PCHUNK, flp), lambda b_, k_, *_: (b_, k_, 0)),
            pl.BlockSpec((1, PCHUNK, fp), lambda b_, k_, *_: (b_, k_, 0)),
            pl.BlockSpec((fp, hp), lambda *_: (0, 0)),            # w_in
            pl.BlockSpec((1, hp), lambda *_: (0, 0)),             # b_in
            pl.BlockSpec((hp, fp), lambda *_: (0, 0)),            # w_out
            pl.BlockSpec((flp, fp), lambda *_: (0, 0)),           # w_c
            pl.BlockSpec((SUB_CELLS, SUB_CELLS), lambda *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, win_y, win_x, fp),
                         lambda b_, k_, ct_r, pt_r: (
                             b_, jnp.minimum(ct_r[b_, k_], n_tiles - 1),
                             0, 0, 0)),
            pl.BlockSpec((1, PCHUNK, flp), lambda b_, k_, *_: (b_, k_, 0)),
            pl.BlockSpec((fp, hp), lambda *_: (0, 0)),
            pl.BlockSpec((1, hp), lambda *_: (0, 0)),
            pl.BlockSpec((hp, fp), lambda *_: (0, 0)),
            pl.BlockSpec((1, fp), lambda *_: (0, 0)),
            pl.BlockSpec((flp, fp), lambda *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, win_y, win_x, fp), dt),
            pltpu.VMEM((TILE_CELLS, fp), jnp.float32),
            pltpu.VMEM((win_y * win_x, fp), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _level_bwd_kernel, reso=reso, bits=bits, n_tiles=n_tiles, nb=b,
        shift=shift, f32_precision=dt == jnp.float32,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tiles, win_y, win_x, fp), dt),
            jax.ShapeDtypeStruct((b, nc * PCHUNK, flp), dt),
            jax.ShapeDtypeStruct((fp, hp), jnp.float32),
            jax.ShapeDtypeStruct((1, hp), jnp.float32),
            jax.ShapeDtypeStruct((hp, fp), jnp.float32),
            jax.ShapeDtypeStruct((1, fp), jnp.float32),
            jax.ShapeDtypeStruct((flp, fp), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ct, pt, plane, g_plane, counts, aux, cells_row, mask_row, c_last, g_c,
      w_in, b_in, w_out, w_c, jnp.asarray(_TILE_PERM_MAT, dt))
    return outs


def _shift_along(x, axis: int, amt: int):
    """Shift x by ``amt`` along ``axis`` (zero-fill, no wrap)."""
    n = x.shape[axis]
    pads = [(0, 0)] * x.ndim
    if amt >= 0:
        pads[axis] = (amt, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        return jnp.pad(x, pads)[tuple(sl)]
    pads[axis] = (0, -amt)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(-amt, n - amt)
    return jnp.pad(x, pads)[tuple(sl)]


def windows_to_plane(d_win, tmask, reso: int):
    """Overlap-add the per-tile halo windows back to a dense (R, R) plane.

    Args:
        d_win: (B, T, win_y, win_x, Fp) Morton-tile-ordered halo windows
            from :func:`fused_level_bwd_call` (unvisited tiles hold garbage).
        tmask: (B, R, R) bool nonempty-tile mask (uniform within each tile).
        reso: plane resolution R (R >= TILE_SIDE).

    The kernel writes each tile's window at its PHYSICAL clamped origin
    (wy, wx) = (clip(ty*32-1), clip(tx*32-8)); border tiles are first shifted
    to the CANONICAL unclamped origin (ty*32-1, tx*32-8), after which the
    fold is uniform: extent 34 = 32+2 rows (two shifted dense adds), extent
    48 = 32+16 cols (two shifted dense adds). Gradient content never lands
    outside the plane (forward sampling clamps coords to [0, R-1]).
    """
    from tomosar2height_tpu.ops.sorted_scatter import morton_to_plane

    b, t, wy_, wx_, fp = d_win.shape
    side = reso // TILE_SIDE
    assert t == side * side
    if side == 1:
        # reso == TILE_SIDE: one tile, window origin clamps to (0, 0) and
        # the window IS the plane — no fold needed
        assert (wy_, wx_) == (reso, reso)
        return d_win[:, 0] * tmask[..., None].astype(d_win.dtype)
    assert wy_ == WIN_Y and wx_ == WIN_X
    hy = WIN_Y - TILE_SIDE                       # 2 halo rows
    hx = WIN_X - TILE_SIDE                       # 16 halo cols (8-aligned)
    w = morton_to_plane(d_win.reshape(b, t, -1), side)
    w = w.reshape(b, side, side, wy_, wx_, fp)
    w = w * tmask[:, ::TILE_SIDE, ::TILE_SIDE, None, None, None]

    # canonicalize border-tile origins: ty=0 physical wy=0 vs canonical -1
    # (shift +1); ty=side-1 physical R-34 = ty*32-2 vs canonical ty*32-1
    # (shift -1); x analogously with +-8
    w = jnp.concatenate([
        _shift_along(w[:, :1], 3, 1), w[:, 1:-1],
        _shift_along(w[:, -1:], 3, -1)], axis=1)
    w = jnp.concatenate([
        _shift_along(w[:, :, :1], 4, 8), w[:, :, 1:-1],
        _shift_along(w[:, :, -1:], 4, -8)], axis=2)

    # fold y: padded row q covers plane row q-1; window rows 0..31 land at
    # q = ty*32+l, rows 32..33 at q = ty*32+32+l'
    w = w.transpose(0, 1, 3, 2, 4, 5)            # (B, sy, 34, sx, 48, Fp)
    ny = side * TILE_SIDE
    a = w[:, :, :TILE_SIDE].reshape(b, ny, side, wx_, fp)
    a = jnp.pad(a, ((0, 0), (0, hy), (0, 0), (0, 0), (0, 0)))
    bb = jnp.pad(w[:, :, TILE_SIDE:],
                 ((0, 0), (0, 0), (0, TILE_SIDE - hy), (0, 0), (0, 0), (0, 0)))
    bb = bb.reshape(b, ny, side, wx_, fp)[:, :ny - (TILE_SIDE - hy)]
    bb = jnp.pad(bb, ((0, 0), (TILE_SIDE, 0), (0, 0), (0, 0), (0, 0)))
    y = (a + bb)[:, 1:ny + 1]                    # (B, R, sx, 48, Fp)

    # fold x: padded col q covers plane col q-8; window cols 0..31 land at
    # q = tx*32+l, cols 32..47 at q = tx*32+32+l'
    a = y[:, :, :, :TILE_SIDE].reshape(b, ny, side * TILE_SIDE, fp)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, hx), (0, 0)))
    bb = jnp.pad(y[:, :, :, TILE_SIDE:],
                 ((0, 0), (0, 0), (0, 0), (0, TILE_SIDE - hx), (0, 0)))
    bb = bb.reshape(b, ny, side * TILE_SIDE, fp)
    bb = jnp.pad(bb, ((0, 0), (0, 0), (TILE_SIDE, 0), (0, 0)))[:, :, :ny + hx]
    x = (a + bb)[:, :, 8:ny + 8]
    return x
