"""Pallas TPU kernel: bilinear plane sampling at Morton-tiled point coords.

``grid_sample`` (reference alto.py:90-95) is the hottest gather in the model:
XLA lowers the four corner gathers of a 16k-point x 256^2-plane sample to
row-serialized dynamic-gathers (~7.4 ms measured, vs ~50 us of actual bytes).
This kernel reformulates it for the VPU/MXU using the chunk-aligned Morton
layout (ops/sorted_scatter.py:host_morton_bucket_aligned):

- each Morton tile (16x16 cells) owns a contiguous, CHUNK-aligned point range,
  and all of its points sample inside an 18-row x 32-col plane window around
  the tile (align_corners geometry: sample index floor(u*(R-1)) is within one
  cell of the Morton cell floor(u*R); the x-extent is widened to 32 so the
  window's column offset stays 8-aligned for Mosaic slicing);
- the grid iterates (batch, tile); the tile's window rows are DMA'd into VMEM
  (prefetched one tile ahead, double-buffered); each 128-point chunk builds a
  TRANSPOSED [WINDOW, CHUNK] 4-nonzero interpolation-weight matrix with VPU
  compares (point coords ride in the lane dim, so no transpose op exists
  anywhere), and the sample is one MXU contraction ``W_T^T @ window`` — a
  gather with zero gather instructions;
- outputs stream back to HBM per chunk with ping-pong staging buffers (tile
  ranges are chunk-aligned, so no two grid steps ever write the same row).

Mosaic layout contract: every HBM tensor the kernel slices has a lane
(minor-most) dim that is a multiple of 128 — the public wrapper pads feature
dims and slices the result back.

Border semantics match torch F.grid_sample(padding_mode='border',
align_corners=True): coords clamp to [0, R-1]; at the border the fractional
weight of the out-of-range neighbor is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_SIDE = 16    # spatial side of a Morton tile
CHUNK = 128       # points per inner matmul chunk (aligned layout quantum)
WIN_Y = 18        # window rows: tile + 1-cell halo each side
WIN_X = 32        # window cols: halo widened so the col offset is 8-aligned
WIN_FLAT = WIN_Y * WIN_X  # 576 flat window rows
LANE = 128


def _deinterleave_bits(v, bits: int, phase: int):
    """Every-other bit of v starting at ``phase`` (traced-int safe)."""
    out = v * 0
    for b in range(bits):
        out = out | (((v >> (2 * b + phase)) & 1) << b)
    return out


def _tile_window_origin(t, bits: int, reso: int):
    """Clamped top-left (wy, wx) of tile t's WIN_Y x WIN_X sampling window;
    wx is a multiple of 8 by construction (tx*16 - 8, clamped to 8-multiples)."""
    ty = _deinterleave_bits(t, bits, 1)
    tx = _deinterleave_bits(t, bits, 0)
    wy = jnp.clip(ty * TILE_SIDE - 1, 0, max(reso - WIN_Y, 0))
    wx = jnp.clip(tx * TILE_SIDE - 8, 0, max(reso - WIN_X, 0))
    # every clip operand is a multiple of 8, but Mosaic can't prove it through
    # the clip; the hint keeps (8,128)-tiled window slices legal
    return wy, pl.multiple_of(wx, 8)


def _gather_kernel(
    toff_ref,     # scalar-prefetch: (B, T+1) int32 chunk-aligned tile offsets
    plane_ref,    # HBM: (B, R, R, Fp) — Fp multiple of LANE
    auxx_ref,     # HBM: (B, NC, CHUNK) f32 — normalized x, chunk rows
    auxy_ref,     # HBM: (B, NC, CHUNK) f32 — normalized y
    out_ref,      # HBM: (B, Npad, Fp)
    win_ref,      # VMEM scratch: (2, WIN_FLAT, Fp) double-buffered windows
    ax_s,         # VMEM scratch: (2, 1, CHUNK)
    ay_s,         # VMEM scratch: (2, 1, CHUNK)
    stage_ref,    # VMEM scratch: (2, CHUNK, Fp) output staging
    pend_ref,     # SMEM scratch: (2,) int32 — outstanding out-DMA per slot
    sem_win,      # DMA sems: (2, WIN_Y)
    sem_ax,       # DMA sems: (2,)
    sem_ay,       # DMA sems: (2,)
    sem_out,      # DMA sems: (2,)
    *,
    reso: int,
    bits: int,
    n_batch: int,
    f32_precision: bool,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    step = b * nt + t
    wslot = step % 2

    def window_dma(bb, tt, slot, r):
        wy, wx = _tile_window_origin(tt, bits, reso)
        return pltpu.make_async_copy(
            plane_ref.at[bb, wy + r, pl.ds(wx, min(WIN_X, reso)), :],
            win_ref.at[slot, pl.ds(r * WIN_X, min(WIN_X, reso)), :],
            sem_win.at[slot, r],
        )

    @pl.when(step == 0)
    def _():
        # pad rows of the window scratch are never DMA'd; zero them once so
        # stale VMEM bits can't inject NaN*0 into the weight contraction
        win_ref[:] = jnp.zeros_like(win_ref)
        pend_ref[0] = 0
        pend_ref[1] = 0
        for r in range(WIN_Y):
            window_dma(b, t, wslot, r).start()

    # prefetch the NEXT tile's window into the other slot (its previous user —
    # grid step-1 — has already finished computing)
    b_next = b + jnp.where(t == nt - 1, 1, 0)
    t_next = jnp.where(t == nt - 1, 0, t + 1)

    @pl.when(b_next < n_batch)
    def _():
        for r in range(WIN_Y):
            window_dma(b_next, t_next, (step + 1) % 2, r).start()

    for r in range(WIN_Y):
        window_dma(b, t, wslot, r).wait()

    start = toff_ref[b, t]
    end = toff_ref[b, t + 1]
    k0 = start // CHUNK
    k1 = end // CHUNK
    wy, wx = _tile_window_origin(t, bits, reso)

    def aux_dma(k, slot):
        return (
            pltpu.make_async_copy(auxx_ref.at[b, pl.ds(k, 1), :],
                                  ax_s.at[slot], sem_ax.at[slot]),
            pltpu.make_async_copy(auxy_ref.at[b, pl.ds(k, 1), :],
                                  ay_s.at[slot], sem_ay.at[slot]),
        )

    @pl.when(k0 < k1)
    def _():
        for d in aux_dma(k0, k0 % 2):
            d.start()

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_FLAT, CHUNK), 0)
    prec = (jax.lax.Precision.HIGHEST if f32_precision
            else jax.lax.Precision.DEFAULT)

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < k1)
        def _():
            for d in aux_dma(k + 1, (k + 1) % 2):
                d.start()

        for d in aux_dma(k, slot):
            d.wait()
        xs = jnp.clip(ax_s[slot] * (reso - 1), 0.0, reso - 1)  # (1, CHUNK)
        ys = jnp.clip(ay_s[slot] * (reso - 1), 0.0, reso - 1)
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = xs - x0
        fy = ys - y0
        lx = x0.astype(jnp.int32) - wx
        ly = y0.astype(jnp.int32) - wy
        c00 = ly * WIN_X + lx  # (1, CHUNK) — broadcasts against row_iota
        w_t = (
            (row_iota == c00).astype(jnp.float32) * ((1 - fy) * (1 - fx))
            + (row_iota == c00 + 1).astype(jnp.float32) * ((1 - fy) * fx)
            + (row_iota == c00 + WIN_X).astype(jnp.float32) * (fy * (1 - fx))
            + (row_iota == c00 + WIN_X + 1).astype(jnp.float32) * (fy * fx)
        )
        # (WIN_FLAT, CHUNK)^T @ (WIN_FLAT, Fp) -> (CHUNK, Fp) on the MXU.
        # With a bf16 plane the one-hot bilinear weights are truncated to
        # bf16 for the contraction (sample positions quantize by ~2^-8) —
        # an accepted serving approximation (ADVICE r02); the bf16 fused
        # path is tolerance-gated against the XLA reference in
        # tests/test_fused_model.py / tests/test_fused_level.py.
        sampled = jax.lax.dot_general(
            w_t.astype(win_ref.dtype), win_ref[wslot],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

        oslot = k % 2

        @pl.when(pend_ref[oslot] == 1)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[oslot], out_ref.at[b, pl.ds(0, CHUNK), :],
                sem_out.at[oslot],
            ).wait()

        stage_ref[oslot] = sampled.astype(stage_ref.dtype)
        pltpu.make_async_copy(
            stage_ref.at[oslot], out_ref.at[b, pl.ds(k * CHUNK, CHUNK), :],
            sem_out.at[oslot],
        ).start()
        pend_ref[oslot] = 1
        return 0

    jax.lax.fori_loop(k0, k1, body, 0)

    # nothing may be in flight when the kernel retires
    @pl.when(step == n_batch * nt - 1)
    def _():
        for s in (0, 1):
            @pl.when(pend_ref[s] == 1)
            def _():
                pltpu.make_async_copy(
                    stage_ref.at[s], out_ref.at[b, pl.ds(0, CHUNK), :],
                    sem_out.at[s],
                ).wait()
                pend_ref[s] = 0


def _pad_lanes(x: jnp.ndarray) -> jnp.ndarray:
    f = x.shape[-1]
    fp = ((f + LANE - 1) // LANE) * LANE
    if fp == f:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, fp - f)])


def _tile_gather_impl(
    plane: jnp.ndarray,
    aux_x: jnp.ndarray,
    aux_y: jnp.ndarray,
    tile_offsets: jnp.ndarray,
    reso: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear-sample ``plane`` at chunk-aligned Morton-sorted point coords.

    Args:
        plane: (B, reso, reso, F) NHWC feature plane.
        aux_x / aux_y: (B, Npad // CHUNK, CHUNK) f32 normalized x / y in
            [0, 1], chunk rows (pad rows must hold finite coords, e.g. 0.5).
        tile_offsets: (B, ntiles + 1) int32 CHUNK-multiple row offsets at this
            resolution (coarsen_tile_offsets of the finest offsets).
        reso: plane resolution (multiple of TILE_SIDE, power of two, >= 32).

    Returns:
        (B, Npad, F) sampled features; rows past the last tile range are
        undefined (callers mask with the point mask).
    """
    b, nc, _ = aux_x.shape
    npad = nc * CHUNK
    f = plane.shape[-1]
    n_tiles = (reso // TILE_SIDE) ** 2
    assert tile_offsets.shape[-1] == n_tiles + 1
    assert reso >= WIN_X, f"reso {reso} below the {WIN_X}-col window"
    bits = (reso // TILE_SIDE).bit_length() - 1
    plane_p = _pad_lanes(plane)
    fp = plane_p.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_FLAT, fp), plane.dtype),
            pltpu.VMEM((2, 1, CHUNK), jnp.float32),
            pltpu.VMEM((2, 1, CHUNK), jnp.float32),
            pltpu.VMEM((2, CHUNK, fp), plane.dtype),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, WIN_Y)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _gather_kernel, reso=reso, bits=bits, n_batch=b,
        f32_precision=plane.dtype == jnp.float32,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npad, fp), plane.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_offsets, plane_p, aux_x, aux_y)
    return out[..., :f]


@functools.partial(jax.jit, static_argnames=("reso", "interpret"))
def _tile_gather_jit(plane, aux_x, aux_y, tile_offsets, reso, interpret):
    return _tile_gather_impl(plane, aux_x, aux_y, tile_offsets, reso, interpret)


def pallas_tile_gather(plane, aux_x, aux_y, tile_offsets, reso: int,
                       interpret: bool | None = None):
    """Public entry; off-TPU backends run the kernel in interpret mode so CPU
    tests exercise the identical program (slow but exact)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _tile_gather_jit(plane, aux_x, aux_y, tile_offsets, reso, interpret)
