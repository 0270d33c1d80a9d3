"""Pallas TPU kernel: bilinear plane sampling at Morton-tiled point coords.

``grid_sample`` (reference alto.py:90-95) is the hottest gather in the model:
XLA lowers the four corner gathers of a 16k-point x 256^2-plane sample to
row-serialized dynamic-gathers (~7.4 ms measured, vs ~50 us of actual bytes).
This kernel reformulates it for the VPU/MXU using the chunk-aligned Morton
layout (ops/sorted_scatter.py:host_morton_bucket_aligned):

- each Morton tile (16x16 cells) owns a contiguous, CHUNK-aligned point range,
  and all of its points sample inside an 18x18 plane window around the tile
  (align_corners geometry: sample index floor(u*(R-1)) is within 1 cell of the
  Morton cell floor(u*R));
- the grid iterates (batch, tile); the tile's window rows are DMA'd into VMEM
  (prefetched one tile ahead, double-buffered), each 64-point chunk builds a
  [CHUNK, WINDOW] 4-nonzero interpolation-weight matrix with VPU compares, and
  the sample is one MXU matmul ``W @ window`` — a gather with zero gather
  instructions;
- outputs stream back to HBM per chunk with ping-pong staging buffers (tile
  ranges are chunk-aligned, so no two grid steps ever write the same row).

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
CHUNK = 64        # points per inner matmul chunk (aligned layout quantum)
WIN = 18          # window side: tile + 1-cell halo each side
WROW = 24         # window row pitch (multiple of 8 for aligned DMA offsets)
WIN_FLAT = 448    # padded flat window rows (WIN*WROW=432 -> next 8-multiple*)


def _deinterleave_bits(v, bits: int, phase: int):
    """Every-other bit of v starting at ``phase`` (traced-int safe)."""
    out = v * 0
    for b in range(bits):
        out = out | (((v >> (2 * b + phase)) & 1) << b)
    return out


def _tile_window_origin(t, bits: int, reso: int):
    """Clamped top-left (wy, wx) of tile t's WIN x WIN sampling window."""
    ty = _deinterleave_bits(t, bits, 1)
    tx = _deinterleave_bits(t, bits, 0)
    wy = jnp.clip(ty * TILE_SIDE - 1, 0, reso - WIN)
    wx = jnp.clip(tx * TILE_SIDE - 1, 0, reso - WIN)
    return wy, wx


def _gather_kernel(
    toff_ref,     # scalar-prefetch: (B, T+1) int32 chunk-aligned tile offsets
    plane_ref,    # HBM: (B, R, R, F)
    aux_ref,      # HBM: (B, Npad, 8) f32 — lanes 0/1 hold normalized x/y
    out_ref,      # HBM: (B, Npad, F)
    win_ref,      # VMEM scratch: (2, WIN_FLAT, F) double-buffered windows
    aux_s,        # VMEM scratch: (2, CHUNK, 8)
    stage_ref,    # VMEM scratch: (2, CHUNK, F) output staging
    pend_ref,     # SMEM scratch: (2,) int32 — outstanding out-DMA per slot
    sem_win,      # DMA sems: (2, WIN)
    sem_aux,      # DMA sems: (2,)
    sem_out,      # DMA sems: (2,)
    *,
    reso: int,
    bits: int,
    n_batch: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    step = b * nt + t
    wslot = step % 2

    def window_dma(bb, tt, slot, r):
        wy, wx = _tile_window_origin(tt, bits, reso)
        return pltpu.make_async_copy(
            plane_ref.at[bb, wy + r, pl.ds(wx, WIN), :],
            win_ref.at[slot, pl.ds(r * WROW, WIN), :],
            sem_win.at[slot, r],
        )

    @pl.when(step == 0)
    def _():
        # pad rows of the window scratch are never DMA'd; zero them once so
        # stale VMEM bits can't inject NaN*0 into the weight matmul
        win_ref[:] = jnp.zeros_like(win_ref)
        pend_ref[0] = 0
        pend_ref[1] = 0
        for r in range(WIN):
            window_dma(b, t, wslot, r).start()

    # prefetch the NEXT tile's window into the other slot (its previous user —
    # tile step-1 — has already finished computing)
    b_next = b + jnp.where(t == nt - 1, 1, 0)
    t_next = jnp.where(t == nt - 1, 0, t + 1)

    @pl.when(b_next < n_batch)
    def _():
        for r in range(WIN):
            window_dma(b_next, t_next, (step + 1) % 2, r).start()

    for r in range(WIN):
        window_dma(b, t, wslot, r).wait()

    start = toff_ref[b, t]
    end = toff_ref[b, t + 1]
    k0 = start // CHUNK
    k1 = end // CHUNK
    wy, wx = _tile_window_origin(t, bits, reso)

    def aux_dma(k, slot):
        return pltpu.make_async_copy(
            aux_ref.at[b, pl.ds(k * CHUNK, CHUNK), :],
            aux_s.at[slot],
            sem_aux.at[slot],
        )

    @pl.when(k0 < k1)
    def _():
        aux_dma(k0, k0 % 2).start()

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, WIN_FLAT), 1)
    f = plane_ref.shape[-1]

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < k1)
        def _():
            aux_dma(k + 1, (k + 1) % 2).start()

        aux_dma(k, slot).wait()
        a = aux_s[slot]
        xs = jnp.clip(a[:, 0:1] * (reso - 1), 0.0, reso - 1)
        ys = jnp.clip(a[:, 1:2] * (reso - 1), 0.0, reso - 1)
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = xs - x0
        fy = ys - y0
        lx = x0.astype(jnp.int32) - wx
        ly = y0.astype(jnp.int32) - wy
        c00 = ly * WROW + lx
        w = (
            (col_iota == c00).astype(jnp.float32) * ((1 - fy) * (1 - fx))
            + (col_iota == c00 + 1).astype(jnp.float32) * ((1 - fy) * fx)
            + (col_iota == c00 + WROW).astype(jnp.float32) * (fy * (1 - fx))
            + (col_iota == c00 + WROW + 1).astype(jnp.float32) * (fy * fx)
        )
        sampled = jax.lax.dot_general(
            w.astype(win_ref.dtype), win_ref[wslot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        oslot = k % 2

        @pl.when(pend_ref[oslot] == 1)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[oslot], out_ref.at[b, pl.ds(0, CHUNK), :],
                sem_out.at[oslot],
            ).wait()

        stage_ref[oslot] = sampled[:, :f].astype(stage_ref.dtype)
        pltpu.make_async_copy(
            stage_ref.at[oslot], out_ref.at[b, pl.ds(k * CHUNK, CHUNK), :],
            sem_out.at[oslot],
        ).start()
        pend_ref[oslot] = 1
        return 0

    jax.lax.fori_loop(k0, k1, body, 0)

    # drain outstanding writes before the final grid step retires (staging
    # scratch must not be reused by the next tile while a DMA is in flight is
    # handled by the pend/wait above; at the very end nothing may be pending)
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


@functools.partial(jax.jit, static_argnames=("reso", "interpret"))
def pallas_tile_gather(
    plane: jnp.ndarray,
    aux: jnp.ndarray,
    tile_offsets: jnp.ndarray,
    reso: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear-sample ``plane`` at chunk-aligned Morton-sorted point coords.

    Args:
        plane: (B, reso, reso, F) NHWC feature plane.
        aux: (B, Npad, 8) f32; lanes 0/1 are normalized x/y in [0, 1]
            (pad rows must hold finite coords, e.g. 0.5).
        tile_offsets: (B, ntiles + 1) int32 CHUNK-multiple row offsets at this
            resolution (coarsen_tile_offsets of the finest offsets).
        reso: plane resolution (multiple of TILE_SIDE, power of two).

    Returns:
        (B, Npad, F) sampled features; rows outside every tile range keep
        whatever the output buffer held (callers mask with the point mask).
    """
    b, npad, _ = aux.shape
    assert npad % CHUNK == 0
    f = plane.shape[-1]
    n_tiles = (reso // TILE_SIDE) ** 2
    assert tile_offsets.shape[-1] == n_tiles + 1
    bits = (reso // TILE_SIDE).bit_length() - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, WIN_FLAT, f), plane.dtype),
            pltpu.VMEM((2, CHUNK, 8), jnp.float32),
            pltpu.VMEM((2, CHUNK, f), plane.dtype),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, WIN)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_gather_kernel, reso=reso, bits=bits, n_batch=b)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npad, f), plane.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_offsets, plane, aux)
