"""Pallas TPU kernel: fused local pooling (scatter_max/mean + gather-back).

The reference's ``pool_local`` (pointnet.py:92-99) reduces per-point features
into their grid cell (max or mean) and immediately gathers the result back to
every point — two of the model's serialized XLA scatters/gathers per call, x4
calls per forward. This kernel fuses the round trip on the chunk-aligned
Morton layout (host_morton_bucket_aligned):

- pass 1 per tile: stream the tile's 128-point chunks; MEAN uses one-hot
  transpose matmuls (sum + count); MAX runs a sublane-axis SEGMENTED PREFIX
  SCAN — the point's Morton id rides along as an extra feature lane, so
  ``pltpu.roll`` + same-id masks give chunk-local run maxima in log2(CHUNK)
  VPU steps, and a run-END one-hot matmul extracts exactly one row per cell
  (sortedness makes "id[i] == id[i-s]" imply the whole range matches);
- pass 2 per tile: re-stream the cell-id rows and gather back per point with
  the transposed one-hot matmul; results DMA out per chunk.

Everything lands on the VPU/MXU; there is no scatter, no gather, and no
transpose instruction anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK, LANE

TILE_CELLS = 256


def _pool_kernel(
    toff_ref,    # scalar-prefetch: (B, T+1) int32 chunk-aligned tile offsets
    vext_ref,    # HBM: (B, Npad, Fp) — lane id_lane holds the Morton id (f32)
    cells_ref,   # HBM: (B, NC, CHUNK) int32 finest Morton ids
    out_ref,     # HBM: (B, Npad, Fp)
    acc_ref,     # VMEM scratch: (TILE_CELLS, Fp) f32 — max/sum accumulator
    cnt_ref,     # VMEM scratch: (TILE_CELLS, 1) f32 — presence/count
    vchunk,      # VMEM scratch: (2, CHUNK, Fp)
    cchunk,      # VMEM scratch: (2, 1, CHUNK) int32
    stage_ref,   # VMEM scratch: (2, CHUNK, Fp)
    pend_ref,    # SMEM scratch: (2,) int32
    sem_v, sem_c, sem_out,
    *,
    kind: str,          # 'max' | 'mean'
    id_lane: int,
    n_batch: int,
    f32_precision: bool,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    step = b * nt + t
    start = toff_ref[b, t]
    end = toff_ref[b, t + 1]
    k0 = start // CHUNK
    k1 = end // CHUNK

    @pl.when(step == 0)
    def _():
        pend_ref[0] = 0
        pend_ref[1] = 0

    if kind == "max":
        acc_ref[:] = jnp.full_like(acc_ref, -jnp.inf)
    else:
        acc_ref[:] = jnp.zeros_like(acc_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)

    tile_base = t * TILE_CELLS
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, CHUNK), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    prec = (jax.lax.Precision.HIGHEST if f32_precision
            else jax.lax.Precision.DEFAULT)

    def vdma(k, slot):
        return pltpu.make_async_copy(
            vext_ref.at[b, pl.ds(k * CHUNK, CHUNK), :], vchunk.at[slot],
            sem_v.at[slot])

    def cdma(k, slot):
        return pltpu.make_async_copy(
            cells_ref.at[b, pl.ds(k, 1), :], cchunk.at[slot], sem_c.at[slot])

    # ---- pass 1: reduce the tile's points into acc/cnt -------------------------
    @pl.when(k0 < k1)
    def _():
        vdma(k0, k0 % 2).start()
        cdma(k0, k0 % 2).start()

    def reduce_body(k, _):
        slot = k % 2

        @pl.when(k + 1 < k1)
        def _():
            vdma(k + 1, (k + 1) % 2).start()
            cdma(k + 1, (k + 1) % 2).start()

        vdma(k, slot).wait()
        cdma(k, slot).wait()
        v = vchunk[slot]                       # (CHUNK, Fp), id lane included
        ids_lane = cchunk[slot]                # (1, CHUNK) int32
        local = ids_lane - tile_base
        onehot_t = (local == cell_iota)        # (TILE_CELLS, CHUNK) bool

        if kind == "mean":
            m = onehot_t.astype(v.dtype)
            acc_ref[:] += jax.lax.dot_general(
                m, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            cnt_ref[:] += jnp.sum(onehot_t.astype(jnp.float32), axis=1)[:, None]
        else:
            # segmented inclusive prefix-max along sublanes; the id lane makes
            # per-row segment ids available without any transpose. The scan
            # runs in f32: tpu.dynamic_rotate only supports 32-bit lanes.
            ids_sub = v[:, id_lane:id_lane + 1].astype(jnp.float32)
            run = v.astype(jnp.float32)
            sh = 1
            while sh < CHUNK:
                same = (pltpu.roll(ids_sub, sh, 0) == ids_sub) & (sub_iota >= sh)
                run = jnp.where(same, jnp.maximum(run, pltpu.roll(run, sh, 0)),
                                run)
                sh *= 2
            run = run.astype(v.dtype)
            # chunk-local run ends: id changes at the next row (row CHUNK-1 is
            # always an end; pad rows end runs of the sentinel id harmlessly)
            nxt = pltpu.roll(ids_lane, CHUNK - 1, 1)  # circular shift by -1
            is_end = (ids_lane != nxt) | (lane_iota == CHUNK - 1)
            m_end = (onehot_t & is_end).astype(v.dtype)  # one row per cell
            chunkmax = jax.lax.dot_general(
                m_end, run, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            pres = jnp.sum(m_end.astype(jnp.float32), axis=1)[:, None]
            acc_ref[:] = jnp.where(pres > 0,
                                   jnp.maximum(acc_ref[:], chunkmax), acc_ref[:])
            cnt_ref[:] += pres
        return 0

    jax.lax.fori_loop(k0, k1, reduce_body, 0)

    if kind == "mean":
        cellvals = acc_ref[:] / jnp.maximum(cnt_ref[:], 1.0)
    else:
        # empty cells -> 0 (torch_scatter zero-init; unread by real points)
        cellvals = jnp.where(cnt_ref[:] > 0, acc_ref[:], 0.0)
    cellvals = cellvals.astype(vchunk.dtype)

    # ---- pass 2: gather cell values back to every point ------------------------
    @pl.when(k0 < k1)
    def _():
        cdma(k0, k0 % 2).start()

    def gather_body(k, _):
        slot = k % 2

        @pl.when(k + 1 < k1)
        def _():
            cdma(k + 1, (k + 1) % 2).start()

        cdma(k, slot).wait()
        local = cchunk[slot] - tile_base
        onehot_t = (local == cell_iota).astype(cellvals.dtype)
        gathered = jax.lax.dot_general(
            onehot_t, cellvals, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

        oslot = k % 2

        @pl.when(pend_ref[oslot] == 1)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[oslot], out_ref.at[b, pl.ds(0, CHUNK), :],
                sem_out.at[oslot]).wait()

        stage_ref[oslot] = gathered.astype(stage_ref.dtype)
        pltpu.make_async_copy(
            stage_ref.at[oslot], out_ref.at[b, pl.ds(k * CHUNK, CHUNK), :],
            sem_out.at[oslot]).start()
        pend_ref[oslot] = 1
        return 0

    jax.lax.fori_loop(k0, k1, gather_body, 0)

    @pl.when(step == n_batch * nt - 1)
    def _():
        for s in (0, 1):
            @pl.when(pend_ref[s] == 1)
            def _():
                pltpu.make_async_copy(
                    stage_ref.at[s], out_ref.at[b, pl.ds(0, CHUNK), :],
                    sem_out.at[s]).wait()
                pend_ref[s] = 0


def _pool_impl(values_ext, cells_chunked, tile_offsets, kind, id_lane,
               interpret):
    b, npad, fp = values_ext.shape
    assert fp % LANE == 0 and npad % CHUNK == 0
    n_tiles = tile_offsets.shape[-1] - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE_CELLS, fp), jnp.float32),
            pltpu.VMEM((TILE_CELLS, 1), jnp.float32),
            pltpu.VMEM((2, CHUNK, fp), values_ext.dtype),
            pltpu.VMEM((2, 1, CHUNK), jnp.int32),
            pltpu.VMEM((2, CHUNK, fp), values_ext.dtype),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _pool_kernel, kind=kind, id_lane=id_lane, n_batch=b,
        f32_precision=values_ext.dtype == jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npad, fp), values_ext.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_offsets, values_ext, cells_chunked)


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def _pool_jit(values, cells_chunked, tile_offsets, kind, interpret):
    from tomosar2height_tpu.ops.sorted_scatter import PAD_CELL_SENTINEL

    b, npad, f = values.shape
    cells = cells_chunked.reshape(b, npad)
    # append the WITHIN-TILE cell id (Morton low byte) as a feature lane: a
    # chunk never spans tiles, so 0..255 segments the runs, and 0..256 is
    # exact even in bfloat16 (global ids would need >8 mantissa bits);
    # padding rows get 256 so they can never continue a real cell's run
    local_id = jnp.where(cells == PAD_CELL_SENTINEL, 256, cells & 255)
    ext = jnp.concatenate(
        [values, local_id.astype(values.dtype)[..., None]], axis=-1)
    fp = ((ext.shape[-1] + LANE - 1) // LANE) * LANE
    if fp != ext.shape[-1]:
        ext = jnp.pad(ext, ((0, 0), (0, 0), (0, fp - ext.shape[-1])))
    out = _pool_impl(ext, cells_chunked, tile_offsets, kind, f, interpret)
    return out[..., :f]


def pallas_tile_pool(values, cells_chunked, tile_offsets, kind: str = "max",
                     interpret: bool | None = None):
    """Fused pool_local on the aligned layout: per-cell ``kind``-reduce then
    per-point gather-back. Rows past the last tile range are undefined
    (callers mask). Off-TPU backends run in interpret mode."""
    assert kind in ("max", "mean")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pool_jit(values, cells_chunked, tile_offsets, kind, interpret)
