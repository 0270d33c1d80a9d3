"""Chunk-grid local pooling: per-cell reduce + gather-back as two fully
auto-pipelined pallas_calls (successor of pool_kernel.py's tile-grid design).

``pool_local`` (reference pointnet.py:92-99) reduces every point's features
into its grid cell (max or mean) and gathers the cell value back to each
point — 4 calls per forward. The round-2 kernel iterated (batch, tile) with
manual per-chunk DMAs (~2 us/chunk floor); this version applies the
level_kernel.py lesson: iterate (batch, chunk) and let Mosaic pipeline every
block, leaving ZERO manual DMAs.

  - kernel 1 (reduce): grid (B, NC); value/cell chunk blocks stream in; the
    per-tile accumulator lives in scratch; the tile's cell-value block
    (1, 1, TILE_CELLS, Fp) is written once at the tile's last chunk
    (output-block revisiting, flushed on tile change). Empty cells emit 0
    (torch_scatter zero-init parity — and -inf would poison the gather's
    0 * -inf into NaN on the MXU).
  - kernel 2 (gather-back): grid (B, NC); the chunk's OWN tile cell-value
    block rides in as a revisited input block (resident across the tile's
    chunks); the gather is one one-hot MXU matmul per chunk.

Layout contract: host_morton_bucket_aligned + chunk_metadata's tile-of-chunk
array (tail chunks carry the sentinel n_tiles and are skipped; their output
rows are garbage and must be masked by the caller, same as every point-space
op in this layout).
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
)


def _reduce_kernel(
    ct_ref,     # scalar-prefetch: (B, NC) int32 tile-of-chunk (== T for tail)
    vals_ref,   # VMEM block (1, PCHUNK, Fp)
    cells_ref,  # VMEM block (1, 1, 1, CL) int32 finest Morton ids
    out_ref,    # VMEM out block (1, 1, TILE_CELLS, Fp) — cell values of tile
    acc_ref,    # scratch VMEM (TILE_CELLS, Fp) f32
    cnt_ref,    # scratch VMEM (TILE_CELLS, 1) f32
    *,
    n_tiles: int,
    kind: str,
    f32_precision: bool,
):
    b = pl.program_id(0)
    k = pl.program_id(1)
    nc = pl.num_programs(1)
    t = ct_ref[b, k]
    active = t < n_tiles
    t_prev = jnp.where(k > 0, ct_ref[b, jnp.maximum(k - 1, 0)], -1)
    is_first = active & ((k == 0) | (t_prev != t))

    @pl.when(is_first)
    def _():
        acc_ref[:] = jnp.full_like(acc_ref, -jnp.inf if kind == "max" else 0.0)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    @pl.when(active)
    def _():
        dt = out_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if f32_precision
                else jax.lax.Precision.DEFAULT)
        cells = jax.lax.slice(cells_ref[0, 0], (0, 0), (1, PCHUNK))
        local = cells - t * TILE_CELLS   # finest reso: no shift
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, PCHUNK), 0)
        m = (local == cell_iota)         # (TILE_CELLS, PCHUNK); sentinel -> 0
        v = vals_ref[0, 0]               # (PCHUNK, Fp)
        if kind == "max":
            # segmented prefix-max INSIDE the chunk (cells are sorted, so a
            # cell's points form a contiguous run): log2(PCHUNK) shifted maxes
            # gated by same-id masks; then ONE one-hot matmul of the run-END
            # rows extracts each cell's run max (a run cut by the chunk
            # boundary just contributes its partial max — the accumulator
            # maxes partials across chunks). All 2-D values: no VMEM blowup.
            vf = v.astype(jnp.float32)           # (PCHUNK, Fp)
            # sublane-oriented ids: (1, PCHUNK) int32 -> (PCHUNK, 1) is a
            # 32-bit minor-dim insertion (allowed); bool reshapes are NOT —
            # so every i1 mask is built in its final orientation
            ids_col = local.reshape(PCHUNK, 1)
            s = 1
            while s < PCHUNK:
                prev = jnp.pad(ids_col, ((s, 0), (0, 0)),
                               constant_values=-7)[:PCHUNK]
                v_sh = jnp.pad(vf, ((s, 0), (0, 0)),
                               constant_values=-jnp.inf)[:PCHUNK]
                vf = jnp.where(ids_col == prev, jnp.maximum(vf, v_sh), vf)
                s *= 2
            run_end = (local != jnp.pad(local, ((0, 0), (0, 1)),
                                        constant_values=-9)[:, 1:])  # (1, PCHUNK)
            m_end = (m & run_end).astype(jnp.float32)
            picked = jax.lax.dot_general(
                m_end, vf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            present = jnp.sum(m_end, axis=1)[:, None] > 0
            acc_ref[:] = jnp.maximum(acc_ref[:],
                                     jnp.where(present, picked, -jnp.inf))
        else:
            acc_ref[:] += jax.lax.dot_general(
                m.astype(dt), v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        cnt_ref[:] += jnp.sum(m.astype(jnp.float32), axis=1)[:, None]

        t_next = jnp.where(k + 1 < nc, ct_ref[b, jnp.minimum(k + 1, nc - 1)], -1)

        @pl.when((k == nc - 1) | (t_next != t))
        def _():
            nonempty = cnt_ref[:] > 0
            if kind == "max":
                cell = jnp.where(nonempty, acc_ref[:], 0.0)
            elif kind == "sum":
                cell = acc_ref[:]
            else:
                cell = acc_ref[:] / jnp.maximum(cnt_ref[:], 1.0)
            out_ref[0, 0] = cell.astype(dt)


def _gather_kernel(
    ct_ref,      # scalar-prefetch: (B, NC) int32
    cellv_ref,   # VMEM block (1, 1, TILE_CELLS, Fp) — own tile's cell values
    cells_ref,   # VMEM block (1, 1, 1, CL) int32
    out_ref,     # VMEM out block (1, PCHUNK, Fp)
    *,
    n_tiles: int,
    f32_precision: bool,
):
    b = pl.program_id(0)
    k = pl.program_id(1)
    t = ct_ref[b, k]

    @pl.when(t < n_tiles)
    def _():
        dt = out_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if f32_precision
                else jax.lax.Precision.DEFAULT)
        cells = jax.lax.slice(cells_ref[0, 0], (0, 0), (1, PCHUNK))
        local = cells - t * TILE_CELLS
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, PCHUNK), 0)
        m = (local == cell_iota).astype(dt)  # (TILE_CELLS, PCHUNK)
        out_ref[0] = jax.lax.dot_general(
            m, cellv_ref[0, 0], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)


def _pad_lanes(x):
    f = x.shape[-1]
    fp = ((f + LANE - 1) // LANE) * LANE
    if fp == f:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, fp - f)])


def chunkgrid_pool(values, cells_row, ct, n_tiles: int, kind: str,
                   interpret: bool | None = None):
    """Per-cell ``kind``-reduce + gather-back on the chunk-grid layout.

    Args:
        values: (B, Npad, F) point features (aligned layout).
        cells_row: (B, NC, 1, CL) finest Morton ids (make_cells_row).
        ct: (B, NC) int32 tile-of-chunk at the FINEST reso (chunk_metadata).
        n_tiles: number of Morton tiles at the finest resolution.
        kind: 'max' | 'mean'.

    Returns:
        (B, Npad, F) per-point pooled values; tail/pad rows undefined
        (callers mask), empty cells contribute 0.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _chunkgrid_pool_jit(values, cells_row, ct, n_tiles, kind, interpret)


def _gather_cells_call(cellv, cells_row, ct, n_tiles: int, interpret: bool):
    """Gather-back half only: per-point value of its cell from a
    (B, n_tiles, TILE_CELLS, Fp) Morton cell-value array (tail rows garbage)."""
    b, _, _, fp = cellv.shape
    nc = ct.shape[1]
    cl = cells_row.shape[-1]
    dt = cellv.dtype
    gather_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TILE_CELLS, fp),
                lambda b_, k_, ct_r: (b_, jnp.minimum(ct_r[b_, k_],
                                                      n_tiles - 1), 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, PCHUNK, fp),
                               lambda b_, k_, *_: (b_, k_, 0)),
        scratch_shapes=[],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, n_tiles=n_tiles,
                          f32_precision=dt == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((b, nc * PCHUNK, fp), dt),
        grid_spec=gather_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ct, cellv, cells_row)


@functools.partial(jax.jit, static_argnames=("n_tiles", "kind", "interpret"))
def _chunkgrid_pool_jit(values, cells_row, ct, n_tiles, kind, interpret):
    b, npad, f = values.shape
    nc = npad // PCHUNK
    cl = cells_row.shape[-1]
    values_p = _pad_lanes(values)
    fp = values_p.shape[-1]
    vals3 = values_p.reshape(b, nc, PCHUNK, fp)
    dt = values.dtype
    f32p = dt == jnp.float32

    reduce_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, PCHUNK, fp), lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE_CELLS, fp),
            lambda b_, k_, ct_r: (b_, jnp.minimum(ct_r[b_, k_], n_tiles - 1),
                                  0, 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE_CELLS, fp), jnp.float32),
            pltpu.VMEM((TILE_CELLS, 1), jnp.float32),
        ],
    )
    cellv = pl.pallas_call(
        functools.partial(_reduce_kernel, n_tiles=n_tiles, kind=kind,
                          f32_precision=f32p),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, TILE_CELLS, fp), dt),
        grid_spec=reduce_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ct, vals3, cells_row)

    out = _gather_cells_call(cellv, cells_row, ct, n_tiles, interpret)
    return out[..., :f]


# --- chunk-grid scatter-mean to plane (the encoder's initial plane emission) -----


def _scatter_plane_kernel(
    ct_ref,     # scalar-prefetch: (B, NC) int32
    vals_ref,   # VMEM block (1, 1, PCHUNK, Fp)
    cells_ref,  # VMEM block (1, 1, 1, CL) int32
    perm_ref,   # VMEM (SUB_CELLS, SUB_CELLS) f32 Morton->row-major one-hot
    out_ref,    # VMEM out block (1, TILE_SIDE, TILE_SIDE, Fp)
    cntout_ref,  # VMEM out block (1, 1, 1, TILE_CELLS) f32: per-cell counts
    acc_ref,    # scratch VMEM (TILE_CELLS, Fp) f32
    cnt_ref,    # scratch VMEM (1, TILE_CELLS) f32
    *,
    n_tiles: int,
    f32_precision: bool,
):
    from tomosar2height_tpu.ops.pallas.level_kernel import TILE_SIDE

    b = pl.program_id(0)
    k = pl.program_id(1)
    nc = pl.num_programs(1)
    t = ct_ref[b, k]
    active = t < n_tiles
    t_prev = jnp.where(k > 0, ct_ref[b, jnp.maximum(k - 1, 0)], -1)

    @pl.when(active & ((k == 0) | (t_prev != t)))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    @pl.when(active)
    def _():
        dt = out_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if f32_precision
                else jax.lax.Precision.DEFAULT)
        cells = jax.lax.slice(cells_ref[0, 0], (0, 0), (1, PCHUNK))
        local = cells - t * TILE_CELLS
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, PCHUNK), 0)
        m = (local == cell_iota).astype(dt)
        acc_ref[:] += jax.lax.dot_general(
            m, vals_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # lane-oriented counts (matmul, as in level_kernel): consumed by the
        # fused backward's scatter-mean transpose without a transpose
        cnt_ref[:] += jax.lax.dot_general(
            jnp.ones((1, PCHUNK), dt), m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        t_next = jnp.where(k + 1 < nc, ct_ref[b, jnp.minimum(k + 1, nc - 1)], -1)

        @pl.when((k == nc - 1) | (t_next != t))
        def _():
            cntout_ref[0, 0] = cnt_ref[:]
            mean = acc_ref[:] / jnp.maximum(cnt_ref[:].reshape(TILE_CELLS, 1),
                                            1.0)
            # Morton -> row-major per 16x16 SUB-tile quadrant (level_kernel
            # flush pattern); sub-tile j's quadrant is (x=j&1, y=j>>1)
            for j in range(N_SUB):
                sub = jax.lax.slice(
                    mean, (j * SUB_CELLS, 0),
                    ((j + 1) * SUB_CELLS, mean.shape[1]))
                rm = jax.lax.dot_general(
                    perm_ref[:], sub,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                sy, sx = (j >> 1) & 1, j & 1
                out_ref[0,
                        sy * SUB_SIDE:(sy + 1) * SUB_SIDE,
                        sx * SUB_SIDE:(sx + 1) * SUB_SIDE] = rm.reshape(
                    SUB_SIDE, SUB_SIDE, -1).astype(dt)


@functools.partial(jax.jit, static_argnames=("reso", "interpret"))
def _scatter_plane_jit(values, cells_row, ct, tmask, reso, interpret):
    from tomosar2height_tpu.ops.pallas.level_kernel import (
        _TILE_PERM_MAT,
        TILE_SIDE,
        _deinterleave_bits,
    )

    b, npad, f = values.shape
    nc = npad // PCHUNK
    cl = cells_row.shape[-1]
    n_tiles = (reso // TILE_SIDE) ** 2
    bits = (reso // TILE_SIDE).bit_length() - 1
    values_p = _pad_lanes(values)
    fp = values_p.shape[-1]
    vals3 = values_p.reshape(b, nc, PCHUNK, fp)
    dt = values.dtype

    def out_index(b_, k_, ct_r):
        t = jnp.minimum(ct_r[b_, k_], n_tiles - 1)
        return (b_, _deinterleave_bits(t, bits, 1),
                _deinterleave_bits(t, bits, 0), 0)

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, PCHUNK, fp), lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
            pl.BlockSpec((SUB_CELLS, SUB_CELLS), lambda *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_SIDE, TILE_SIDE, fp), out_index),
            pl.BlockSpec((1, 1, 1, TILE_CELLS),
                         lambda b_, k_, ct_r: (
                             b_, jnp.minimum(ct_r[b_, k_], n_tiles - 1),
                             0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_CELLS, fp), jnp.float32),
            pltpu.VMEM((1, TILE_CELLS), jnp.float32),
        ],
    )
    out, counts = pl.pallas_call(
        functools.partial(_scatter_plane_kernel, n_tiles=n_tiles,
                          f32_precision=dt == jnp.float32),
        out_shape=[
            jax.ShapeDtypeStruct((b, reso, reso, fp), dt),
            jax.ShapeDtypeStruct((b, n_tiles, 1, TILE_CELLS), jnp.float32),
        ],
        grid_spec=spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ct, vals3, cells_row, jnp.asarray(_TILE_PERM_MAT, dt))
    return jnp.where(tmask[..., None], out[..., :f], 0), counts


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def scatter_plane2(values, cells_row, ct, tmask, mask, reso):
    """Chunk-grid scatter-mean -> row-major NHWC plane (B, reso, reso, F):
    the encoder's plane emission (reference pointnet.py:101-111) with the
    level-kernel iteration pattern. Empty tiles zeroed by ``tmask``."""
    interpret = jax.default_backend() != "tpu"
    out, _ = _scatter_plane_jit(values, cells_row, ct, tmask, reso, interpret)
    return out


def _scatter_plane2_ref(values, cells_row, mask, reso):
    from tomosar2height_tpu.ops.scatter import segment_mean
    from tomosar2height_tpu.ops.sorted_scatter import morton_to_plane

    b = values.shape[0]
    cells = cells_row[..., :PCHUNK].reshape(b, -1)
    ncell = reso * reso
    valid = mask & (cells < ncell)
    idx = jnp.where(valid, cells, 0)
    vec = segment_mean(values, idx, ncell, valid)
    return morton_to_plane(vec, reso)


def _scatter_plane2_fwd(values, cells_row, ct, tmask, mask, reso):
    interpret = jax.default_backend() != "tpu"
    out, counts = _scatter_plane_jit(values, cells_row, ct, tmask, reso,
                                     interpret)
    return out, (values, cells_row, ct, mask, counts)


def _scatter_plane2_bwd(reso, res, g):
    values, cells_row, ct, mask, counts = res
    dt = values.dtype
    from tomosar2height_tpu.ops.pallas import level_kernel as _lk

    if _lk._BWD_IMPL == "ref":
        _, vjp = jax.vjp(
            lambda v: _scatter_plane2_ref(v, cells_row, mask, reso), values)
        (dv,) = vjp(g.astype(dt))
        return dv, None, None, None, None

    # scatter-mean transpose as ONE gather-back kernel: d_v[i] =
    # g_plane[cell_i] / count[cell_i] for valid points. Full-plane Morton
    # order factors as (tile Morton, in-tile Morton), so the reshape below
    # yields exactly the gather kernel's cell-value layout.
    from tomosar2height_tpu.ops.sorted_scatter import plane_to_morton

    interpret = jax.default_backend() != "tpu"
    from tomosar2height_tpu.ops.pallas.level_kernel import TILE_SIDE as _TS
    b = g.shape[0]
    n_tiles = (reso // _TS) ** 2
    f = values.shape[-1]
    g_m = plane_to_morton(g.astype(dt)).reshape(b, n_tiles, TILE_CELLS, f)
    g_m = _pad_lanes(g_m)
    scale = (1.0 / jnp.maximum(counts, 1.0)).reshape(
        b, n_tiles, TILE_CELLS, 1)
    dv = _gather_cells_call((g_m * scale).astype(dt), cells_row, ct, n_tiles,
                            interpret)[..., :f]
    dv = jnp.where(mask[..., None], dv, 0).astype(dt)
    return dv, None, None, None, None


scatter_plane2.defvjp(_scatter_plane2_fwd, _scatter_plane2_bwd)


# --- differentiable wrapper (masked; vjp = XLA segment composition) --------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pool2(values, cells_row, ct, mask, n_tiles, kind):
    """Masked pool_local on the chunk-grid layout (fast path of
    reference pointnet.py:92-99). Differentiable in ``values``."""
    out = chunkgrid_pool(values, cells_row, ct, n_tiles, kind)
    return jnp.where(mask[..., None], out, 0).astype(values.dtype)


def _pool2_ref(values, cells_row, mask, n_tiles, kind):
    from tomosar2height_tpu.ops.scatter import segment_max, segment_mean
    from tomosar2height_tpu.ops.sorted_scatter import gather_cells_sorted

    b = values.shape[0]
    cells = cells_row[..., :PCHUNK].reshape(b, -1)
    ncell = n_tiles * TILE_CELLS
    valid = mask & (cells < ncell)
    idx = jnp.where(valid, cells, 0)
    if kind == "max":
        pooled = segment_max(values, idx, ncell, valid)
    else:
        pooled = segment_mean(values, idx, ncell, valid)
    out = gather_cells_sorted(pooled, idx)
    return jnp.where(mask[..., None], out, 0)


def _pool2_fwd(values, cells_row, ct, mask, n_tiles, kind):
    out = pool2(values, cells_row, ct, mask, n_tiles, kind)
    return out, (values, cells_row, ct, mask, out)


def _pool2_bwd(n_tiles, kind, res, g):
    values, cells_row, ct, mask, out = res
    dt = values.dtype
    from tomosar2height_tpu.ops.pallas import level_kernel as _lk

    if _lk._BWD_IMPL == "ref":
        _, vjp = jax.vjp(
            lambda v: _pool2_ref(v, cells_row, mask, n_tiles, kind), values)
        (dv,) = vjp(g.astype(dt))
        return dv, None, None, None

    # pool_local transposes stay on the chunk-grid kernels:
    #   mean: out_i = (1/n_c) sum_{j in c} v_j  =>  d_v[k] =
    #     (1/n_c) sum_{i in c} g_i  — self-adjoint, one more mean pool;
    #   max: d_v[k] = [v_k == M_c] * sum_{i in c} g_i (every tie gets the
    #     full cell gradient, matching jnp reduce-max vjp semantics), with
    #     M_c gathered per point == the saved forward output.
    g_m = jnp.where(mask[..., None], g.astype(dt), 0)
    if kind == "mean":
        dv = chunkgrid_pool(g_m, cells_row, ct, n_tiles, "mean")
    else:
        cell_sum = chunkgrid_pool(g_m, cells_row, ct, n_tiles, "sum")
        tie = (values.astype(jnp.float32) == out.astype(jnp.float32))
        dv = jnp.where(tie, cell_sum, 0)
    dv = jnp.where(mask[..., None], dv, 0).astype(dt)
    return dv, None, None, None


pool2.defvjp(_pool2_fwd, _pool2_bwd)
