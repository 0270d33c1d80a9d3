"""Measure the chunk-grid kernels' per-grid-step cost floor on the real chip.

The b8 serving trace (round 3) shows ~41 ms of the 77 ms step inside the
chunk-grid pallas kernels, consistent with ~0.5-1.3 us per grid step across
~20k steps (grid = batch x n_chunks per call, 14 calls). This bench isolates
what a step actually costs:

  empty    — body copies the point block through (machinery + block DMA)
  gather   — the pool2 gather-back body (one-hot MXU matmul per chunk)
  gather4  — FOUR sub-chunks per grid step: 4 cellv input refs with
             independent scalar-prefetch index maps (tiles are Morton-sorted,
             so each ref's index stream is monotone), one (4*PCHUNK) point-
             space out block. If machinery dominates, this runs ~4x fewer
             steps at ~the same per-step cost.
  gather4w — gather4 but the 4 one-hot matmuls are batched into ONE wide
             matmul against the 4 tiles' stacked cell values (256 x 1024).

Usage: python scripts/profile_gridstep.py [--b 8] [--nc 312] [--reps 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomosar2height_tpu.ops.pallas.level_kernel import LANE, PCHUNK, TILE_CELLS


def make_inputs(b, nc, n_tiles, fp, rng):
    # tile-of-chunk: non-decreasing, ~1.25 chunks per tile like the flagship
    ct = np.zeros((b, nc), np.int32)
    for i in range(b):
        tiles = np.sort(rng.choice(n_tiles, size=nc, replace=True))
        ct[i] = tiles
    cellv = rng.standard_normal((b, n_tiles, TILE_CELLS, fp)).astype(jnp.bfloat16)
    cl = LANE
    cells = np.zeros((b, nc, 1, cl), np.int32)
    for i in range(b):
        for k in range(nc):
            base = ct[i, k] * TILE_CELLS
            cells[i, k, 0, :PCHUNK] = base + np.sort(
                rng.integers(0, TILE_CELLS, PCHUNK))
    return jnp.asarray(ct), jnp.asarray(cellv), jnp.asarray(cells)


def _empty_kernel(ct_ref, cellv_ref, cells_ref, out_ref, *, n_tiles):
    out_ref[0] = cellv_ref[0, 0, :PCHUNK]


def _gather_kernel(ct_ref, cellv_ref, cells_ref, out_ref, *, n_tiles):
    b = pl.program_id(0)
    k = pl.program_id(1)
    t = ct_ref[b, k]

    @pl.when(t < n_tiles)
    def _():
        dt = out_ref.dtype
        cells = jax.lax.slice(cells_ref[0, 0], (0, 0), (1, PCHUNK))
        local = cells - t * TILE_CELLS
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_CELLS, PCHUNK), 0)
        m = (local == cell_iota).astype(dt)
        out_ref[0] = jax.lax.dot_general(
            m, cellv_ref[0, 0], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)


def _gather4_kernel(ct_ref, cv0, cv1, cv2, cv3, cells_ref, out_ref, *,
                    n_tiles, wide):
    b = pl.program_id(0)
    k = pl.program_id(1)
    dt = out_ref.dtype
    refs = (cv0, cv1, cv2, cv3)
    if wide:
        # one (4*PCHUNK, 4*TILE_CELLS) one-hot against stacked cell values
        stacked = jnp.concatenate([r[0, 0] for r in refs], axis=0)
        locs = []
        for j in range(4):
            t = ct_ref[b, 4 * k + j]
            cells = jax.lax.slice(cells_ref[0, j], (0, 0), (1, PCHUNK))
            local = cells - t * TILE_CELLS + j * TILE_CELLS
            locs.append(jnp.where(t < n_tiles, local, -1))
        local4 = jnp.concatenate(locs, axis=1)  # (1, 4*PCHUNK)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (4 * TILE_CELLS, 4 * PCHUNK), 0)
        m = (local4 == iota).astype(dt)
        out_ref[:] = jax.lax.dot_general(
            m, stacked, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
    else:
        for j in range(4):
            t = ct_ref[b, 4 * k + j]

            @pl.when(t < n_tiles)
            def _(j=j, t=t):
                cells = jax.lax.slice(cells_ref[0, j], (0, 0), (1, PCHUNK))
                local = cells - t * TILE_CELLS
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (TILE_CELLS, PCHUNK), 0)
                m = (local == iota).astype(dt)
                out_ref[j * PCHUNK:(j + 1) * PCHUNK] = jax.lax.dot_general(
                    m, refs[j][0, 0],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt)


def _refs_kernel(ct_ref, *refs, n_refs):
    # last ref is the out block; inputs stream per chunk
    out_ref = refs[-1]
    out_ref[0] = refs[0][0, 0, :PCHUNK]


def build_refs(n_refs, b, nc, n_tiles, fp):
    """Empty-body kernel with ``n_refs`` streaming input refs: isolates the
    per-ref block bookkeeping share of the ~1.2 us/step floor."""
    dt = jnp.bfloat16
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, PCHUNK, fp),
                         lambda b_, k_, *_: (b_, k_, 0, 0))
            for _ in range(n_refs)
        ],
        out_specs=pl.BlockSpec((1, PCHUNK, fp),
                               lambda b_, k_, *_: (b_, k_, 0)),
    )
    fn = pl.pallas_call(
        functools.partial(_refs_kernel, n_refs=n_refs),
        out_shape=jax.ShapeDtypeStruct((b, nc * PCHUNK, fp), dt),
        grid_spec=spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return fn


def bench_refs(n_refs, b, nc, n_tiles, fp, ct, reps):
    rng = np.random.default_rng(1)
    vals = jnp.asarray(
        rng.standard_normal((b, nc, PCHUNK, fp)).astype(jnp.bfloat16))
    fn = build_refs(n_refs, b, nc, n_tiles, fp)
    args = (ct,) + (vals,) * n_refs
    jfn = jax.jit(lambda *a: fn(*a))
    out = jfn(*args)
    out.block_until_ready()
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    steps = b * nc
    print(f"refs={n_refs}: {dt * 1e3:7.3f} ms/call  "
          f"{dt / steps * 1e6:6.3f} us/step")


def build(kind, b, nc, n_tiles, fp, cl):
    dt = jnp.bfloat16
    if kind in ("empty", "gather"):
        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nc),
            in_specs=[
                pl.BlockSpec((1, 1, TILE_CELLS, fp),
                             lambda b_, k_, ct_r: (
                                 b_, jnp.minimum(ct_r[b_, k_], n_tiles - 1),
                                 0, 0)),
                pl.BlockSpec((1, 1, 1, cl), lambda b_, k_, *_: (b_, k_, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, PCHUNK, fp),
                                   lambda b_, k_, *_: (b_, k_, 0)),
        )
        body = _empty_kernel if kind == "empty" else _gather_kernel
        fn = pl.pallas_call(
            functools.partial(body, n_tiles=n_tiles),
            out_shape=jax.ShapeDtypeStruct((b, nc * PCHUNK, fp), dt),
            grid_spec=spec,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
        return jax.jit(lambda ct, cv, cr: fn(ct, cv, cr))
    # gather4 variants
    wide = kind.endswith("w")
    ng = nc // 4

    def cv_spec(j):
        return pl.BlockSpec(
            (1, 1, TILE_CELLS, fp),
            lambda b_, k_, ct_r, j=j: (
                b_, jnp.minimum(ct_r[b_, 4 * k_ + j], n_tiles - 1), 0, 0))

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ng),
        in_specs=[cv_spec(0), cv_spec(1), cv_spec(2), cv_spec(3),
                  pl.BlockSpec((1, 4, 1, cl),
                               lambda b_, k_, *_: (b_, k_, 0, 0))],
        out_specs=pl.BlockSpec((4 * PCHUNK, fp),
                               lambda b_, k_, *_: (b_ * ng + k_, 0)),
    )
    fn = pl.pallas_call(
        functools.partial(_gather4_kernel, n_tiles=n_tiles, wide=wide),
        out_shape=jax.ShapeDtypeStruct((b * ng * 4 * PCHUNK, fp), dt),
        grid_spec=spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(lambda ct, cv, cr: fn(ct, cv, cv, cv, cv, cr))


def bench(kind, b, nc, n_tiles, fp, args, reps):
    fn = build(kind, b, nc, n_tiles, fp, LANE)
    out = fn(*args)
    out.block_until_ready()
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    steps = b * (nc if kind in ("empty", "gather") else nc // 4)
    chunks = b * nc
    print(f"{kind:9s}: {dt * 1e3:7.3f} ms/call  {dt / steps * 1e6:6.3f} us/step"
          f"  {dt / chunks * 1e6:6.3f} us/chunk")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--nc", type=int, default=312)
    ap.add_argument("--fp", type=int, default=128)
    ap.add_argument("--reps", type=int, default=30)
    a = ap.parse_args()
    from tomosar2height_tpu.utils import enable_compile_cache

    enable_compile_cache()
    n_tiles = 256
    nc = (a.nc // 4) * 4
    rng = np.random.default_rng(0)
    args = make_inputs(a.b, nc, n_tiles, a.fp, rng)
    print(f"grid=({a.b},{nc}) n_tiles={n_tiles} fp={a.fp} "
          f"device={jax.devices()[0].platform}")
    for kind in ("empty", "gather", "gather4", "gather4w"):
        bench(kind, a.b, nc, n_tiles, a.fp, args, a.reps)
    for n_refs in (1, 2, 4, 6):
        bench_refs(n_refs, a.b, nc, n_tiles, a.fp, args[0], a.reps)


if __name__ == "__main__":
    main()
