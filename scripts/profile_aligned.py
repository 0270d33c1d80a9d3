#!/usr/bin/env python
"""TPU A/B: chunk-aligned tile kernels vs XLA gathers/scatters at ALTO shapes."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_forward import timed  # noqa: E402


def main(batch=4, n=16384, finest=256, c=32, reps=16, check=True, dtype="float32"):
    import jax.numpy as jnp

    from tomosar2height_tpu.ops.pallas.fused import chunk_cells, make_aux
    from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK, pallas_tile_gather
    from tomosar2height_tpu.ops.pallas.scatter_kernel import (
        pallas_aligned_scatter_mean_plane,
    )
    from tomosar2height_tpu.ops.sampling import grid_sample_2d
    from tomosar2height_tpu.ops.scatter import cell_index, segment_mean
    from tomosar2height_tpu.ops.sorted_scatter import host_morton_bucket_aligned

    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.001, 0.999, (batch, n, 3)).astype(np.float32)
    mask = np.ones((batch, n), bool)
    packs = [host_morton_bucket_aligned(pts[i], mask[i], finest, CHUNK,
                                        tile_cells=256)
             for i in range(batch)]
    apts = jnp.asarray(np.stack([p["points"] for p in packs]))
    amask = jnp.asarray(np.stack([p["mask"] for p in packs]))
    acells = jnp.asarray(np.stack([p["cells"] for p in packs]))
    atoff = jnp.asarray(np.stack([p["tile_offsets"] for p in packs]))
    npad = apts.shape[1]
    aux_x, aux_y = make_aux(apts[..., :2])
    cch = chunk_cells(acells)
    print(f"batch={batch} n={n} npad={npad} finest={finest} reps={reps}")

    # unsorted baselines at n (not npad) for fairness
    jpts = jnp.asarray(pts)
    jmask = jnp.asarray(mask)
    idx = cell_index(jpts[..., :2], finest)

    for reso, f in [(256, 32), (256, 64), (128, 128), (64, 256), (32, 512)]:
        level = int(finest).bit_length() - int(reso).bit_length()
        toff_l = atoff[:, :: 4 ** level]
        feats = jnp.asarray(rng.normal(size=(batch, npad, f)).astype(np.float32), dt)
        plane = jnp.asarray(rng.normal(size=(batch, reso, reso, f)).astype(np.float32), dt)
        timed(f"XLA grid_sample {reso}^2 x{f}",
              lambda pl_, x: grid_sample_2d(pl_, x[..., :2]).sum(),
              plane, apts, reps=reps)
        timed(f"PALLAS tile_gather {reso}^2 x{f}",
              lambda pl_, ax, ay, t: pallas_tile_gather(pl_, ax, ay, t, reso).sum(),
              plane, aux_x, aux_y, toff_l, reps=reps)
        if reso == finest:
            featsn = jnp.asarray(rng.normal(size=(batch, n, f)).astype(np.float32), dt)
            timed(f"XLA segment_mean {reso}^2 x{f}",
                  lambda ff, i, m: segment_mean(ff, i, reso * reso, m).sum(),
                  featsn, idx, jmask, reps=reps)
        timed(f"PALLAS aligned_scatter {reso}^2 x{f}",
              lambda ff, cc, t: pallas_aligned_scatter_mean_plane(
                  ff, cc, t, reso, finest).sum(),
              feats, cch, toff_l, reps=reps)
        from tomosar2height_tpu.ops.pallas.scatter_kernel import (
            pallas_scatter_mean_plane_v3,
        )
        if reso >= 32:
            timed(f"PALLAS scatter_v3 {reso}^2 x{f}",
                  lambda ff, cc, t: pallas_scatter_mean_plane_v3(
                      ff, cc, t, reso, finest).sum(),
                  feats, cch, atoff, reps=reps)
        from tomosar2height_tpu.ops.pallas.pool_kernel import pallas_tile_pool
        if reso == finest:
            timed(f"PALLAS tile_pool max {reso}^2 x{f}",
                  lambda ff, cc, t: pallas_tile_pool(ff, cc, t, "max").sum(),
                  feats, cch, toff_l, reps=reps)
            timed(f"XLA pool_local_max {reso}^2 x{f}",
                  lambda ff, i, m: __import__("tomosar2height_tpu.ops.scatter",
                      fromlist=["pool_local_max"]).pool_local_max(
                      ff, i, reso, m).sum(),
                  jnp.asarray(rng.normal(size=(batch, n, f)).astype(np.float32), dt),
                  idx, jmask, reps=reps)

    if check:
        import jax

        from tomosar2height_tpu.ops.scatter import scatter_mean_to_plane

        f = 32
        feats = jnp.asarray(rng.normal(size=(batch, npad, f)).astype(np.float32))
        plane = jnp.asarray(rng.normal(size=(batch, finest, finest, f)).astype(np.float32))
        g_k = np.asarray(pallas_tile_gather(plane, aux_x, aux_y, atoff, finest))
        g_x = np.asarray(grid_sample_2d(plane, apts[..., :2]))
        m = np.asarray(amask)
        print("gather parity (device):", float(np.abs(g_k[m] - g_x[m]).max()))
        s_k = np.asarray(pallas_aligned_scatter_mean_plane(feats, cch, atoff,
                                                           finest, finest))
        s_x = np.asarray(scatter_mean_to_plane(apts[..., :2], feats, finest, amask))
        print("scatter parity (device):", float(np.abs(s_k - s_x).max()))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--dtype", default="float32")
    a = ap.parse_args()
    main(reps=a.reps, check=not a.no_check, dtype=a.dtype)
