#!/usr/bin/env python
"""Micro-profiles of the sorted vs unsorted point<->grid primitives on TPU."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_forward import timed  # noqa: E402


def main(batch=4, n=16384, reso=256, c=32, reps=6):
    import jax
    import jax.numpy as jnp

    from tomosar2height_tpu.ops.scatter import cell_index, pool_local_max, segment_mean
    from tomosar2height_tpu.ops.sorted_scatter import (
        gather_cells_sorted,
        host_morton_bucket,
        morton_perm,
        morton_to_plane,
        run_starts,
        sorted_segment_max,
        sorted_segment_mean,
        sorted_segment_sum_counts,
    )

    rng = np.random.default_rng(0)
    pts = rng.uniform(0.001, 0.999, (batch, n, 3)).astype(np.float32)
    mask = np.ones((batch, n), bool)
    cells = np.empty((batch, n), np.int32)
    offs = np.empty((batch, reso * reso + 1), np.int32)
    for i in range(batch):
        order, cells[i], offs[i] = host_morton_bucket(pts[i], mask[i], reso)
        pts[i] = pts[i][order]
    feats = jnp.asarray(rng.normal(size=(batch, n, c)).astype(np.float32))
    jpts = jnp.asarray(pts)
    jmask = jnp.asarray(mask)
    jcells = jnp.asarray(cells)
    joffs = jnp.asarray(offs)
    idx = cell_index(jpts[..., :2], reso)
    starts = run_starts(jcells)
    ncell = reso * reso
    vec = jnp.asarray(rng.normal(size=(batch, ncell, c)).astype(np.float32))
    perm = jnp.asarray(morton_perm(reso).astype(np.int32))

    print(f"batch={batch} n={n} reso={reso} c={c}")
    timed("UNSORTED segment_mean->plane",
          lambda f, i, m: segment_mean(f, i, ncell, m).sum(), feats, idx, jmask, reps=reps)
    timed("SORTED seg_mean (no plane)",
          lambda f, o: sorted_segment_mean(f, o).sum(), feats, joffs, reps=reps)
    timed("SORTED seg_mean + morton_to_plane",
          lambda f, o: morton_to_plane(sorted_segment_mean(f, o), reso).sum(),
          feats, joffs, reps=reps)
    timed("morton_to_plane alone",
          lambda v: morton_to_plane(v, reso).sum(), vec, reps=reps)
    timed("perm-gather alone",
          lambda v: jnp.take(v, perm, axis=1).sum(), vec, reps=reps)
    timed("cumsum alone",
          lambda f: jnp.cumsum(f, axis=1).sum(), feats, reps=reps)
    timed("UNSORTED pool_local_max",
          lambda f, i, m: pool_local_max(f, i, reso, m).sum(), feats, idx, jmask, reps=reps)
    timed("SORTED max-scan + gather",
          lambda f, o, s, cc: gather_cells_sorted(
              sorted_segment_max(f, o, s), cc).sum(),
          feats, joffs, starts, jcells, reps=reps)
    timed("SORTED max-scan alone",
          lambda f, o, s: sorted_segment_max(f, o, s).sum(),
          feats, joffs, starts, reps=reps)
    timed("gather_cells alone",
          lambda v, cc: gather_cells_sorted(v, cc).sum(), vec, jcells, reps=reps)


if __name__ == "__main__":
    main()
