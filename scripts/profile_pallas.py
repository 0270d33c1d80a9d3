#!/usr/bin/env python
"""A/B on TPU: Pallas one-hot-matmul scatter vs XLA segment_mean scatter."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_forward import timed  # noqa: E402


def main(batch=4, n=16384, reso=256, c=32, reps=16):
    import jax.numpy as jnp

    from tomosar2height_tpu.ops.pallas.scatter_kernel import pallas_scatter_mean
    from tomosar2height_tpu.ops.scatter import cell_index, segment_mean
    from tomosar2height_tpu.ops.sorted_scatter import host_morton_bucket, sorted_segment_mean

    rng = np.random.default_rng(0)
    pts = rng.uniform(0.001, 0.999, (batch, n, 3)).astype(np.float32)
    mask = np.ones((batch, n), bool)
    cells = np.empty((batch, n), np.int32)
    offs = np.empty((batch, reso * reso + 1), np.int32)
    for i in range(batch):
        order, cells[i], offs[i] = host_morton_bucket(pts[i], mask[i], reso)
        pts[i] = pts[i][order]
    feats = jnp.asarray(rng.normal(size=(batch, n, c)).astype(np.float32))
    jpts, jmask = jnp.asarray(pts), jnp.asarray(mask)
    jcells, joffs = jnp.asarray(cells), jnp.asarray(offs)
    idx = cell_index(jpts[..., :2], reso)
    ncell = reso * reso

    print(f"batch={batch} n={n} reso={reso} c={c} reps={reps}")
    timed("floor (x+1)", lambda f: (f + 1.0).sum(), feats, reps=reps)
    timed("XLA segment_mean",
          lambda f, i, m: segment_mean(f, i, ncell, m).sum(), feats, idx, jmask, reps=reps)
    timed("cumsum sorted_segment_mean",
          lambda f, o: sorted_segment_mean(f, o).sum(), feats, joffs, reps=reps)
    timed("PALLAS scatter_mean",
          lambda f, cc, o: pallas_scatter_mean(f, cc, o, reso).sum(),
          feats, jcells, joffs, reps=reps)
    # correctness on device
    import jax

    a = np.asarray(sorted_segment_mean(feats, joffs))
    b = np.asarray(pallas_scatter_mean(feats, jcells, joffs, reso))
    print("device parity max err:", float(np.abs(a - b).max()))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--reps", type=int, default=16)
    a = ap.parse_args()
    main(c=a.c, reps=a.reps)
