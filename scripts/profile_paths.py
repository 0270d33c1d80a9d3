#!/usr/bin/env python
"""Decisive A/B: full flagship forward, unsorted scatter vs Morton-sorted path,
plus a trivial-op floor measurement for the harness."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_forward import timed  # noqa: E402


def main(batch=4, n=16384, reso=256, reps=6, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from tomosar2height_tpu.ops.sorted_scatter import host_morton_bucket
    from __graft_entry__ import _flagship_model

    rng = np.random.default_rng(0)
    pts = rng.uniform(0.001, 0.999, (batch, n, 3)).astype(np.float32)
    mask = np.ones((batch, n), bool)
    cells = np.empty((batch, n), np.int32)
    offs = np.empty((batch, reso * reso + 1), np.int32)
    for i in range(batch):
        order, cells[i], offs[i] = host_morton_bucket(pts[i], mask[i], reso)
        pts[i] = pts[i][order]
    jp, jm = jnp.asarray(pts), jnp.asarray(mask)
    jc, jo = jnp.asarray(cells), jnp.asarray(offs)

    model = _flagship_model().clone(dtype=jnp.dtype(dtype))
    ek = dict(model.encoder_kwargs)
    model_pallas = model.clone(encoder_kwargs={**ek, "sorted_impl": "pallas"})
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jp[:1, :256], jm[:1, :256], None)

    print(f"batch={batch} n={n} reso={reso} dtype={dtype} reps={reps}")
    timed("harness floor (x+1)", lambda x: (x + 1.0).sum(), jp, reps=reps)
    timed("forward UNSORTED",
          lambda p, x, m: model.apply(p, x, m, None)[0].sum(), params, jp, jm, reps=reps)
    timed("forward SORTED cumsum",
          lambda p, x, m, c, o: model.apply(p, x, m, None, c, o)[0].sum(),
          params, jp, jm, jc, jo, reps=reps)
    timed("forward SORTED pallas",
          lambda p, x, m, c, o: model_pallas.apply(p, x, m, None, c, o)[0].sum(),
          params, jp, jm, jc, jo, reps=reps)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=6)
    a = ap.parse_args()
    main(reps=a.reps, dtype=a.dtype)
