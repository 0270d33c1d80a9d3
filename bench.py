#!/usr/bin/env python
"""Benchmark: full-scene nDSM inference throughput on one chip (flagship model).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north star of 10 tiles/sec/chip for 512m x 512m
tiles (512^2 px output, 16k-point bucket) — vs_baseline = value / 10.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(batch: int = 4, n_points: int = 16384, iters: int = 20, train: bool = False,
         dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    if dtype != "float32":
        model = model.clone(dtype=jnp.dtype(dtype))
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.uniform(0.001, 0.999, (batch, n_points, 3)).astype(np.float32))
    mask = jnp.ones((batch, n_points), dtype=bool)

    init_key = jax.random.PRNGKey(0)
    small_pts = points[:1, :256]
    params = model.init(init_key, small_pts, mask[:1, :256], None)

    if train:
        from tomosar2height_tpu.parallel.mesh import make_mesh
        from tomosar2height_tpu.train.trainer import Trainer

        trainer = Trainer(model, {"optimize_every": 1}, use_cloud=True,
                          mesh=make_mesh(1), donate=True)
        batch_d = {
            "points": np.asarray(points), "point_mask": np.asarray(mask),
            "patch_valid": np.ones((batch,), bool),
            "dsm": rng.uniform(0, 30, (batch, 512, 512)).astype(np.float32),
        }
        state = trainer.init_state(init_key, batch_d)
        state = trainer.train_step(state, batch_d, 1e-4)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            # train_step fetches loss scalars to host -> real completion barrier
            state = trainer.train_step(state, batch_d, 1e-4)
        dt = time.perf_counter() - t0
        tiles_per_sec = batch * iters / dt
        metric = "train_patches_per_sec_per_chip"
    else:
        # scalar-reduced output with an explicit host fetch per call:
        # block_until_ready is unreliable through the axon relay (returns
        # immediately), so only a device->host transfer proves completion
        @jax.jit
        def fwd(params, points, mask):
            pa, _ = model.apply(params, points, mask, None)
            return pa.sum()

        float(fwd(params, points, mask))  # compile + warmup
        float(fwd(params, points, mask))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fwd(params, points, mask))
        dt = time.perf_counter() - t0
        tiles_per_sec = batch * iters / dt
        metric = "ndsm_tiles_per_sec_per_chip"

    print(json.dumps({
        "metric": metric,
        "value": round(tiles_per_sec, 3),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / 10.0, 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--dtype", default="float32")
    a = ap.parse_args()
    main(a.batch, a.points, a.iters, a.train, a.dtype)
