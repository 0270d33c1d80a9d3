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
         dtype: str = "float32", scan: int = 0, sorted_path: bool = False):
    from tomosar2height_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    from tomosar2height_tpu.ops.sorted_scatter import host_morton_bucket

    model = _flagship_model()
    if dtype != "float32":
        model = model.clone(dtype=jnp.dtype(dtype))
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(0.001, 0.999, (batch, n_points, 3)).astype(np.float32)
    mask_np = np.ones((batch, n_points), dtype=bool)
    if sorted_path:  # Morton-sorted alternative (slower on v5e; kept for A/B)
        RESO = 256
        cells_np = np.empty((batch, n_points), np.int32)
        offs_np = np.empty((batch, RESO * RESO + 1), np.int32)
        for i in range(batch):
            order, cells_np[i], offs_np[i] = host_morton_bucket(pts_np[i], mask_np[i], RESO)
            pts_np[i] = pts_np[i][order]
        cells = jnp.asarray(cells_np)
        offsets = jnp.asarray(offs_np)
    else:
        cells = offsets = None
    points = jnp.asarray(pts_np)
    mask = jnp.asarray(mask_np)

    init_key = jax.random.PRNGKey(0)
    params = model.init(init_key, points[:1, :256], mask[:1, :256], None)

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
        # Pipelined serving measurement: dispatch all batches asynchronously
        # (device executes them in order) and fetch ONE scalar at the end —
        # the fetch blocks until the final (and therefore every) batch is done.
        # block_until_ready is a no-op through the axon relay, but an actual
        # device->host value transfer is a true completion barrier.
        if scan > 1:
            # serving mode: K batches per dispatch via lax.map — amortizes the
            # per-call dispatch overhead of the remote runtime
            bc = lambda x: jnp.broadcast_to(x, (scan,) + x.shape)
            if cells is None:
                @jax.jit
                def fwd(params, sp, sm):
                    def one(a):
                        pa, _ = model.apply(params, a[0], a[1], None)
                        return pa.sum()
                    return jax.lax.map(one, (sp, sm)).sum()

                args = (params, bc(points), bc(mask))
            else:
                @jax.jit
                def fwd(params, sp, sm, sc, so):
                    def one(a):
                        pa, _ = model.apply(params, a[0], a[1], None, a[2], a[3])
                        return pa.sum()
                    return jax.lax.map(one, (sp, sm, sc, so)).sum()

                args = (params, bc(points), bc(mask), bc(cells), bc(offsets))
            per_call_tiles = batch * scan
        else:
            @jax.jit
            def fwd(params, points, mask, cells, offsets):
                pa, _ = model.apply(params, points, mask, None, cells, offsets)
                return pa.sum()

            args = (params, points, mask, cells, offsets)
            per_call_tiles = batch

        float(fwd(*args))  # compile + warmup
        float(fwd(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fwd(*args)
        float(out)  # completion barrier for the whole pipeline
        dt = time.perf_counter() - t0
        tiles_per_sec = per_call_tiles * iters / dt
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
    ap.add_argument("--scan", type=int, default=0,
                    help="batches per dispatch (serving mode)")
    ap.add_argument("--sorted", action="store_true",
                    help="Morton-sorted scatter path (A/B; slower on v5e)")
    a = ap.parse_args()
    main(a.batch, a.points, a.iters, a.train, a.dtype, a.scan, a.sorted)
