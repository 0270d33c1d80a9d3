#!/usr/bin/env python
"""Capture and categorize a device-op profile of the flagship forward or
train step (jax.profiler works through the axon tunnel; the trace.json.gz
carries per-HLO device durations with JAX source attribution).

Usage:
    python scripts/profile_trace.py [--train] [--dtype bfloat16] [--fused]
    python scripts/profile_trace.py --parse /tmp/jax_trace   # re-parse only
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def categorize(trace_dir: str, top: int = 25):
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    assert files, f"no trace.json.gz under {trace_dir}"
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if n and "TPU" in n}

    cat = collections.defaultdict(float)
    ops = collections.defaultdict(float)
    steps = 0
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        n = e.get("name", "")
        if n.startswith("jit_"):
            steps += 1
            total += e.get("dur", 0)
            continue
        src = str(e.get("args", {}).get("source_info")
                  or e.get("args", {}).get("tf_op") or "")
        d = e.get("dur", 0)
        if "pallas_call" in src and "conv" in src:
            c = "conv_pallas"
        elif "pallas_call" in src:
            c = "pallas_tile_kernels"
        elif "conv_general_dilated" in src:
            c = "conv_xla"
        elif "scatter" in src:
            c = "scatter"
        elif "gather" in src:
            c = "gather"
        elif "dot_general" in src:
            c = "dense/matmul"
        elif n.startswith("copy") or "transpose" in n:
            c = "copy/layout"
        elif n.startswith("pad") or "concatenate" in src:
            c = "pad/concat"
        elif "reduce_window" in src:
            c = "maxpool"
        else:
            c = "other"
        cat[c] += d
        ops[(c, src[:90] or n[:60])] += d

    steps = max(steps, 1)
    print(f"device total: {total/steps/1e3:.2f} ms/step over {steps} steps")
    for c, d in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {d/steps/1e3:8.2f} ms  {c}")
    print(f"\ntop {top} op groups:")
    for (c, s), d in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d/steps/1e3:8.3f} ms [{c}] {s}")


def capture(train: bool, dtype: str, fused: bool, out_dir: str, batch: int = 4,
            remat: bool = True):
    from tomosar2height_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    if dtype != "float32":
        model = model.clone(dtype=jnp.dtype(dtype))
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(0.001, 0.999, (batch, 16384, 3)).astype(np.float32)
    mask_np = np.ones((batch, 16384), bool)
    cells = offsets = None
    if fused:  # chunk-aligned Morton layout + the Pallas kernel path
        from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK
        from tomosar2height_tpu.ops.sorted_scatter import (
            aligned_bucket_size,
            host_morton_bucket_aligned,
        )

        from tomosar2height_tpu.data.pipeline import tile_cells_for_impl

        ek = dict(model.encoder_kwargs)
        ek["sorted_impl"] = fused if isinstance(fused, str) else "fused"
        model = model.clone(encoder_kwargs=ek)
        tc = tile_cells_for_impl(ek["sorted_impl"])
        npad = aligned_bucket_size(16384, 256, CHUNK, tc)
        apts = np.full((batch, npad, 3), 0.5, np.float32)
        amask = np.zeros((batch, npad), bool)
        acell = np.zeros((batch, npad), np.int32)
        atoff = np.zeros((batch, 256 * 256 // tc + 1), np.int32)
        for i in range(batch):
            a = host_morton_bucket_aligned(pts_np[i], mask_np[i], 256, CHUNK,
                                           tc)
            apts[i], amask[i], acell[i], atoff[i] = (
                a["points"], a["mask"], a["cells"], a["tile_offsets"])
        from tomosar2height_tpu.ops.sorted_scatter import trim_aligned_batch

        apts, amask, acell, atoff = trim_aligned_batch(apts, amask, acell, atoff)
        pts_np, mask_np = apts, amask
        cells = jnp.asarray(acell)
        offsets = jnp.asarray(atoff)
    pts = jnp.asarray(pts_np)
    mask = jnp.asarray(mask_np)

    if train:
        from tomosar2height_tpu.parallel.mesh import make_mesh
        from tomosar2height_tpu.train.trainer import Trainer

        model = model.clone(remat=remat)
        trainer = Trainer(model, {"optimize_every": 1}, use_cloud=True,
                          mesh=make_mesh(1), donate=False)
        batch = {"points": np.asarray(pts), "point_mask": np.asarray(mask),
                 "patch_valid": np.ones((batch,), bool),
                 "dsm": rng.uniform(0, 30, (batch, 512, 512)).astype(np.float32)}
        if cells is not None:  # without these the model silently falls back
            batch["cell"] = np.asarray(cells)  # to the unsorted plain path
            batch["cell_offsets"] = np.asarray(offsets)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state = trainer.train_step(state, batch, 1e-4)  # compile
        import jax.profiler

        with jax.profiler.trace(out_dir):
            for _ in range(3):
                state = trainer.train_step(state, batch, 1e-4)
            jax.block_until_ready(state.metric_acc)
            float(state.metric_acc[0])
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), pts[:1, :256],
                                     mask[:1, :256], None)

        @jax.jit
        def fwd(p, x, m, c, o):
            return model.apply(p, x, m, None, c, o)[0].sum()

        float(fwd(params, pts, mask, cells, offsets))
        import jax.profiler

        with jax.profiler.trace(out_dir):
            out = None
            for _ in range(3):
                out = fwd(params, pts, mask, cells, offsets)
            float(out)
    print("trace captured at", out_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fused", nargs="?", const="fused", default=False,
                    choices=["fused", "fused2"])
    ap.add_argument("--no-remat", action="store_true",
                    help="trace the no-remat step (bench.py --train config)")
    ap.add_argument("--parse", default=None, help="trace dir to re-parse")
    ap.add_argument("--out", default="/tmp/jax_trace_prof")
    a = ap.parse_args()
    if a.parse:
        categorize(a.parse)
    else:
        capture(a.train, a.dtype, a.fused, a.out, a.batch,
                remat=not a.no_remat)
        categorize(a.out)
