#!/usr/bin/env python
"""Whole-step MFU accounting for the headline benchmarks (VERDICT r04 item 6).

MFU = algorithmic FLOPs x measured throughput / chip peak. Two stages:

1. ``--count`` (CPU, runs anywhere): compile the flagship serving forward and
   the training step on the PLAIN XLA path and read XLA's own FLOP estimate
   (``compiled.cost_analysis()['flops']``). The plain path is used because a
   ``pallas_call`` is a black box to the cost model — and algorithmic FLOPs
   (what the math needs, not what a kernel happens to execute) is the right
   numerator for MFU anyway. Writes ``.bench/mfu_flops.json``.

2. ``--mfu`` (needs the counts + measured numbers): combine with throughput
   [tiles/s or patches/s] and the chip's peak [TF/s] (measured MXU rate from
   scripts/profile_roofline.py, or the v5e datasheet 197 TF/s bf16) into the
   MFU lines for RESULTS.md.

Usage:
    JAX_PLATFORMS=cpu python scripts/mfu_accounting.py --count
    python scripts/mfu_accounting.py --mfu --serving 109.1 --train 37.3 \
        --peak-tfs 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

OUT = os.path.join(HERE, "..", ".bench", "mfu_flops.json")


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns one dict per program
        ca = ca[0]
    return float(ca["flops"])


def count(batch: int = 8, n_points: int = 16384) -> dict:
    import jax

    try:
        # JAX_PLATFORMS=cpu is rewritten by the axon site hook; force CPU
        # before backend init so counting never touches the (single-client)
        # TPU tunnel. FLOP counts are backend-independent (algorithmic).
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_model

    model = _flagship_model()  # cloud-only flagship (the headline configs)
    model_img = _flagship_model(use_image=True)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0.001, 0.999, (batch, n_points, 3))
                      .astype(np.float32))
    mask = jnp.ones((batch, n_points), bool)
    img = jnp.asarray(rng.normal(size=(batch, 512, 512, 3)).astype(np.float32))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), pts[:1, :256],
                           mask[:1, :256], None))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    params_img = jax.eval_shape(
        lambda: model_img.init(jax.random.PRNGKey(0), pts[:1, :256],
                               mask[:1, :256], img[:1]))
    params_img = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                              params_img)

    def fwd(p, x, m):
        return model.apply(p, x, m, None)[0].sum()

    def fwd_img(p, x, m, im):
        return model_img.apply(p, x, m, im)[0].sum()

    def train_step(p, x, m, dsm):
        def loss(p):
            pa, _ = model.apply(p, x, m, None)
            return jnp.abs(pa[..., 0] - dsm).mean()

        l, g = jax.value_and_grad(loss)(p)
        return l, g

    dsm = jnp.zeros((batch, 512, 512), jnp.float32)
    out = {
        "batch": batch, "n_points": n_points,
        "serving_flops_per_tile":
            _flops(jax.jit(fwd).lower(params, pts, mask).compile()) / batch,
        "serving_image_flops_per_tile":
            _flops(jax.jit(fwd_img).lower(params_img, pts, mask, img)
                   .compile()) / batch,
        "train_flops_per_patch":
            _flops(jax.jit(train_step).lower(params, pts, mask, dsm)
                   .compile()) / batch,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return out


def mfu(serving: float | None, train: float | None, image: float | None,
        peak_tfs: float):
    with open(OUT) as f:
        c = json.load(f)
    peak = peak_tfs * 1e12
    rows = []
    if serving:
        f_t = c["serving_flops_per_tile"]
        rows.append(("serving (cloud)", serving, "tiles/s", f_t))
    if image:
        f_t = c["serving_image_flops_per_tile"]
        rows.append(("serving (cloud+image)", image, "tiles/s", f_t))
    if train:
        f_t = c["train_flops_per_patch"]
        rows.append(("training", train, "patches/s", f_t))
    print(f"chip peak used: {peak_tfs:.1f} TF/s (bf16)")
    for name, thr, unit, fl in rows:
        achieved = thr * fl
        print(f"{name:>22}: {thr:7.1f} {unit} x {fl/1e9:7.2f} GFLOP "
              f"= {achieved/1e12:6.2f} TF/s -> MFU {100*achieved/peak:5.2f}%")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--mfu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--serving", type=float, default=None,
                    help="measured serving tiles/s (cloud-only headline)")
    ap.add_argument("--image", type=float, default=None,
                    help="measured cloud+image serving tiles/s")
    ap.add_argument("--train", type=float, default=None,
                    help="measured training patches/s")
    ap.add_argument("--peak-tfs", type=float, default=197.0,
                    help="chip bf16 peak TF/s (v5e datasheet 197; use the "
                         "measured MXU rate from profile_roofline.py when "
                         "available)")
    a = ap.parse_args()
    if a.count:
        count(a.batch)
    if a.mfu:
        mfu(a.serving, a.train, a.image, a.peak_tfs)
