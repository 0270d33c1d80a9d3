#!/usr/bin/env python
"""Component-level device-time profiling of the flagship forward.

The axon relay makes per-call timing unreliable (async dispatch, no-op
block_until_ready), so each measurement runs REPS iterations of the component
*inside one jitted program* (fori_loop with a data dependency) and fetches a
scalar once: device time = total / REPS, amortizing the relay RTT away.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(name, fn, *args, reps=8):
    """Device-time per rep via an in-jit loop whose FIRST argument is perturbed
    by the running carry — defeats loop-invariant code motion (an earlier
    version without the perturbation measured a hoisted single execution)."""
    import jax
    import jax.numpy as jnp

    def perturb(tree, carry):
        return jax.tree.map(
            lambda t: t + (carry * 1e-20).astype(t.dtype)
            if jnp.issubdtype(jnp.asarray(t).dtype, jnp.floating) else t,
            tree,
        )

    def looped(*a):
        def body(_, carry):
            out = fn(perturb(a[0], carry), *a[1:])
            return out.astype(jnp.float32) * 1e-20 + carry
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jfn = jax.jit(looped)
    float(jfn(*args))  # compile
    t0 = time.perf_counter()
    float(jfn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt * 1000:8.2f} ms")
    return dt


def main(batch=4, n_points=16384, dtype="float32", reps=8):
    import jax
    import jax.numpy as jnp

    from tomosar2height_tpu.models.alto import AltoUNet
    from tomosar2height_tpu.models.decoder import PixelwiseDecoder
    from tomosar2height_tpu.models.pointnet import LocalPoolPointnet
    from tomosar2height_tpu.ops.sampling import grid_sample_2d
    from tomosar2height_tpu.ops.scatter import cell_index, pool_local_max, segment_mean
    from __graft_entry__ import _flagship_model

    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0.001, 0.999, (batch, n_points, 3)).astype(np.float32))
    mask = jnp.ones((batch, n_points), bool)
    key = jax.random.PRNGKey(0)

    model = _flagship_model().clone(dtype=dt)
    params = jax.jit(model.init)(key, pts[:1, :256], mask[:1, :256], None)

    print(f"batch={batch} points={n_points} dtype={dtype} reps={reps}")
    timed("full forward", lambda p, x, m: model.apply(p, x, m, None)[0].sum(),
          params, pts, mask, reps=reps)

    # pointnet encoder alone (with its ALTO)
    enc = LocalPoolPointnet(
        feature_dim=32, hidden_dim=32, plane_resolution=256, scatter_type="max",
        unet_type="alto", unet_kwargs={"depth": 5, "start_filts": 32, "merge_mode": "concat"},
        dtype=dt, name="point_encoder")
    eparams = jax.jit(enc.init)(key, pts[:1, :256], mask[:1, :256])
    timed("pointnet+alto encoder", lambda p, x, m: enc.apply(p, x, m)["xy"].sum(),
          eparams, pts, mask, reps=reps)

    # pointnet MLP stack only (no unet)
    enc2 = LocalPoolPointnet(
        feature_dim=32, hidden_dim=32, plane_resolution=256, scatter_type="max",
        unet_type="unet", unet_kwargs={"depth": 1, "start_filts": 32},
        dtype=dt, name="pn")
    e2params = jax.jit(enc2.init)(key, pts[:1, :256], mask[:1, :256])
    timed("pointnet mlp+pools (unet d1)", lambda p, x, m: enc2.apply(p, x, m)["xy"].sum(),
          e2params, pts, mask, reps=reps)

    # alto unet alone
    plane = jnp.asarray(rng.normal(size=(batch, 256, 256, 32)).astype(np.float32), dt)
    c = jnp.asarray(rng.normal(size=(batch, n_points, 32)).astype(np.float32), dt)
    alto = AltoUNet(num_classes=32, depth=5, start_filts=32, dtype=dt, name="alto")
    aparams = jax.jit(alto.init)(key, pts[:1, :256], plane[:1], c[:1, :256], mask[:1, :256])
    timed("alto unet", lambda p, x, pl, cc, m: alto.apply(p, x, pl, cc, m).sum(),
          aparams, pts, plane, c, mask, reps=reps)

    # decoder alone
    dec = PixelwiseDecoder(hidden_dim=32, output_size=512, dtype=dt, name="dec")
    dparams = jax.jit(dec.init)(key, {"xy": plane[:1]})
    timed("pixel decoder (256->512)", lambda p, pl: dec.apply(p, {"xy": pl})[0].sum(),
          dparams, plane, reps=reps)

    # primitive ops
    idx = cell_index(pts[..., :2], 256)
    feats = jnp.asarray(rng.normal(size=(batch, n_points, 32)).astype(np.float32), dt)
    timed("segment_mean 256^2 x32ch", lambda f, i, m: segment_mean(f, i, 256 * 256, m).sum(),
          feats, idx, mask, reps=reps)
    timed("pool_local_max 256^2 x32ch", lambda f, i, m: pool_local_max(f, i, 256, m).sum(),
          feats, idx, mask, reps=reps)
    timed("grid_sample 256^2 x32ch", lambda pl, x: grid_sample_2d(pl, x[..., :2]).sum(),
          plane, pts, reps=reps)

    # sorted-indices variant of segment_mean
    order = jnp.argsort(idx, axis=1)
    idx_s = jnp.take_along_axis(idx, order, axis=1)
    feats_s = jnp.take_along_axis(feats, order[..., None], axis=1)

    def seg_sorted(f, i, m):
        b, n, ch = f.shape
        off = (jnp.arange(b, dtype=jnp.int32) * 256 * 256)[:, None]
        seg = (i + off).reshape(-1)
        s = jax.ops.segment_sum(f.reshape(-1, ch), seg, num_segments=b * 256 * 256,
                                indices_are_sorted=False)
        return s.sum()

    def seg_sorted_hint(f, i, m):
        b, n, ch = f.shape
        off = (jnp.arange(b, dtype=jnp.int32) * 256 * 256)[:, None]
        seg = (i + off).reshape(-1)
        s = jax.ops.segment_sum(f.reshape(-1, ch), seg, num_segments=b * 256 * 256,
                                indices_are_sorted=True)
        return s.sum()

    timed("segment_sum unsorted", seg_sorted, feats, idx, mask, reps=reps)
    timed("segment_sum sorted+hint", seg_sorted_hint, feats_s, idx_s, mask, reps=reps)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=8)
    a = ap.parse_args()
    main(a.batch, a.points, a.dtype, a.reps)
