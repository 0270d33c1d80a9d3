#!/usr/bin/env python
"""Isolate the pixel decoder's 21.5 ms: raw convs vs resize vs MXU reference."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_forward import timed  # noqa: E402


def main(batch=4, dtype="bfloat16", reps=8):
    import jax
    import jax.numpy as jnp

    from tomosar2height_tpu.ops.resize import resize_bilinear

    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(batch, 256, 256, 32)).astype(np.float32), dt)
    x512_32 = jnp.asarray(rng.normal(size=(batch, 512, 512, 32)).astype(np.float32), dt)
    x512_64 = jnp.asarray(rng.normal(size=(batch, 512, 512, 64)).astype(np.float32), dt)
    x512_128 = jnp.asarray(rng.normal(size=(batch, 512, 512, 128)).astype(np.float32), dt)

    def conv(x, cout, k=3):
        w = jnp.asarray(rng.normal(size=(k, k, x.shape[-1], cout)).astype(np.float32) * 0.01, dt)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    print(f"batch={batch} dtype={dtype}")
    timed("resize 256->512 x32", lambda p: resize_bilinear(p, 512).sum(), plane, reps=reps)
    timed("conv3x3 512^2 32->64  (19GF)", lambda x: conv(x, 64).sum(), x512_32, reps=reps)
    timed("conv3x3 512^2 64->128 (77GF)", lambda x: conv(x, 128).sum(), x512_64, reps=reps)
    timed("conv3x3 512^2 128->64 (77GF)", lambda x: conv(x, 64).sum(), x512_128, reps=reps)
    timed("conv1x1 512^2 288->1", lambda x: conv(jnp.concatenate(
        [x, x, x, x[..., :32]], -1), 1, 1).sum(), x512_64, reps=reps)

    # MXU reference: same FLOPs as the 64->128 conv as one big matmul
    a = jnp.asarray(rng.normal(size=(batch * 512 * 512, 64)).astype(np.float32), dt)
    w = jnp.asarray(rng.normal(size=(64, 9 * 128)).astype(np.float32), dt)
    timed("matmul (1M,64)@(64,1152) 155GF",
          lambda a_: jnp.dot(a_, w, preferred_element_type=jnp.float32).sum(),
          a, reps=reps)

    # conv as 9 shifted 1x1 matmuls (manual lowering)
    w9 = jnp.asarray(rng.normal(size=(9, 64, 128)).astype(np.float32) * 0.01, dt)

    def conv_shift(x):
        out = None
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs = jnp.roll(x, (dy, dx), axis=(1, 2))
                t = jnp.einsum("bhwc,cd->bhwd", xs, w9[k],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
                k += 1
        return out.astype(dt)

    timed("conv-as-9-shifted-matmuls 64->128", lambda x: conv_shift(x).sum(),
          x512_64, reps=reps)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=8)
    a = ap.parse_args()
    main(dtype=a.dtype, reps=a.reps)
