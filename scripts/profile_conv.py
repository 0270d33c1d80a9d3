#!/usr/bin/env python
"""Why is XLA conv at 2.8-9 TF/s? Probe formulations/dims/dtypes."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from profile_forward import timed  # noqa: E402


def main(reps=8):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def mk(shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05, dt)

    x = mk((4, 512, 512, 64))
    w = mk((3, 3, 64, 128))

    def conv(x_, w_, prefer, dn=("NHWC", "HWIO", "NHWC")):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=prefer)

    timed("NHWC bf16 prefer-f32", lambda a: conv(a, w, jnp.float32).sum(), x, reps=reps)
    timed("NHWC bf16 prefer-bf16", lambda a: conv(a, w, jnp.bfloat16).sum(), x, reps=reps)
    timed("NHWC bf16 prefer-None", lambda a: jax.lax.conv_general_dilated(
        a, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).sum(), x, reps=reps)

    xc = mk((4, 64, 512, 512))
    wc = mk((128, 64, 3, 3))
    timed("NCHW bf16 prefer-bf16", lambda a: conv(a, wc, jnp.bfloat16,
          ("NCHW", "OIHW", "NCHW")).sum(), xc, reps=reps)

    # im2col via conv_general_dilated_patches + matmul
    wmat = mk((9 * 64, 128))

    def im2col(a):
        p = jax.lax.conv_general_dilated_patches(
            a, (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.dot(p.reshape(-1, 9 * 64), wmat,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    timed("im2col patches+matmul", lambda a: im2col(a).sum(), x, reps=reps)

    # batch=1 four times the rows? spatial-collapsed 1x1 reference
    x1 = mk((4, 512, 512, 64))
    w1 = mk((1, 1, 64, 128))
    timed("conv1x1 64->128 (memory ref)", lambda a: conv(a, w1, jnp.bfloat16).sum(),
          x1, reps=reps)

    # alto-scale conv
    xa = mk((4, 256, 256, 64))
    timed("NHWC 256^2 64->128 bf16", lambda a: conv(a, w, jnp.bfloat16).sum(),
          xa, reps=reps)
    # fatter channels, same FLOPs as 512^2 x64: does efficiency improve?
    xf = mk((4, 256, 256, 256))
    wf = mk((3, 3, 256, 512))
    timed("NHWC 256^2 256->512 bf16 (309GF)", lambda a: conv(a, wf, jnp.bfloat16).sum(),
          xf, reps=reps)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    a = ap.parse_args()
    main(reps=a.reps)
