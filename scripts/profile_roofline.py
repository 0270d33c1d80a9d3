#!/usr/bin/env python
"""Anchor the chip roofline: true HBM bandwidth + true MXU rate.

Avoids the timed()-harness perturbation artifact (which itself moves the full
input array every rep) by using data-dependent chains inside one jit.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench(fn, *args, n=3):
    import jax

    float(fn(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    f = float(out)
    dt = (time.perf_counter() - t0) / n
    return dt, f


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # --- HBM bandwidth: chained adds on a 256 MB bf16 array -----------------------
    big = jnp.asarray(rng.normal(size=(128 * 1024 * 1024,)).astype(np.float32),
                      jnp.bfloat16)  # 256 MB
    STEPS = 16

    @jax.jit
    def chain(x):
        def body(i, acc):
            return acc * jnp.bfloat16(1.0000001) + jnp.bfloat16(1.0)
        return jax.lax.fori_loop(0, STEPS, body, x).sum()

    dt, _ = bench(chain, big)
    traffic = 256e6 * 2 * STEPS  # read+write per step
    print(f"HBM chain: {dt*1e3:8.2f} ms  -> {traffic/dt/1e9:7.1f} GB/s")

    # --- MXU rate: fat bf16 matmul chain ------------------------------------------
    m = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32) * 0.01,
                    jnp.bfloat16)
    K = 8

    @jax.jit
    def mm(a):
        def body(i, acc):
            return jnp.dot(acc, m, preferred_element_type=jnp.bfloat16) * \
                jnp.bfloat16(0.01)
        x0 = jnp.ones((1024, 8192), jnp.bfloat16)
        return jax.lax.fori_loop(0, K, body, x0).sum()

    dt, _ = bench(mm, m)
    flops = 2 * 1024 * 8192 * 8192 * K
    print(f"MXU chain: {dt*1e3:8.2f} ms  -> {flops/dt/1e12:7.1f} TF/s (bf16)")

    # --- conv WITHOUT the perturb artifact: output-chained ------------------------
    x = jnp.asarray(rng.normal(size=(4, 512, 512, 64)).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.05,
                    jnp.bfloat16)

    @jax.jit
    def convchain(x0):
        def body(i, a):
            return jax.lax.conv_general_dilated(
                a, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16) * jnp.bfloat16(0.05)
        return jax.lax.fori_loop(0, 8, body, x0).sum()

    dt, _ = bench(convchain, x)
    flops = 2 * 4 * 512 * 512 * 9 * 64 * 64 * 8
    byts = 4 * 512 * 512 * 64 * 2 * 2 * 8
    print(f"conv3x3 512^2 64->64 x8: {dt*1e3:8.2f} ms -> "
          f"{flops/dt/1e12:6.1f} TF/s, {byts/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
