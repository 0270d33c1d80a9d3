"""Pallas TPU kernel: 3x3 SAME conv (NHWC) with fused bias+ReLU.

XLA's conv lowering runs the model's 3x3 convs at ~14 TF/s on this chip
(measured, scripts/profile_conv.py) against a ~70 TF/s practical MXU peak —
the pixel decoder alone spends 21 ms/batch in them. This kernel reformulates
the conv as 9 tap matmuls over row blocks:

- grid (batch, row-blocks); each step's input block arrives via the normal
  Mosaic pipeline (no manual DMA), plus a tiny side input carrying the two
  boundary rows of every block (built by the wrapper with strided slices), so
  blocks never overlap and there is no halo exchange;
- the kernel assembles a (RB+2, W+2, C) padded window in VMEM and accumulates
  ``window_slice @ w[ky, kx]`` over the 9 taps in f32 on the MXU;
- bias add + ReLU fuse into the same kernel, saving a full activation
  round-trip to HBM per conv.

The custom_vjp backward defers to XLA's conv transpose rules (exact same
math), so training through the fast path stays correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rb(h: int, width: int = 512, cin: int = 64, cout: int = 64) -> int:
    """Largest row-block keeping the kernel's VMEM footprint under ~6 MB
    (double-buffered in/out blocks + padded window + f32 accumulator + tap
    slices; the 16 MB scoped-vmem limit OOMs near 2x this estimate)."""
    bytes_per_row = width * (10 * cin + 8 * cout)
    budget = 6 * 1024 * 1024
    for rb in (32, 16, 8, 4, 2, 1):
        if h % rb == 0 and rb * bytes_per_row <= budget:
            return rb
    return 1


def _conv_kernel(x_ref, bnd_ref, w_ref, b_ref, out_ref, xp_ref, acc_ref, *,
                 rb, width, cin, cout, relu, f32_precision):
    # assemble the (RB+2, W+8, Cin) zero-col-padded window in SCRATCH (refs,
    # not values: keeps at most one tap temporary live — an all-value version
    # made Mosaic hold all 9 slices and blow the 16 MB scoped-vmem stack)
    xp_ref[:, 0:1, :] = jnp.zeros((rb + 2, 1, cin), xp_ref.dtype)
    xp_ref[:, width + 1:, :] = jnp.zeros((rb + 2, xp_ref.shape[1] - width - 1,
                                          cin), xp_ref.dtype)
    xp_ref[0, 1:width + 1, :] = bnd_ref[0, 0, 0]
    xp_ref[1:rb + 1, 1:width + 1, :] = x_ref[0]
    xp_ref[rb + 1, 1:width + 1, :] = bnd_ref[0, 0, 1]

    prec = (jax.lax.Precision.HIGHEST if f32_precision
            else jax.lax.Precision.DEFAULT)
    acc_ref[:] = jnp.broadcast_to(b_ref[0].astype(jnp.float32),
                                  (rb, width, cout))
    for ky in range(3):
        for kx in range(3):
            # rank-3 contraction: no reshape needed, and the tap slices read
            # straight out of the scratch window
            sl = xp_ref[ky:ky + rb, kx:kx + width, :]
            acc_ref[:] += jax.lax.dot_general(
                sl, w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
    acc = acc_ref[:]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def _conv_impl(x, bnd, w, b, relu, interpret):
    bsz, h, width, cin = x.shape
    cout = w.shape[-1]
    rb = _pick_rb(h, width, cin, cout)
    nb = h // rb
    in_specs = [
            pl.BlockSpec((1, rb, width, cin), lambda bb, r: (bb, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, width, cin), lambda bb, r: (bb, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda bb, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bb, r: (0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, rb, width, cout),
                            lambda bb, r: (bb, r, 0, 0),
                            memory_space=pltpu.VMEM)
    # col pad 1 each side, rounded up to the 8-sublane quantum
    wpad = ((width + 2 + 7) // 8) * 8
    kernel = functools.partial(
        _conv_kernel, rb=rb, width=width, cin=cin, cout=cout, relu=relu,
        f32_precision=x.dtype == jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, h, width, cout), x.dtype),
        grid=(bsz, nb),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((rb + 2, wpad, cin), x.dtype),
            pltpu.VMEM((rb, width, cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, bnd, w, b)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def _conv_jit(x, w, b, relu, interpret):
    bsz, h, width, cin = x.shape
    rb = _pick_rb(h, width, cin, w.shape[-1])
    # boundary rows per block: row r*RB-1 (zeros at the top edge) and row
    # (r+1)*RB (zeros at the bottom edge) — strided slices of the row-padded x
    xr = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    tops = xr[:, 0:h:rb]          # (B, NB, W, C)
    bots = xr[:, rb + 1::rb]      # (B, NB, W, C)
    bnd = jnp.stack([tops, bots], axis=2)  # (B, NB, 2, W, C)
    return _conv_impl(x, bnd, w, b.reshape(1, -1), relu, interpret)


def pallas_conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                   relu: bool = False,
                   interpret: bool | None = None) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC, fused bias (+ReLU). Differentiable via
    the XLA conv transpose (custom_vjp below). Off-TPU runs interpret mode."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv_fwd_op(x, w, b, relu, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_fwd_op(x, w, b, relu, interpret):
    return _conv_jit(x, w, b, relu, interpret)


def _xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _conv_fwd(x, w, b, relu, interpret):
    y = _conv_fwd_op(x, w, b, relu, interpret)
    return y, (x, w, b, y if relu else None)


def _conv_bwd(relu, interpret, res, g):
    x, w, b, y = res
    if relu:
        g = jnp.where(y > 0, g, 0)

    # The transpose rule of a mixed-dtype conv (bf16 operands with f32
    # preferred_element_type) is ill-formed under grad ("requires arguments to
    # have the same dtypes"); run the whole backward in f32 and cast the
    # gradients back to the input dtypes (ADVICE r02).
    def f(x_, w_, b_):
        y_ = jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y_ + b_

    _, vjp = jax.vjp(f, x.astype(jnp.float32), w.astype(jnp.float32),
                     b.astype(jnp.float32))
    dx, dw, db = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


_conv_fwd_op.defvjp(_conv_fwd, _conv_bwd)
