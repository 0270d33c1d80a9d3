"""Fused conv3x3+ReLU pair (+ optional 2x2 max pool) over row bands.

Every ALTO level and every plain-U-Net level opens with the same motif —
``conv3x3(relu) -> conv3x3(relu)`` (reference `alto.py:97-138`,
`unet.py:48-73`), the plain U-Net following with a 2x2 max pool. XLA runs
each conv as its own HLO with a full-size intermediate in HBM; across the
ALTO pyramid plus the image U-Net these pairs are the second-largest conv
cost after the decoder head (~60-70 GFLOP/tile at flagship shapes).

One pallas_call per pair runs both convs (and the pool) for a row band with
the intermediate resident in VMEM — same banded-halo structure as
ops/pallas/decoder_kernel.py, whose `_conv_band`/`_shift2d` it reuses:
three auto-pipelined views of the input provide the band plus an 8-row halo
(clamped at the scene edges and re-zeroed, preserving exact SAME-padding
semantics — out-of-scene rows of the INTERMEDIATE activation are zero, not
relu(bias)). Backward runs the XLA composition's vjp in f32 (custom_vjp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomosar2height_tpu.ops.pallas.decoder_kernel import (
    HALO,
    _band_rows,
    _conv_band,
    _flatten_w3x3,
)


def _pair_kernel(top_ref, mid_ref, bot_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 *refs, tr: int, n_tiles: int, pool: bool):
    if pool:
        out_ref, pool_ref, xloc_ref, acc1_ref, x1_ref, acc2_ref, x2_ref = refs
    else:
        out_ref, xloc_ref, acc1_ref, x1_ref, acc2_ref, x2_ref = refs
    i = pl.program_id(1)

    xloc_ref[0:HALO] = top_ref[0]
    xloc_ref[HALO:HALO + tr] = mid_ref[0]
    xloc_ref[HALO + tr:] = bot_ref[0]

    @pl.when(i == 0)
    def _():
        xloc_ref[0:HALO] = jnp.zeros_like(xloc_ref[0:HALO])

    @pl.when(i == n_tiles - 1)
    def _():
        xloc_ref[HALO + tr:] = jnp.zeros_like(xloc_ref[HALO + tr:])

    _conv_band(xloc_ref, acc1_ref, x1_ref, w1_ref, b1_ref)
    # SAME padding zeroes the second conv's out-of-scene INPUT rows
    @pl.when(i == 0)
    def _():
        x1_ref[0:HALO] = jnp.zeros_like(x1_ref[0:HALO])

    @pl.when(i == n_tiles - 1)
    def _():
        x1_ref[HALO + tr:] = jnp.zeros_like(x1_ref[HALO + tr:])

    # second conv only needs the central TR rows; compute on the full band
    # anyway (uniform code path; garbage stays outside [HALO, HALO+tr))
    _conv_band(x1_ref, acc2_ref, x2_ref, w2_ref, b2_ref)
    band = x2_ref[HALO:HALO + tr]
    out_ref[0] = band
    if pool:
        r, w_, c = band.shape
        pool_ref[0] = jnp.max(
            band.reshape(r // 2, 2, w_ // 2, 2, c), axis=(1, 3))


def _xla_pair(x, w1, b1, w2, b2, pool):
    def conv(v, k, b):
        y = jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + b)

    xf = x.astype(jnp.float32)
    y = conv(conv(xf, w1.astype(jnp.float32), b1.astype(jnp.float32)),
             w2.astype(jnp.float32), b2.astype(jnp.float32))
    if pool:
        b_, h, w_, c = y.shape
        return y, jnp.max(y.reshape(b_, h // 2, 2, w_ // 2, 2, c), axis=(2, 4))
    return y, None


def _pair_impl(x, w1, b1, w2, b2, pool: bool):
    b, h, w_, cin = x.shape
    assert h % 8 == 0 and w_ % 8 == 0, (h, w_)
    c1, c2 = w1.shape[-1], w2.shape[-1]
    tr = _band_rows(h, w_, ((cin, c1), (c1, c2)), x.dtype.itemsize)
    n_tiles = h // tr
    assert c1 == w2.shape[2], "pair intermediate/second-conv channel mismatch"
    dt = x.dtype
    rpad = tr + 2 * HALO
    nrow_blocks = h // HALO
    hb = HALO

    in_specs = [
        pl.BlockSpec((1, hb, w_, cin),
                     lambda b_, i: (b_, jnp.maximum(i * (tr // hb) - 1, 0), 0, 0)),
        pl.BlockSpec((1, tr, w_, cin), lambda b_, i: (b_, i, 0, 0)),
        pl.BlockSpec((1, hb, w_, cin),
                     lambda b_, i: (b_, jnp.minimum(
                         (i + 1) * (tr // hb), nrow_blocks - 1), 0, 0)),
        pl.BlockSpec((9 * cin, c1), lambda *_: (0, 0)),
        pl.BlockSpec((1, c1), lambda *_: (0, 0)),
        pl.BlockSpec((9 * c1, c2), lambda *_: (0, 0)),
        pl.BlockSpec((1, c2), lambda *_: (0, 0)),
    ]
    out_specs = [pl.BlockSpec((1, tr, w_, c2), lambda b_, i: (b_, i, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, h, w_, c2), dt)]
    if pool:
        out_specs.append(
            pl.BlockSpec((1, tr // 2, w_ // 2, c2), lambda b_, i: (b_, i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, h // 2, w_ // 2, c2), dt))
    scratch = [
        pltpu.VMEM((rpad, w_, cin), dt),
        pltpu.VMEM((rpad, w_, c1), jnp.float32),
        pltpu.VMEM((rpad, w_, c1), dt),
        pltpu.VMEM((rpad, w_, c2), jnp.float32),
        pltpu.VMEM((rpad, w_, c2), dt),
    ]
    kernel = functools.partial(_pair_kernel, tr=tr, n_tiles=n_tiles, pool=pool)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, _flatten_w3x3(w1).astype(dt), b1.reshape(1, -1).astype(dt),
      _flatten_w3x3(w2).astype(dt), b2.reshape(1, -1).astype(dt))
    return (out[0], out[1]) if pool else (out[0], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_conv_pair(x, w1, b1, w2, b2, pool: bool = False):
    """relu(conv3x3(relu(conv3x3(x, w1) + b1), w2) + b2) (+ 2x2 max pool).

    x (B, H, W, Cin) with 8 | H and 8 | W (and 2 | tr when pooling);
    w* are flax Conv3x3 kernels (3, 3, Cin, Cout). Returns (y, pooled|None).
    """
    return _pair_impl(x, w1, b1, w2, b2, pool)


def _pair_fwd(x, w1, b1, w2, b2, pool):
    out = _pair_impl(x, w1, b1, w2, b2, pool)
    return out, (x, w1, b1, w2, b2)


def _pair_bwd(pool, res, g):
    gy, gp = g
    args32 = tuple(a.astype(jnp.float32) for a in res)
    if pool:
        _, vjp = jax.vjp(lambda *a: _xla_pair(*a, True), *args32)
        grads = vjp((gy.astype(jnp.float32), gp.astype(jnp.float32)))
    else:
        _, vjp = jax.vjp(lambda *a: _xla_pair(*a, False)[0], *args32)
        grads = vjp(gy.astype(jnp.float32))
    return tuple(gr.astype(a.dtype) for gr, a in zip(grads, res))


fused_conv_pair.defvjp(_pair_fwd, _pair_bwd)
