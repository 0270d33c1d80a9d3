"""Fused ConvDecoder head: the whole 512^2 decoder in one pallas_call.

The pixel decoder's conv chain (reference decoder `pixel.py:8-32`:
conv3x3 32->64 -> 128 -> 64, ReLU between, then a dense-skip 1x1 over the
virtual concat [x, x1, x2, x3]) is the forward's largest conv cost:
~87 GFLOP/tile at 512^2, measured ~2.3 ms/tile amortized on v5e (the
single largest device category after the chunk-grid kernels fused the
point<->grid round trips, RESULTS.md r03). XLA runs it as four conv ops
with three full-size intermediate HBM round trips and half-idle MXU
columns at C_out=64.

This kernel runs the entire chain for one row band per grid step:

- grid (B, H/TR); the band's input rows plus an 8-row halo above and below
  arrive as three auto-pipelined views of the SAME input array (block index
  maps clamp at the scene edges; the kernel zeroes the out-of-scene halo);
- each conv is 9 tap-matmuls with resident weights, f32 accumulation in
  VMEM scratch, fused bias+ReLU, intermediate activations never leave VMEM;
- convs are computed on the full padded band (TR+16 rows); boundary garbage
  penetrates one row per conv, so the central TR rows stay exact with 5
  rows to spare;
- the dense-skip 1x1 head contracts each part against its slice of the
  concat kernel (f32 accumulation), exactly like the XLA path's
  Conv1x1Split (models/decoder.py:51-82).

Numerical contract: identical tap order and SAME zero padding as
``lax.conv_general_dilated`` NHWC/HWIO; bf16 inputs keep bf16 operands with
f32 accumulation (native MXU mode — same policy as the XLA path). The
backward runs the XLA composition's vjp in f32 (custom_vjp; the kernel is
serving-oriented, training defaults to the composed path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # rows of halo above/below each band (8-row blocks keep sublane alignment)


def _shift2d(v: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """SAME-padding tap shift: returns w with w[r, c] = v[r + kh - 1, c + kw - 1]
    (zeros beyond the edge). v is (R, W, C)."""
    zr = jnp.zeros_like(v[:1])
    if kh == 0:
        v = jnp.concatenate([zr, v[:-1]], axis=0)
    elif kh == 2:
        v = jnp.concatenate([v[1:], zr], axis=0)
    zc = jnp.zeros_like(v[:, :1])
    if kw == 0:
        v = jnp.concatenate([zc, v[:, :-1]], axis=1)
    elif kw == 2:
        v = jnp.concatenate([v[:, 1:], zc], axis=1)
    return v


def _conv_band(src_ref, acc_ref, dst_ref, w_ref, b_ref):
    """One conv3x3+bias+ReLU over the full padded band held in src_ref.

    src_ref (R, W, Cin) model dtype; acc_ref (R, W, Cout) f32 scratch;
    dst_ref (R, W, Cout) model dtype; w_ref (9*Cin, Cout); b_ref (1, Cout).
    """
    r, w_, cin = src_ref.shape
    cout = acc_ref.shape[-1]
    acc_ref[...] = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32), (r, w_, cout))
    src = src_ref[...]
    for kh in range(3):
        for kw in range(3):
            tap = kh * 3 + kw
            shifted = _shift2d(src, kh, kw).reshape(r * w_, cin)
            wt = w_ref[tap * cin:(tap + 1) * cin, :]
            acc_ref[...] += jax.lax.dot_general(
                shifted, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(r, w_, cout)
    dst_ref[...] = jnp.maximum(acc_ref[...], 0.0).astype(dst_ref.dtype)


def _decoder_kernel(top_ref, mid_ref, bot_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                    w4_ref, b4_ref, out_ref,
                    xloc_ref, acc1_ref, x1_ref, acc2_ref, x2_ref,
                    acc3_ref, x3_ref, *, tr: int, n_tiles: int):
    i = pl.program_id(1)

    # assemble the padded band: [8-row top halo | TR mid rows | 8-row bottom]
    xloc_ref[0:HALO] = top_ref[0]
    xloc_ref[HALO:HALO + tr] = mid_ref[0]
    xloc_ref[HALO + tr:] = bot_ref[0]
    # scene edges: the clamped halo blocks carry in-scene rows — SAME padding
    # means those contributions must be zero
    @pl.when(i == 0)
    def _():
        xloc_ref[0:HALO] = jnp.zeros_like(xloc_ref[0:HALO])

    @pl.when(i == n_tiles - 1)
    def _():
        xloc_ref[HALO + tr:] = jnp.zeros_like(xloc_ref[HALO + tr:])

    def _zero_out_of_scene(dst_ref):
        # SAME padding zero-pads every conv's INPUT: out-of-scene rows of an
        # intermediate activation are zeros, not relu(bias) — re-zero the
        # halo rows beyond the scene edge after each conv
        @pl.when(i == 0)
        def _():
            dst_ref[0:HALO] = jnp.zeros_like(dst_ref[0:HALO])

        @pl.when(i == n_tiles - 1)
        def _():
            dst_ref[HALO + tr:] = jnp.zeros_like(dst_ref[HALO + tr:])

    _conv_band(xloc_ref, acc1_ref, x1_ref, w1_ref, b1_ref)
    _zero_out_of_scene(x1_ref)
    _conv_band(x1_ref, acc2_ref, x2_ref, w2_ref, b2_ref)
    _zero_out_of_scene(x2_ref)
    _conv_band(x2_ref, acc3_ref, x3_ref, w3_ref, b3_ref)

    # dense-skip 1x1 over the virtual concat [x, x1, x2, x3] on the exact
    # central TR rows (f32 accumulation, per-part sliced kernel — identical
    # math to Conv1x1Split)
    r0, r1 = HALO, HALO + tr
    w_ = out_ref.shape[2]
    cout = out_ref.shape[-1]
    head = jnp.broadcast_to(b4_ref[0].astype(jnp.float32), (tr * w_, cout))
    off = 0
    for ref in (xloc_ref, x1_ref, x2_ref, x3_ref):
        c = ref.shape[-1]
        part = ref[r0:r1].reshape(tr * w_, c)
        head = head + jax.lax.dot_general(
            part, w4_ref[off:off + c, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        off += c
    out_ref[0] = head.reshape(tr, w_, cout)


# Mosaic keeps roughly a third of each conv's 9 unrolled tap temporaries
# (shifted bf16 copy + f32 dot output) live on the VMEM stack at once —
# calibrated against the v5e compile report for the flagship head
# (cin 32 -> 64 -> 128 -> 64 at W=512: 105.68 MB measured at rpad=48
# vs 108 MB estimated). Budget 90 MB against the 100 MB scoped limit.
_STACK_BUDGET_BYTES = 90 * 1024 * 1024


def _stack_bytes_per_px(convs, bpe: int) -> int:
    return sum(3 * (ci * bpe + co * 4) for ci, co in convs)


def _band_rows(h: int, w_: int, convs, bpe: int) -> int:
    """Largest band height whose estimated Mosaic stack fits the VMEM budget.

    ``convs`` is the kernel's conv chain as (cin, cout) pairs — the decoder
    head passes three stages, the conv-pair kernel two.
    """
    per_px = _stack_bytes_per_px(convs, bpe)
    for tr in (32, 16, 8):
        if h % tr == 0 and (tr + 2 * HALO) * w_ * per_px <= _STACK_BUDGET_BYTES:
            return tr
    if h % 8 == 0:
        return 8  # smallest band; let the compiler be the final arbiter
    raise ValueError(f"decoder height {h} must be a multiple of 8")


def _flatten_w3x3(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (9*Cin, Cout), tap-major — matches the kernel's
    w_ref[tap*Cin:(tap+1)*Cin] reads."""
    return k.reshape(9 * k.shape[2], k.shape[3])


def _xla_decoder(x, w1, b1, w2, b2, w3, b3, w4, b4):
    """f32 reference composition (the backward path; ADVICE r02: mixed-dtype
    conv transposes break under grad, so the whole vjp runs f32)."""
    def conv(v, k, b):
        y = jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y + b)

    xf = x.astype(jnp.float32)
    x1 = conv(xf, w1.astype(jnp.float32), b1.astype(jnp.float32))
    x2 = conv(x1, w2.astype(jnp.float32), b2.astype(jnp.float32))
    x3 = conv(x2, w3.astype(jnp.float32), b3.astype(jnp.float32))
    out = b4.astype(jnp.float32)
    off = 0
    k4 = w4[0, 0].astype(jnp.float32)
    for p in (xf, x1, x2, x3):
        c = p.shape[-1]
        out = out + jnp.einsum("bhwc,cd->bhwd", p, k4[off:off + c],
                               preferred_element_type=jnp.float32)
        off += c
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_conv_decoder(x, w1, b1, w2, b2, w3, b3, w4, b4):
    """Fused ConvDecoder: x (B, H, W, C) -> (B, H, W, Cout) float32.

    Weight layouts are the flax module's: w* (3, 3, Cin, Cout), b* (Cout,),
    w4 (1, 1, sum(Ci), Cout). H must be a multiple of 8; W a multiple of 8.
    """
    return _fused_fwd_impl(x, w1, b1, w2, b2, w3, b3, w4, b4)


def _fused_fwd_impl(x, w1, b1, w2, b2, w3, b3, w4, b4):
    b, h, w_, cin = x.shape
    assert h % 8 == 0 and w_ % 8 == 0, (h, w_)
    tr = _band_rows(h, w_,
                    ((cin, w1.shape[-1]), (w1.shape[-1], w2.shape[-1]),
                     (w2.shape[-1], w3.shape[-1])), x.dtype.itemsize)
    n_tiles = h // tr
    c1, c2, c3 = w1.shape[-1], w2.shape[-1], w3.shape[-1]
    cout = w4.shape[-1]
    dt = x.dtype
    rpad = tr + 2 * HALO
    nrow_blocks = h // HALO

    grid = (b, n_tiles)
    hb = HALO

    in_specs = [
        # three views of x: top halo / band / bottom halo
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
        pl.BlockSpec((9 * c2, c3), lambda *_: (0, 0)),
        pl.BlockSpec((1, c3), lambda *_: (0, 0)),
        pl.BlockSpec((cin + c1 + c2 + c3, cout), lambda *_: (0, 0)),
        pl.BlockSpec((1, cout), lambda *_: (0, 0)),
    ]
    out_spec = pl.BlockSpec((1, tr, w_, cout), lambda b_, i: (b_, i, 0, 0))
    scratch = [
        pltpu.VMEM((rpad, w_, cin), dt),
        pltpu.VMEM((rpad, w_, c1), jnp.float32),
        pltpu.VMEM((rpad, w_, c1), dt),
        pltpu.VMEM((rpad, w_, c2), jnp.float32),
        pltpu.VMEM((rpad, w_, c2), dt),
        pltpu.VMEM((rpad, w_, c3), jnp.float32),
        pltpu.VMEM((rpad, w_, c3), dt),
    ]
    kernel = functools.partial(_decoder_kernel, tr=tr, n_tiles=n_tiles)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w_, cout), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, _flatten_w3x3(w1).astype(dt), b1.reshape(1, -1).astype(dt),
      _flatten_w3x3(w2).astype(dt), b2.reshape(1, -1).astype(dt),
      _flatten_w3x3(w3).astype(dt), b3.reshape(1, -1).astype(dt),
      w4[0, 0].astype(dt), b4.reshape(1, -1).astype(dt))


def _fused_fwd(x, w1, b1, w2, b2, w3, b3, w4, b4):
    out = _fused_fwd_impl(x, w1, b1, w2, b2, w3, b3, w4, b4)
    return out, (x, w1, b1, w2, b2, w3, b3, w4, b4)


def _fused_bwd(res, g):
    x, w1, b1, w2, b2, w3, b3, w4, b4 = res
    args32 = tuple(a.astype(jnp.float32) for a in res)
    _, vjp = jax.vjp(_xla_decoder, *args32)
    grads = vjp(g.astype(jnp.float32))
    return tuple(gr.astype(a.dtype) for gr, a in zip(grads, res))


fused_conv_decoder.defvjp(_fused_fwd, _fused_bwd)
