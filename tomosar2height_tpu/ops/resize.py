"""Bilinear resize with ``align_corners=True`` (torch ``F.interpolate`` parity).

Used by the pixel decoder to upsample the 256^2 point-feature plane to the
512^2 output raster and align it with the image plane before summation
(reference decoder/pixel.py:105-111). Implemented as two separable 1-D
interpolation matmuls — dense (out, in) weight matrices with two nonzeros per
row — which XLA maps straight onto the TPU MXU and fuses with surrounding convs.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True bilinear resampling matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        m[0, 0] = 1.0
        return m
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(int)
    i0 = np.clip(i0, 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = (src - i0).astype(np.float32)
    rows = np.arange(n_out)
    m[rows, i0] += 1.0 - f
    m[rows, i1] += f
    return m


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Resize an NHWC tensor to ``out_hw`` with align_corners=True semantics.

    Args:
        x: (B, H, W, C).
        out_hw: int or (H_out, W_out).

    Returns:
        (B, H_out, W_out, C).
    """
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    mh = jnp.asarray(_interp_matrix(h, oh))
    mw = jnp.asarray(_interp_matrix(w, ow))
    # (B,H,W,C) -> (B,OH,W,C) -> (B,OH,OW,C); contractions hit the MXU.
    # f32 inputs use HIGHEST so interpolation weights are not bf16-truncated
    # (sample positions would shift ~1e-2 px); bf16 inputs already quantize
    # the features themselves, so the multi-pass upcast buys nothing.
    import jax

    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=prec,
                   preferred_element_type=x.dtype)
    y = jnp.einsum("pw,bowc->bopc", mw, y, precision=prec,
                   preferred_element_type=x.dtype)
    return y
