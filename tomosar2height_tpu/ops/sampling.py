"""Bilinear plane sampling at point coordinates (grid_sample replacement).

Matches torch ``F.grid_sample(plane, 2*xy-1, padding_mode='border',
align_corners=True, mode='bilinear')`` as used by the ALTO blocks
(reference alto.py:90-95,199-205): normalized coordinate u in [0, 1] maps to
pixel position ``u * (size - 1)`` and out-of-range positions clamp to the
border. Implemented as a vectorized gather + lerp in NHWC — XLA fuses the four
corner gathers; no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Sample an NHWC plane at normalized point coordinates.

    Args:
        plane: (B, H, W, C) feature plane; row = y, col = x.
        coords: (B, N, 2) xy in [0, 1] (values outside clamp to border).
        mode: 'bilinear' or 'nearest'.

    Returns:
        (B, N, C) sampled features.
    """
    b, h, w, c = plane.shape
    x = coords[..., 0] * (w - 1)
    y = coords[..., 1] * (h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)

    if mode == "nearest":
        # torch rounds half away from zero only for negative; for in-range
        # coords round-half-to-even differences are measure-zero — use round.
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
        flat = plane.reshape(b, h * w, c)
        return jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, w - 1)
    y0 = jnp.clip(y0, 0, h - 1)
    wx = (x - x0.astype(x.dtype))[..., None]
    wy = (y - y0.astype(y.dtype))[..., None]

    # quad-packing: XLA's TPU gather is row-visit bound, so ONE gather of the
    # four corners packed as channels beats four separate corner gathers ~4x.
    # jnp.roll wraps at the far edge, but border clamping makes the wrapped
    # neighbor's bilinear weight exactly 0 (x0 == w-1 implies wx == 0), so the
    # result is identical to the four-gather form.
    p4 = jnp.concatenate(
        [plane,
         jnp.roll(plane, -1, axis=2),
         jnp.roll(plane, -1, axis=1),
         jnp.roll(plane, (-1, -1), axis=(1, 2))], axis=-1)
    flat4 = p4.reshape(b, h * w, 4 * c)
    v4 = jnp.take_along_axis(flat4, (y0 * w + x0)[..., None], axis=1)
    v00, v01, v10, v11 = (v4[..., :c], v4[..., c:2 * c],
                          v4[..., 2 * c:3 * c], v4[..., 3 * c:])
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
