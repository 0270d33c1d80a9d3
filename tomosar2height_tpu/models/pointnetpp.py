"""PointNet++ SSG point encoder (alternative to LocalPoolPointnet).

Capability target: reference tomosar2height/encoder/pointnetpp.py:111-173
(FPS sampling, ball query, 3x set abstraction, 3x feature propagation, scatter
to plane + U-Net). Implemented in a later milestone — registered so configs
resolve; raises until then.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PointNetPlusPlus(nn.Module):
    feature_dim: int = 32
    dim: int = 3
    hidden_dim: int = 32
    plane_resolution: int = 256
    unet_type: str = "unet"
    unet_kwargs: dict | None = None
    scatter_type: str = "max"
    n_blocks: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, mask=None):
        raise NotImplementedError("PointNetPlusPlus lands in a later milestone")
