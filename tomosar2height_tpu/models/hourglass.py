"""Stacked-hourglass image feature extractor (alternative image encoder).

Capability target: reference tomosar2height/encoder/hourglass.py:134-218
(registered but unused by the shipped configs). Implemented in a later
milestone — registered so configs resolve; raises until then.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class HGFilter(nn.Module):
    num_stack: int = 4
    depth: int = 2
    in_ch: int = 3
    last_ch: int = 32
    norm: str = "group"
    down_type: str = "conv64"
    use_sigmoid: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        raise NotImplementedError("HGFilter lands in a later milestone")
