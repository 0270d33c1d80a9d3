"""Device mesh + sharding helpers (data parallelism over patches).

The reference is single-GPU (SURVEY.md §2.3) — its 64-patch gradient
accumulation is re-designed here as real data parallelism: batches shard over
the 'data' mesh axis, parameters replicate, and XLA's GSPMD partitioner inserts
the psum-over-ICI gradient reduction inside the jitted train step. Scale-out to
multi-slice (DCN) is the same code with a larger mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices (-1/None = all)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the batch of patches) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put array leaves of a batch dict with axis-0 sharding.

    Non-array entries (names, python scalars) pass through. Batch size must be
    divisible by the mesh size — the PatchLoader emits fixed-size batches with
    invalid-patch masking, so this holds by construction.
    """
    s = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, s)
        else:
            out[k] = v
    return out
