"""LocalPoolPointnet: per-point ResNet-FC MLP with interleaved local pooling,
then scatter to a feature plane refined by a (plain or ALTO) U-Net.

Parity: reference tomosar2height/encoder/pointnet.py:13-111. TPU-first changes:
padded points + validity mask, NHWC plane, cell ids computed once.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tomosar2height_tpu.models.alto import AltoUNet
from tomosar2height_tpu.models.blocks import ResnetBlockFC, kernel_init
from tomosar2height_tpu.models.unet import UNet
from tomosar2height_tpu.ops.scatter import (
    cell_index,
    pool_local_max,
    pool_local_mean,
    segment_max,
    segment_mean,
)
from tomosar2height_tpu.ops.sorted_scatter import (
    gather_cells_sorted,
    scatter_mean_morton,
    scatter_mean_plane_morton,
)


class LocalPoolPointnet(nn.Module):
    """Point encoder producing a dict of feature planes (key 'xy').

    Args mirror the reference ctor (pointnet.py:29-58): ``feature_dim``,
    ``hidden_dim``, ``plane_resolution``, ``scatter_type`` ('max'/'mean'),
    ``unet_type`` ('unet'/'alto'), ``unet_kwargs``, ``n_blocks``.
    """

    feature_dim: int = 32
    dim: int = 3
    hidden_dim: int = 32
    scatter_type: str = "max"
    unet_type: str = "alto"
    unet_kwargs: Optional[dict] = None
    plane_resolution: int = 256
    n_blocks: int = 5
    sorted_impl: str = "cumsum"  # 'cumsum' | 'pallas' backend for the sorted path
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        cells: Optional[jnp.ndarray] = None,
        offsets: Optional[jnp.ndarray] = None,
    ) -> dict:
        """
        Args:
            points: (B, N, 3) normalized to [0, 1] (padded to bucket size N).
            mask: (B, N) bool validity of each point.
            cells: (B, N) Morton cell ids at ``plane_resolution`` — when given
                (with ``offsets``), points must be cell-sorted and all
                point->grid reductions take the scatter-free sorted path
                (ops/sorted_scatter.py).
            offsets: (B, R*R + 1) Morton segment offsets.

        Returns:
            {'xy': (B, R, R, feature_dim)} refined feature plane.
        """
        reso = self.plane_resolution
        xy = points[..., :2]
        if cells is None and offsets is not None:
            # wire-slim path: cell ids are fully determined by the (already
            # host-sorted) points + mask, so callers may skip shipping the
            # (B, N) int32 array and let the device recompute it bit-exactly
            from tomosar2height_tpu.ops.sorted_scatter import (
                PAD_CELL_SENTINEL,
                morton_cells_device,
            )

            pad = (int(PAD_CELL_SENTINEL)
                   if self.sorted_impl in ("fused", "fused2")
                   else reso * reso)
            cells = morton_cells_device(points, mask, reso, pad)
        use_sorted = cells is not None and offsets is not None
        # 'fused'  = per-op Pallas tile kernels (round 2)
        # 'fused2' = same pointnet pool/scatter kernels, but the ALTO levels
        #            run ONE fused gather+MLP+scatter kernel per round trip
        #            (ops/pallas/level_kernel.py)
        fused = use_sorted and self.sorted_impl in ("fused", "fused2")

        if self.scatter_type not in ("max", "mean"):
            raise ValueError(f"Invalid scatter type: {self.scatter_type}")

        if fused and self.sorted_impl == "fused2":
            # chunk-grid kernels (round 3): pools run as two auto-pipelined
            # pallas_calls (ops/pallas/pool2_kernel.py); the chunk metadata is
            # computed once here and shared with the ALTO level kernels via
            # the buckets dict
            from tomosar2height_tpu.ops.pallas.level_kernel import (
                TILE_SIDE,
                chunk_metadata,
                empty_tile_mask,
                make_cells_row,
            )
            from tomosar2height_tpu.ops.pallas.pool2_kernel import pool2

            npad = points.shape[1]
            n_tiles = (reso // TILE_SIDE) ** 2
            cells_row = make_cells_row(cells)
            ct_f, pt_f = chunk_metadata(offsets, npad, reso, reso)
            tmask_f = empty_tile_mask(offsets, reso, reso)

            def pool_fn(values):
                return pool2(values, cells_row, ct_f, mask, n_tiles,
                             self.scatter_type)
        elif fused:
            # chunk-aligned layout: `offsets` carries CHUNK-multiple TILE
            # offsets (host_morton_bucket_aligned), cells are finest Morton ids
            # with PAD_CELL_SENTINEL on padding rows
            from tomosar2height_tpu.ops.pallas.fused import (
                chunk_cells,
                make_aux,
                tile_pool,
                tile_scatter_mean,
            )

            aux_x, aux_y = make_aux(xy)
            cells_chunked = chunk_cells(cells)

            def pool_fn(values):
                return tile_pool(values, cells_chunked, offsets, mask, reso,
                                 self.scatter_type)
        elif use_sorted:
            def pool_fn(values):
                if self.scatter_type == "max":
                    # XLA segment_max on the Morton ids: measured faster than a
                    # segmented associative scan on TPU (scan pays log-N full
                    # passes); order consistency is free since gather-back uses
                    # the same Morton ids
                    pooled = segment_max(values, cells, reso * reso, mask)
                else:
                    pooled = scatter_mean_morton(values, offsets, cells, reso,
                                                 self.sorted_impl)
                return gather_cells_sorted(pooled, cells)
        else:
            index = cell_index(xy, reso)
            pool = pool_local_max if self.scatter_type == "max" else pool_local_mean

            def pool_fn(values):
                return pool(values, index, reso, mask)

        net = nn.Dense(2 * self.hidden_dim, kernel_init=kernel_init, dtype=self.dtype,
                       name="fc_pos")(points)
        net = ResnetBlockFC(self.hidden_dim, dtype=self.dtype, name="block0")(net)
        for i in range(1, self.n_blocks):
            pooled = pool_fn(net)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(self.hidden_dim, dtype=self.dtype, name=f"block{i}")(net)

        net = nn.relu(net)
        net = nn.Dense(self.feature_dim, kernel_init=kernel_init, dtype=self.dtype,
                       name="fc_c")(net)

        if fused and self.sorted_impl == "fused2":
            from tomosar2height_tpu.ops.pallas.pool2_kernel import scatter_plane2

            plane = scatter_plane2(net, cells_row, ct_f, tmask_f, mask, reso)
        elif fused:
            plane = tile_scatter_mean(net, cells_chunked, offsets, reso, reso)
        elif use_sorted:
            plane = scatter_mean_plane_morton(net, offsets, cells, reso, self.sorted_impl)
        else:
            plane = segment_mean(net, index, reso * reso, mask)
            plane = plane.reshape(points.shape[0], reso, reso, self.feature_dim)

        unet_kwargs = dict(self.unet_kwargs or {})
        if fused and self.sorted_impl == "fused2":
            buckets = {"impl": "fused2", "tile_offsets": offsets,
                       "cells": cells, "cells_row2": cells_row,
                       ("meta2", reso): (ct_f, pt_f, tmask_f)}
        elif fused:
            buckets = {"impl": "fused", "tile_offsets": offsets,
                       "cells_chunked": cells_chunked, "aux_x": aux_x,
                       "aux_y": aux_y}
        elif use_sorted:
            buckets = {"offsets": offsets, "cells": cells, "impl": self.sorted_impl}
        else:
            buckets = None
        if self.unet_type == "unet":
            fea = UNet(self.feature_dim, dtype=self.dtype, name="unet", **unet_kwargs)(plane)
        elif self.unet_type == "alto":
            fea = AltoUNet(self.feature_dim, dtype=self.dtype, name="unet", **unet_kwargs)(
                points, plane, net, mask, buckets
            )
        else:
            raise ValueError(f"Unknown unet_type: {self.unet_type}")
        return {"xy": fea}
