"""ALTO dual-topology U-Net: a grid U-Net where every level round-trips
grid <-> points (the paper's core idea; reference tomosar2height/encoder/alto.py).

Per Down/Up level (reference alto.py:97-138, 207-257):

1. two 3x3 convs (ReLU) on the feature plane,
2. residual from the previous level's post-conv plane via 1x1 conv
   (pooled first on deeper encoder levels),
3. bilinear-sample the plane at the point coordinates (grid_sample, border,
   align_corners=True),
4. per-point communication MLP ``fc_comm`` + linear skip ``fc_c`` from the
   previous level's point features,
5. scatter_mean the point features back into the plane at the current
   resolution, then pool (down) / transpose-conv upsample (up) with grid-space
   skip connections ('concat' merge).

TPU-first re-design: NHWC planes, points padded to a static bucket with a
validity mask (masked segment reductions), per-resolution cell ids computed
once per forward and reused across levels.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from tomosar2height_tpu.models.blocks import (
    MLP2,
    DenseParams,
    MLP2Params,
    conv1x1,
    conv3x3,
    kernel_init,
    max_pool_2x2,
    upconv2x2,
)
from tomosar2height_tpu.ops.sampling import grid_sample_2d
from tomosar2height_tpu.ops.scatter import cell_index, segment_mean
from tomosar2height_tpu.ops.sorted_scatter import (
    coarsen_offsets,
    scatter_mean_plane_morton,
)


def _scatter_plane(xy, c, reso, mask, cell_cache):
    """scatter_mean point features into a (reso, reso) NHWC plane
    (reference alto.py:76-88).

    Fast paths: with chunk-aligned metadata (``cell_cache['impl'] == 'fused'``)
    the Pallas tile kernel runs (one-hot-transpose matmuls, ops/pallas); with
    plain Morton-sorted metadata the cumsum/gather chain or the r01 kernel
    runs. Coarser levels reuse the finest sort: offsets stride-subsampled,
    Morton ids bit-truncated.
    """
    if cell_cache.get("impl") == "fused":
        from tomosar2height_tpu.ops.pallas.fused import tile_scatter_mean

        finest = cell_cache["finest"]
        level = int(finest).bit_length() - int(reso).bit_length()
        toff = cell_cache["tile_offsets"][:, :: 4 ** level]
        return tile_scatter_mean(c, cell_cache["cells_chunked"], toff, reso, finest)
    offsets = cell_cache.get("offsets")
    if offsets is not None:
        finest = cell_cache["finest"]
        level = int(finest).bit_length() - int(reso).bit_length()
        off = coarsen_offsets(offsets, level) if level else offsets
        cells = cell_cache.get("cells")
        if cells is not None and level:
            cells = cells >> (2 * level)
        return scatter_mean_plane_morton(c, off, cells, reso,
                                         cell_cache.get("impl", "cumsum"))
    idx = cell_cache.get(reso)
    if idx is None:
        idx = cell_index(xy, reso)
        cell_cache[reso] = idx
    # per-cell counts are identical for every scatter at this resolution
    # (same cells, same mask) — compute once per forward, not per level
    counts = cell_cache.get(("counts", reso))
    if counts is None:
        from tomosar2height_tpu.ops.scatter import segment_counts

        counts = segment_counts(idx, reso * reso, mask)
        cell_cache[("counts", reso)] = counts
    plane = segment_mean(c, idx, reso * reso, mask, counts=counts)
    b = c.shape[0]
    return plane.reshape(b, reso, reso, c.shape[-1])


def _sample_plane(x, xy, mask, cell_cache, mode):
    """Bilinear plane sampling at point coords (reference alto.py:90-95).

    With chunk-aligned metadata the Pallas tile-window gather runs instead of
    the XLA 4-corner gather (~13x fewer device-microseconds at 256^2)."""
    reso = x.shape[1]
    if cell_cache.get("impl") == "fused" and mode == "bilinear" and reso >= 32:
        from tomosar2height_tpu.ops.pallas.fused import tile_gather

        finest = cell_cache["finest"]
        level = int(finest).bit_length() - int(reso).bit_length()
        toff = cell_cache["tile_offsets"][:, :: 4 ** level]
        return tile_gather(x, cell_cache["aux_x"], cell_cache["aux_y"],
                           mask, toff, reso)
    return grid_sample_2d(x, xy, mode=mode)


def _fused2_ok(cell_cache, reso, sample_mode):
    return (cell_cache.get("impl") == "fused2" and sample_mode == "bilinear"
            and reso >= 32)


def _fused2_meta(cell_cache, reso):
    """Per-resolution chunk metadata for the fused level kernel, computed once
    per forward (XLA-side, cheap) and cached across levels."""
    key = ("meta2", reso)
    m = cell_cache.get(key)
    if m is None:
        from tomosar2height_tpu.ops.pallas.level_kernel import (
            chunk_metadata,
            empty_tile_mask,
        )

        toff = cell_cache["tile_offsets"]
        ct, pt = chunk_metadata(toff, cell_cache["npad"], reso,
                                cell_cache["finest"])
        tmask = empty_tile_mask(toff, reso, cell_cache["finest"])
        m = (ct, pt, tmask)
        cell_cache[key] = m
    return m


def _fused2_static(cell_cache, xy):
    from tomosar2height_tpu.ops.pallas.level_kernel import (
        make_aux_packed,
        make_cells_row,
    )

    if "aux2" not in cell_cache:
        cell_cache["aux2"] = make_aux_packed(xy)
    if "cells_row2" not in cell_cache:
        cell_cache["cells_row2"] = make_cells_row(cell_cache["cells"])
    return cell_cache["aux2"], cell_cache["cells_row2"]


def _fused_round_trip(module, x, xy, c_last, mask, cell_cache, features, dtype):
    """Sample -> fc_comm -> (+fc_c) -> scatter_mean as ONE Pallas call
    (ops/pallas/level_kernel.py). Declares params tree-identical to the
    composed path (MLP2 'fc_comm' + Dense 'fc_c'), so checkpoints are
    backend-independent. Call under ``module``'s compact scope."""
    from tomosar2height_tpu.ops.pallas.level_kernel import fused_level

    reso = x.shape[1]
    wi, bi, wo, bo = MLP2Params(features, features, name="fc_comm",
                                parent=module)()
    if c_last is not None:
        wc, bc = DenseParams(features, c_last.shape[-1], name="fc_c",
                             parent=module)()
        cl = c_last
    else:
        wc = jnp.zeros((1, features), dtype)
        bc = jnp.zeros((features,), dtype)
        cl = jnp.zeros(xy.shape[:2] + (1,), dtype)
    weights = tuple(w.astype(dtype) for w in (wi, bi, wo, bo, wc, bc))
    aux, cells_row = _fused2_static(cell_cache, xy)
    ct, pt, tmask = _fused2_meta(cell_cache, reso)
    return fused_level(x, cl.astype(dtype), weights, aux, cells_row, ct, pt,
                       tmask, mask, reso, cell_cache["finest"])


def _conv_pair(module, x):
    """The level-opening conv3x3(relu) x2 (reference alto.py:97-138) — one
    fused band kernel when ``module.fused_convs`` and the plane shape
    supports banding, else the composed convs. Identical param tree either
    way (Conv3x3Params == Conv3x3), so checkpoints interchange."""
    if (module.fused_convs and x.shape[1] % 8 == 0 and x.shape[1] >= 8
            and x.shape[2] % 8 == 0):
        from tomosar2height_tpu.models.blocks import Conv3x3Params
        from tomosar2height_tpu.ops.pallas.convpair_kernel import (
            fused_conv_pair,
        )

        w1, b1 = Conv3x3Params(module.features, x.shape[-1], name="conv1")()
        w2, b2 = Conv3x3Params(module.features, module.features,
                               name="conv2")()
        y, _ = fused_conv_pair(x.astype(module.dtype), w1, b1, w2, b2, False)
        return y
    x = conv3x3(module.features, "conv1", module.dtype, relu=True)(x)
    return conv3x3(module.features, "conv2", module.dtype, relu=True)(x)


class AltoDownConv(nn.Module):
    """Encoder level with grid<->point communication (reference alto.py:48-138)."""

    features: int
    level: int
    pooling: bool
    depth: int
    sample_mode: str = "bilinear"
    dtype: jnp.dtype = jnp.float32
    fused_convs: bool = False

    @nn.compact
    def __call__(self, xy, x, x_after_conv, c_last, mask, cell_cache):
        x = _conv_pair(self, x)

        if x_after_conv is not None:
            if self.level >= 2:
                # deeper levels: previous plane is one pooling step behind
                res = conv1x1(self.features, "res1x1", self.dtype)(max_pool_2x2(x_after_conv))
            else:  # level == 1: same resolution as level 0 (which never pools)
                res = conv1x1(self.features, "res1x1", self.dtype)(x_after_conv)
            x = x + res
        x_after_conv = x

        reso = x.shape[1]
        if _fused2_ok(cell_cache, reso, self.sample_mode):
            x, c = _fused_round_trip(self, x, xy, c_last, mask, cell_cache,
                                     self.features, self.dtype)
        else:
            c = _sample_plane(x, xy, mask, cell_cache, self.sample_mode)
            c = MLP2(self.features, self.dtype, name="fc_comm")(c)
            if c_last is not None:
                c = c + nn.Dense(self.features, kernel_init=kernel_init,
                                 dtype=self.dtype, name="fc_c")(c_last)
            x = _scatter_plane(xy, c, reso, mask, cell_cache)
        before_pool = x
        if self.pooling:
            x = max_pool_2x2(x)
        return x, before_pool, x_after_conv, c


class AltoUpConv(nn.Module):
    """Decoder level with grid<->point communication (reference alto.py:141-257)."""

    features: int
    level: int
    depth: int
    merge_mode: str = "concat"
    sample_mode: str = "bilinear"
    dtype: jnp.dtype = jnp.float32
    fused_convs: bool = False

    @nn.compact
    def __call__(self, xy, from_down, from_up, x_after_conv, c_last, mask, cell_cache):
        last = self.level == self.depth - 2
        if last:
            # final level: encoder level 0 never pooled, so no upsampling needed
            from_up = conv1x1(self.features, "upconv_noup", self.dtype)(from_up)
        else:
            from_up = upconv2x2(self.features, "upconv", self.dtype)(from_up)

        if self.merge_mode == "concat":
            x = jnp.concatenate([from_up, from_down], axis=-1)
        else:
            x = from_up + from_down
        x = _conv_pair(self, x)

        if x_after_conv is not None:
            if last:
                res = conv1x1(self.features, "res1x1", self.dtype)(x_after_conv)
            else:
                res = upconv2x2(self.features, "res_up", self.dtype)(x_after_conv)
            x = x + res
        x_after_conv = x

        if last:
            # reference alto.py:241-242: no point round-trip on the final level
            return x, x_after_conv, c_last

        reso = x.shape[1]
        if _fused2_ok(cell_cache, reso, self.sample_mode):
            x, c = _fused_round_trip(self, x, xy, c_last, mask, cell_cache,
                                     self.features, self.dtype)
        else:
            c = _sample_plane(x, xy, mask, cell_cache, self.sample_mode)
            c = MLP2(self.features, self.dtype, name="fc_comm")(c)
            if c_last is not None:
                c = c + nn.Dense(self.features, kernel_init=kernel_init,
                                 dtype=self.dtype, name="fc_c")(c_last)
            x = _scatter_plane(xy, c, reso, mask, cell_cache)
        return x, x_after_conv, c


class AltoUNet(nn.Module):
    """Dual-topology U-Net over an NHWC plane + point set (alto.py:260-382).

    Channel/resolution schedule for depth=5 on a 256^2 plane:
    down 32@256 -> 64@256(pool) -> 128@128(pool) -> 256@64(pool) -> 512@32;
    up 256@64 -> 128@128 -> 64@256 -> 32@256 (no point round-trip on the last).
    """

    num_classes: int
    depth: int = 5
    start_filts: int = 32
    merge_mode: str = "concat"
    up_mode: str = "transpose"
    sample_mode: str = "bilinear"
    dtype: jnp.dtype = jnp.float32
    fused_convs: bool = False

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        plane: jnp.ndarray,
        c: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        buckets: Optional[Dict] = None,
    ) -> jnp.ndarray:
        """
        Args:
            points: (B, N, >=2) normalized point coordinates (xy used). When
                ``buckets`` is given, points/c/mask must be Morton-cell-sorted.
            plane: (B, R, R, C_in) initial feature plane.
            c: (B, N, C_in) initial per-point features.
            mask: (B, N) validity of padded points.
            buckets: optional {'offsets': (B, R*R+1), 'cells': (B, N),
                'impl': 'cumsum'|'pallas'} enabling the scatter-free path.

        Returns:
            (B, R, R, num_classes) output plane.
        """
        xy = points[..., :2]
        cell_cache: Dict = {}
        if buckets is not None:
            cell_cache.update(buckets)
            cell_cache["finest"] = plane.shape[1]
            cell_cache["npad"] = points.shape[1]

        encoder_outs = []
        x, x_after_conv = plane, None
        outs = self.start_filts
        for i in range(self.depth):
            outs = self.start_filts * (2 ** i)
            pooling = 0 < i < self.depth - 1
            x, before_pool, x_after_conv, c = AltoDownConv(
                outs, i, pooling, self.depth, self.sample_mode, self.dtype,
                fused_convs=self.fused_convs, name=f"down{i}"
            )(xy, x, x_after_conv, c, mask, cell_cache)
            encoder_outs.append(before_pool)

        for i in range(self.depth - 1):
            outs = outs // 2
            from_down = encoder_outs[-(i + 2)]
            x, x_after_conv, c = AltoUpConv(
                outs, i, self.depth, self.merge_mode, self.sample_mode, self.dtype,
                fused_convs=self.fused_convs, name=f"up{i}",
            )(xy, from_down, x, x_after_conv, c, mask, cell_cache)

        return conv1x1(self.num_classes, "conv_final", self.dtype)(x)
