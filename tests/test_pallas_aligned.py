"""Golden tests for the chunk-aligned Morton tile kernels (interpret mode).

The aligned layout (host_morton_bucket_aligned) + tile kernels replace the
model's hottest gathers/scatters; these tests pin their numerics against the
reference-parity XLA implementations (ops/sampling.py, ops/scatter.py).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK, pallas_tile_gather  # noqa: E402
from tomosar2height_tpu.ops.pallas.scatter_kernel import (  # noqa: E402
    pallas_aligned_scatter_mean_plane,
)
from tomosar2height_tpu.ops.sampling import grid_sample_2d  # noqa: E402
from tomosar2height_tpu.ops.scatter import scatter_mean_to_plane  # noqa: E402
from tomosar2height_tpu.ops.sorted_scatter import (  # noqa: E402
    PAD_CELL_SENTINEL,
    aligned_bucket_size,
    host_morton_bucket_aligned,
)


def make_aligned_batch(b=2, n=1000, reso=64, seed=0, frac_masked=0.1):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.001, 0.999, (b, n, 3)).astype(np.float32)
    mask = rng.random((b, n)) > frac_masked
    npad = aligned_bucket_size(n, reso, CHUNK, tile_cells=256)
    out = {
        "points": np.zeros((b, npad, 3), np.float32),
        "mask": np.zeros((b, npad), bool),
        "cells": np.zeros((b, npad), np.int32),
        "tile_offsets": None,
    }
    toffs = []
    for i in range(b):
        # the round-2 per-op kernels iterate 16x16 tiles -> 256-cell layout
        a = host_morton_bucket_aligned(pts[i], mask[i], reso, CHUNK,
                                       tile_cells=256)
        out["points"][i] = a["points"]
        out["mask"][i] = a["mask"]
        out["cells"][i] = a["cells"]
        toffs.append(a["tile_offsets"])
    out["tile_offsets"] = np.stack(toffs)
    return pts, mask, out


class TestAlignedLayout:
    def test_layout_contract(self):
        pts, mask, a = make_aligned_batch(b=1, n=777, reso=64, seed=3)
        toff = a["tile_offsets"][0]
        assert toff[0] == 0 and (np.diff(toff) >= 0).all()
        assert (toff % CHUNK == 0).all()
        # every real point survives exactly once, grouped by tile
        assert a["mask"][0].sum() == mask[0].sum()
        cells = a["cells"][0]
        real = cells < 64 * 64
        assert real.sum() == mask[0].sum()
        # within each tile range, real rows are Morton-sorted and in-tile
        for t in range(len(toff) - 1):
            seg = cells[toff[t]:toff[t + 1]]
            seg = seg[seg < 64 * 64]
            assert (np.diff(seg) >= 0).all()
            assert ((seg // 256) == t).all()
        # padding rows carry the sentinel
        assert (cells[~real] == PAD_CELL_SENTINEL).all()

    def test_preserves_point_set(self):
        pts, mask, a = make_aligned_batch(b=1, n=500, reso=32, seed=1)
        got = a["points"][0][a["mask"][0]]
        want = pts[0][mask[0]]
        assert np.allclose(np.sort(got.ravel()), np.sort(want.ravel()))


class TestAlignedScatter:
    @pytest.mark.parametrize("reso,finest", [(64, 64), (32, 64), (16, 64)])
    def test_matches_xla_scatter_mean(self, reso, finest):
        pts, mask, a = make_aligned_batch(b=2, n=900, reso=finest, seed=7)
        npad = a["points"].shape[1]
        rng = np.random.default_rng(11)
        vals = rng.normal(size=(2, npad, 32)).astype(np.float32)
        vals[~a["mask"]] = 1e9  # junk on padding rows must not leak

        level = int(finest).bit_length() - int(reso).bit_length()
        toff = a["tile_offsets"][:, :: 4 ** level]
        cells_chunked = a["cells"].reshape(2, npad // CHUNK, CHUNK)
        got = pallas_aligned_scatter_mean_plane(
            jnp.asarray(vals), jnp.asarray(cells_chunked), jnp.asarray(toff),
            reso, finest, interpret=True)

        want = scatter_mean_to_plane(
            jnp.asarray(a["points"][..., :2]), jnp.asarray(vals), reso,
            jnp.asarray(a["mask"]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("reso,finest", [(64, 64), (32, 64)])
    def test_v3_matches_xla_scatter_mean(self, reso, finest):
        from tomosar2height_tpu.ops.pallas.scatter_kernel import (
            pallas_scatter_mean_plane_v3,
        )

        pts, mask, a = make_aligned_batch(b=2, n=900, reso=finest, seed=7)
        npad = a["points"].shape[1]
        rng = np.random.default_rng(11)
        vals = rng.normal(size=(2, npad, 32)).astype(np.float32)
        vals[~a["mask"]] = 1e9

        cells_chunked = a["cells"].reshape(2, npad // CHUNK, CHUNK)
        got = pallas_scatter_mean_plane_v3(
            jnp.asarray(vals), jnp.asarray(cells_chunked),
            jnp.asarray(a["tile_offsets"]), reso, finest, interpret=True)
        want = scatter_mean_to_plane(
            jnp.asarray(a["points"][..., :2]), jnp.asarray(vals), reso,
            jnp.asarray(a["mask"]))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_empty_batch_entry(self):
        reso = 32
        pts, mask, a = make_aligned_batch(b=1, n=100, reso=reso, seed=2,
                                          frac_masked=1.1)  # all masked
        npad = a["points"].shape[1]
        vals = np.full((1, npad, 8), 3.0, np.float32)
        got = pallas_aligned_scatter_mean_plane(
            jnp.asarray(vals), jnp.asarray(a["cells"].reshape(1, -1, CHUNK)),
            jnp.asarray(a["tile_offsets"]), reso, reso, interpret=True)
        assert np.asarray(got).sum() == 0.0


class TestTilePool:
    @pytest.mark.parametrize("kind", ["max", "mean"])
    def test_matches_xla_pool_local(self, kind):
        from tomosar2height_tpu.ops.pallas.pool_kernel import pallas_tile_pool
        from tomosar2height_tpu.ops.scatter import pool_local_max, pool_local_mean

        reso = 64
        pts, mask, a = make_aligned_batch(b=2, n=900, reso=reso, seed=41)
        npad = a["points"].shape[1]
        rng = np.random.default_rng(43)
        vals = rng.normal(size=(2, npad, 24)).astype(np.float32)
        vals[~a["mask"]] = -1e9 if kind == "max" else 1e9  # junk must not leak

        cells_chunked = jnp.asarray(a["cells"].reshape(2, npad // CHUNK, CHUNK))
        got = pallas_tile_pool(jnp.asarray(vals), cells_chunked,
                               jnp.asarray(a["tile_offsets"]), kind,
                               interpret=True)

        from tomosar2height_tpu.ops.scatter import cell_index

        idx = cell_index(jnp.asarray(a["points"][..., :2]), reso)
        ref_fn = pool_local_max if kind == "max" else pool_local_mean
        want = ref_fn(jnp.asarray(vals), idx, reso, jnp.asarray(a["mask"]))
        m = a["mask"]
        np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                                   rtol=1e-5, atol=1e-5)

    def test_max_bf16_ids_exact(self):
        """bf16 path: within-tile ids stay exact, runs never merge wrongly."""
        from tomosar2height_tpu.ops.pallas.pool_kernel import pallas_tile_pool
        from tomosar2height_tpu.ops.scatter import cell_index, pool_local_max

        reso = 32
        pts, mask, a = make_aligned_batch(b=1, n=600, reso=reso, seed=47)
        npad = a["points"].shape[1]
        rng = np.random.default_rng(48)
        vals = jnp.asarray(rng.normal(size=(1, npad, 8)).astype(np.float32),
                           jnp.bfloat16)
        cells_chunked = jnp.asarray(a["cells"].reshape(1, npad // CHUNK, CHUNK))
        got = pallas_tile_pool(vals, cells_chunked,
                               jnp.asarray(a["tile_offsets"]), "max",
                               interpret=True)
        idx = cell_index(jnp.asarray(a["points"][..., :2]), reso)
        want = pool_local_max(vals, idx, reso, jnp.asarray(a["mask"]))
        m = a["mask"]
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[m], np.asarray(want, np.float32)[m],
            rtol=1e-2, atol=1e-2)


class TestTileGather:
    @pytest.mark.parametrize("reso,finest", [(64, 64), (32, 64)])
    def test_matches_grid_sample(self, reso, finest):
        pts, mask, a = make_aligned_batch(b=2, n=800, reso=finest, seed=5)
        npad = a["points"].shape[1]
        rng = np.random.default_rng(13)
        plane = rng.normal(size=(2, reso, reso, 32)).astype(np.float32)

        from tomosar2height_tpu.ops.pallas.fused import make_aux

        ax, ay = make_aux(jnp.asarray(a["points"][..., :2]))
        level = int(finest).bit_length() - int(reso).bit_length()
        toff = a["tile_offsets"][:, :: 4 ** level]
        got = pallas_tile_gather(jnp.asarray(plane), ax, ay,
                                 jnp.asarray(toff), reso, interpret=True)
        want = grid_sample_2d(jnp.asarray(plane), jnp.asarray(a["points"][..., :2]))
        m = a["mask"]
        np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                                   rtol=1e-5, atol=1e-5)

    def test_gather_grad_matches_xla(self):
        """tile_gather custom_vjp (dplane) == autodiff of grid_sample_2d."""
        from tomosar2height_tpu.ops.pallas.fused import make_aux, tile_gather

        reso = 32
        pts, mask, a = make_aligned_batch(b=1, n=300, reso=reso, seed=21)
        npad = a["points"].shape[1]
        rng = np.random.default_rng(23)
        plane = jnp.asarray(rng.normal(size=(1, reso, reso, 16)).astype(np.float32))
        ax, ay = make_aux(jnp.asarray(a["points"][..., :2]))
        m = jnp.asarray(a["mask"])
        toff = jnp.asarray(a["tile_offsets"])[None] if a["tile_offsets"].ndim == 1 \
            else jnp.asarray(a["tile_offsets"])

        cot = jnp.asarray(rng.normal(size=(1, npad, 16)).astype(np.float32))


        def f_ref(p):
            s = grid_sample_2d(p, jnp.asarray(a["points"][None] if a["points"].ndim == 2
                                              else a["points"])[..., :2])
            s = jnp.where(m[..., None], s, 0)
            return (s * cot).sum()

        # run on CPU: pallas interpret engages automatically off-TPU? No —
        # tile_gather calls the compiled kernel; on CPU backends this test
        # only checks the BWD rule, so compare grads of the reference fwd
        # against the custom bwd applied to the same cotangent.
        from tomosar2height_tpu.ops.pallas.fused import _tile_gather_bwd

        dplane_ref = jax.grad(f_ref)(plane)
        dplane_got, _, _, _, _ = _tile_gather_bwd(
            reso, (plane, ax, ay, m), cot)
        np.testing.assert_allclose(np.asarray(dplane_got), np.asarray(dplane_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_scatter_grad_matches_xla(self):
        """tile_scatter_mean custom bwd == autodiff of the masked segment mean."""
        from tomosar2height_tpu.ops.pallas.fused import _tile_scatter_bwd

        reso = finest = 32
        pts, mask, a = make_aligned_batch(b=2, n=400, reso=reso, seed=31)
        npad = a["points"].shape[1]
        rng = np.random.default_rng(33)
        vals = jnp.asarray(rng.normal(size=(2, npad, 8)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(2, reso, reso, 8)).astype(np.float32))
        m = jnp.asarray(a["mask"])

        def f_ref(v):
            plane = scatter_mean_to_plane(jnp.asarray(a["points"][..., :2]), v,
                                          reso, m)
            return (plane * cot).sum()

        dv_ref = jax.grad(f_ref)(vals)
        cells_chunked = jnp.asarray(a["cells"].reshape(2, npad // CHUNK, CHUNK))
        dv_got, _, _ = _tile_scatter_bwd(reso, finest, cells_chunked, cot)
        got, ref = np.asarray(dv_got), np.asarray(dv_ref)
        np.testing.assert_allclose(got[np.asarray(m)], ref[np.asarray(m)],
                                   rtol=1e-5, atol=1e-5)
        assert np.abs(got[~np.asarray(m)]).max() == 0.0

    def test_border_points(self):
        """Coords at/over the border clamp like grid_sample border mode."""
        reso = 32
        n = 200
        rng = np.random.default_rng(17)
        pts = rng.uniform(0, 1, (1, n, 3)).astype(np.float32)
        pts[0, :50, 0] = rng.uniform(0.0, 0.01, 50)    # left edge
        pts[0, 50:100, 1] = rng.uniform(0.99, 0.9999, 50)  # top edge
        mask = np.ones((1, n), bool)
        a = host_morton_bucket_aligned(pts[0], mask[0], reso, CHUNK,
                                       tile_cells=256)
        npad = a["points"].shape[0]
        plane = rng.normal(size=(1, reso, reso, 16)).astype(np.float32)
        from tomosar2height_tpu.ops.pallas.fused import make_aux

        ax, ay = make_aux(jnp.asarray(a["points"][None, :, :2]))
        got = pallas_tile_gather(jnp.asarray(plane), ax, ay,
                                 jnp.asarray(a["tile_offsets"])[None], reso,
                                 interpret=True)
        want = grid_sample_2d(jnp.asarray(plane), jnp.asarray(a["points"][None, :, :2]))
        m = a["mask"][None]
        np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                                   rtol=1e-5, atol=1e-5)


class TestConvKernel:
    @pytest.mark.parametrize("cin,cout,h,w", [(8, 16, 32, 32), (16, 8, 16, 64)])
    def test_matches_xla_conv(self, cin, cout, h, w):
        from tomosar2height_tpu.ops.pallas.conv_kernel import pallas_conv3x3

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        kw = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        got = pallas_conv3x3(x, kw, b, relu=True, interpret=True)
        want = jax.nn.relu(jax.lax.conv_general_dilated(
            x, kw, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_matches_xla(self):
        from tomosar2height_tpu.ops.pallas.conv_kernel import (
            _xla_conv,
            pallas_conv3x3,
        )

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, 16, 32, 8)).astype(np.float32))
        kw = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)

        def f_fast(x_, w_, b_):
            return (pallas_conv3x3(x_, w_, b_, relu=True, interpret=True) ** 2).sum()

        def f_ref(x_, w_, b_):
            return (jax.nn.relu(_xla_conv(x_, w_, b_)) ** 2).sum()

        gx, gw, gb = jax.grad(f_fast, argnums=(0, 1, 2))(x, kw, b)
        rx, rw, rb = jax.grad(f_ref, argnums=(0, 1, 2))(x, kw, b)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-4)

    def test_grad_bf16(self):
        """bf16 training through the fast-conv path traces and matches the
        f32 backward within bf16 tolerance (ADVICE r02: the old backward
        mixed bf16/f32 operands in the conv transpose and failed to trace)."""
        from tomosar2height_tpu.ops.pallas.conv_kernel import pallas_conv3x3

        rng = np.random.default_rng(7)
        x32 = rng.normal(size=(1, 16, 32, 8)).astype(np.float32)
        w32 = (rng.normal(size=(3, 3, 8, 8)) * 0.1).astype(np.float32)
        b32 = (rng.normal(size=(8,)) * 0.1).astype(np.float32)

        def loss(x_, w_, b_):
            return (pallas_conv3x3(x_, w_, b_, relu=True,
                                   interpret=True) ** 2).sum()

        g16 = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32, jnp.bfloat16),
            jnp.asarray(b32, jnp.bfloat16))
        g32 = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(x32), jnp.asarray(w32), jnp.asarray(b32))
        for a, r in zip(g16, g32):
            assert a.dtype == jnp.bfloat16
            ra = np.asarray(r)
            np.testing.assert_allclose(np.asarray(a, np.float32), ra,
                                       rtol=0.1, atol=0.1 * np.abs(ra).max())
