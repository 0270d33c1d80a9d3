"""Pallas scatter kernel parity (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tomosar2height_tpu.ops.pallas.scatter_kernel import pallas_scatter_mean
from tomosar2height_tpu.ops.sorted_scatter import host_morton_bucket, sorted_segment_mean


def _bucketed(rng, b=2, n=1024, n_valid=900, reso=32, c=8):
    pts = rng.uniform(0.001, 0.999, (b, n, 3)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[:, :n_valid] = True
    cells = np.empty((b, n), np.int32)
    offs = np.empty((b, reso * reso + 1), np.int32)
    feats = rng.normal(size=(b, n, c)).astype(np.float32)
    for i in range(b):
        order, cells[i], offs[i] = host_morton_bucket(pts[i], mask[i], reso)
        feats[i] = feats[i][order]
    return feats, cells, offs


class TestPallasScatterMean:
    @pytest.mark.parametrize("c", [8, 32])
    def test_parity_vs_cumsum(self, rng, c):
        reso = 32
        feats, cells, offs = _bucketed(rng, c=c, reso=reso)
        want = np.asarray(sorted_segment_mean(jnp.asarray(feats), jnp.asarray(offs)))
        got = np.asarray(pallas_scatter_mean(
            jnp.asarray(feats), jnp.asarray(cells), jnp.asarray(offs), reso,
            interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_single_tile_plane(self, rng):
        # reso 16 -> exactly one Morton tile (256 cells)
        feats, cells, offs = _bucketed(rng, reso=16, c=4)
        want = np.asarray(sorted_segment_mean(jnp.asarray(feats), jnp.asarray(offs)))
        got = np.asarray(pallas_scatter_mean(
            jnp.asarray(feats), jnp.asarray(cells), jnp.asarray(offs), 16,
            interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_all_points_one_cell(self, rng):
        # degenerate density: every valid point in a single cell
        b, n, c, reso = 1, 512, 4, 16
        pts = np.full((b, n, 3), 0.51, dtype=np.float32)
        mask = np.ones((b, n), bool)
        feats = rng.normal(size=(b, n, c)).astype(np.float32)
        order, cells, offs = host_morton_bucket(pts[0], mask[0], reso)
        got = np.asarray(pallas_scatter_mean(
            jnp.asarray(feats), jnp.asarray(cells[None]), jnp.asarray(offs[None]),
            reso, interpret=True))
        occupied = int(cells[0])
        np.testing.assert_allclose(got[0, occupied], feats[0].mean(axis=0), atol=1e-4)
        hot = np.zeros(reso * reso, bool)
        hot[occupied] = True
        assert (got[0, ~hot] == 0).all()

    def test_dispatch_falls_back_below_tile(self, rng):
        """reso 8 (64 cells < one tile) must route to the cumsum impl."""
        from tomosar2height_tpu.ops.sorted_scatter import scatter_mean_morton

        feats, cells, offs = _bucketed(rng, reso=8, c=4)
        out = scatter_mean_morton(jnp.asarray(feats), jnp.asarray(offs),
                                  jnp.asarray(cells), 8, impl="pallas")
        want = sorted_segment_mean(jnp.asarray(feats), jnp.asarray(offs))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
