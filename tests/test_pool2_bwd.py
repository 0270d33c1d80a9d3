"""Gradient parity for the fused pool2 / scatter_plane2 backwards
(ops/pallas/pool2_kernel.py).

The pointnet encoder's pool_local and plane-emission transposes previously
ran the XLA segment-composition vjp (the training-step "bwd swarm"); they now
stay on the chunk-grid kernels: mean-pool is self-adjoint, max-pool is an
equality-gated cell-sum, scatter-mean's transpose is one gather-back of the
count-scaled cotangent. Parity target: the reference compositions' vjp.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.flatten_util  # noqa: E402,F401
import jax.numpy as jnp  # noqa: E402

from tomosar2height_tpu.models.pointnet import LocalPoolPointnet  # noqa: E402
from tomosar2height_tpu.ops.pallas import level_kernel as lk  # noqa: E402
from tomosar2height_tpu.ops.pallas.level_kernel import (  # noqa: E402
    PCHUNK,
    chunk_metadata,
    empty_tile_mask,
    make_cells_row,
)
from tomosar2height_tpu.ops.pallas.pool2_kernel import (  # noqa: E402
    pool2,
    scatter_plane2,
)
from tomosar2height_tpu.ops.sorted_scatter import (  # noqa: E402
    ALIGNED_TILE_CELLS,
    aligned_bucket_size,
    host_morton_bucket_aligned,
)


def _layout(b, n, reso, seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.0, 1.0, (b, n, 3)).astype(np.float32)
    mask = rng.random((b, n)) > 0.1
    npad = aligned_bucket_size(n, reso, PCHUNK)
    apts = np.full((b, npad, 3), 0.5, np.float32)
    amask = np.zeros((b, npad), bool)
    acell = np.zeros((b, npad), np.int32)
    atoff = np.zeros((b, reso * reso // ALIGNED_TILE_CELLS + 1), np.int32)
    for i in range(b):
        a = host_morton_bucket_aligned(pts[i], mask[i], reso, PCHUNK)
        apts[i], amask[i], acell[i], atoff[i] = (
            a["points"], a["mask"], a["cells"], a["tile_offsets"])
    return apts, amask, acell, atoff, npad


def _op_grads(impl, fn, values):
    lk.set_level_bwd_impl(impl)
    try:
        return jax.grad(fn)(values)
    finally:
        lk.set_level_bwd_impl("fused")


class TestPool2Backward:
    @pytest.mark.parametrize("kind", ["max", "mean"])
    def test_matches_ref_vjp(self, kind):
        b, n, reso, f = 2, 700, 32, 8
        _, amask, acell, atoff, npad = _layout(b, n, reso, seed=4)
        rng = np.random.default_rng(5)
        values = jnp.asarray(rng.normal(0, 1, (b, npad, f)).astype(np.float32))
        cells_row = make_cells_row(jnp.asarray(acell))
        ct, _ = chunk_metadata(jnp.asarray(atoff), npad, reso, reso)
        mask = jnp.asarray(amask)
        n_tiles = (reso // 16) ** 2
        g = jnp.asarray(rng.normal(0, 1, (b, npad, f)).astype(np.float32))

        def loss(v):
            return jnp.sum(pool2(v, cells_row, ct, mask, n_tiles, kind) * g)

        dv_f = _op_grads("fused", loss, values)
        dv_r = _op_grads("ref", loss, values)
        np.testing.assert_allclose(dv_f, dv_r, atol=2e-5, rtol=2e-4)

    def test_scatter_plane_matches_ref_vjp(self):
        b, n, reso, f = 2, 700, 32, 8
        _, amask, acell, atoff, npad = _layout(b, n, reso, seed=6)
        rng = np.random.default_rng(7)
        values = jnp.asarray(rng.normal(0, 1, (b, npad, f)).astype(np.float32))
        cells_row = make_cells_row(jnp.asarray(acell))
        ct, _ = chunk_metadata(jnp.asarray(atoff), npad, reso, reso)
        tmask = empty_tile_mask(jnp.asarray(atoff), reso, reso)
        mask = jnp.asarray(amask)
        g = jnp.asarray(rng.normal(0, 1, (b, reso, reso, f)).astype(np.float32))

        def loss(v):
            return jnp.sum(scatter_plane2(v, cells_row, ct, tmask, mask,
                                          reso) * g)

        dv_f = _op_grads("fused", loss, values)
        dv_r = _op_grads("ref", loss, values)
        np.testing.assert_allclose(dv_f, dv_r, atol=2e-5, rtol=2e-4)


class TestEncoderBackward:
    def test_whole_encoder_grad_fused2_vs_plain(self):
        """End-to-end gradient through the whole pointnet+ALTO encoder:
        the fused2 backward stack (scatter_plane2 + pool2 + fused_level) vs
        the plain unsorted path, on the same parameters and point set."""
        reso, n, b = 32, 900, 2
        apts, amask, acell, atoff, _ = _layout(b, n, reso, seed=8)

        def build(sorted_impl):
            return LocalPoolPointnet(
                feature_dim=8, hidden_dim=8, plane_resolution=reso,
                scatter_type="max", unet_type="alto",
                unet_kwargs={"depth": 2, "start_filts": 8,
                             "merge_mode": "concat"},
                sorted_impl=sorted_impl, dtype=jnp.float32)

        plain = build("cumsum")
        fused = build("fused2")
        pts = jnp.asarray(apts)
        mask = jnp.asarray(amask)
        cells = jnp.asarray(acell)
        toff = jnp.asarray(atoff)
        params = plain.init(jax.random.PRNGKey(0), pts, mask)

        def loss_plain(p):
            out = plain.apply(p, pts, mask)["xy"]
            return jnp.sum(out * out)

        def loss_fused(p):
            out = fused.apply(p, pts, mask, cells, toff)["xy"]
            return jnp.sum(out * out)

        g_plain = jax.grad(loss_plain)(params)
        g_fused = jax.grad(loss_fused)(params)
        flat_p, _ = jax.flatten_util.ravel_pytree(g_plain)
        flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
        scale = float(jnp.max(jnp.abs(flat_p))) + 1e-8
        assert float(jnp.max(jnp.abs(flat_f - flat_p))) < 2e-4 * scale

    def test_sharded_grad_over_mesh(self):
        """GSPMD batch-shards the whole fused2 BACKWARD stack over the mesh
        (the training configuration's multi-chip path): per-device grads of
        the sharded batch must match the single-device grads."""
        from tomosar2height_tpu.parallel.mesh import (
            make_mesh,
            replicate,
            shard_batch,
        )

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        reso, n, b = 32, 900, 2
        apts, amask, acell, atoff, _ = _layout(b, n, reso, seed=12)
        fused = LocalPoolPointnet(
            feature_dim=8, hidden_dim=8, plane_resolution=reso,
            scatter_type="max", unet_type="alto",
            unet_kwargs={"depth": 2, "start_filts": 8, "merge_mode": "concat"},
            sorted_impl="fused2", dtype=jnp.float32)
        params = fused.init(jax.random.PRNGKey(0), jnp.asarray(apts[:1]),
                            jnp.asarray(amask[:1]), jnp.asarray(acell[:1]),
                            jnp.asarray(atoff[:1]))

        def loss(p, pts, mask, cells, toff):
            out = fused.apply(p, pts, mask, cells, toff)["xy"]
            return jnp.sum(out * out)

        g_ref = jax.grad(loss)(params, jnp.asarray(apts), jnp.asarray(amask),
                               jnp.asarray(acell), jnp.asarray(atoff))
        mesh = make_mesh(2)
        dev = shard_batch({"p": apts, "m": amask, "c": acell, "t": atoff},
                          mesh)
        g_sh = jax.jit(jax.grad(loss))(replicate(params, mesh), dev["p"],
                                       dev["m"], dev["c"], dev["t"])
        flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
        flat_s, _ = jax.flatten_util.ravel_pytree(g_sh)
        np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_r),
                                   rtol=1e-5, atol=1e-5)
