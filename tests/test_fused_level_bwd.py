"""Gradient parity for the fused ALTO level BACKWARD kernel
(ops/pallas/level_bwd_kernel.py).

The fused backward must produce the same (d_plane, d_c_last, d_weights) as
the XLA reference composition's vjp (``_level_ref``) that previously served
as the custom_vjp backward. Interpret mode on CPU runs the identical kernel
program; f32 inputs with HIGHEST-precision matmuls should agree to ~1e-5.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tomosar2height_tpu.ops.pallas import level_kernel as lk  # noqa: E402
from tomosar2height_tpu.ops.pallas.level_kernel import (  # noqa: E402
    PCHUNK,
    _level_ref,
    chunk_metadata,
    empty_tile_mask,
    fused_level,
    make_aux_packed,
    make_cells_row,
)
from tomosar2height_tpu.ops.sorted_scatter import (  # noqa: E402
    ALIGNED_TILE_CELLS,
    aligned_bucket_size,
    host_morton_bucket_aligned,
)


def _aligned(b, n, reso, seed, frac_masked=0.1):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.0, 1.0, (b, n, 3)).astype(np.float32)
    # exercise the border-clamp paths in the d_plane overlap-add
    pts[:, :8, :2] = rng.choice([0.0, 1.0, 0.001, 0.999], (b, 8, 2))
    mask = rng.random((b, n)) > frac_masked
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


def _weights(rng, f, fl, dtype=np.float32):
    s = lambda *sh: rng.normal(0, 0.2, sh).astype(dtype)
    return (s(f, 2 * f), s(2 * f), s(2 * f, f), s(f), s(fl, f), s(f))


def _setup(reso, level_reso, f, fl, b=2, n=700, seed=0):
    apts, amask, acell, atoff, npad = _aligned(b, n, reso, seed=seed + reso)
    rng = np.random.default_rng(seed + 1)
    plane = jnp.asarray(rng.normal(0, 1, (b, level_reso, level_reso, f))
                        .astype(np.float32))
    c_last = jnp.asarray(
        np.where(amask[..., None], rng.normal(0, 1, (b, npad, fl)), 0)
        .astype(np.float32))
    weights = tuple(jnp.asarray(w) for w in _weights(rng, f, fl))
    xy = jnp.asarray(apts[..., :2])
    aux = make_aux_packed(xy)
    cells_row = make_cells_row(jnp.asarray(acell))
    toff = jnp.asarray(atoff)
    ct, pt = chunk_metadata(toff, npad, level_reso, reso)
    tmask = empty_tile_mask(toff, level_reso, reso)
    mask = jnp.asarray(amask)
    cells = jnp.asarray(acell)
    g_p = jnp.asarray(rng.normal(0, 1, (b, level_reso, level_reso, f))
                      .astype(np.float32))
    g_c = jnp.asarray(rng.normal(0, 1, (b, npad, f)).astype(np.float32))
    return (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
            xy, cells, g_p, g_c)


def _grads(impl, plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
           g_p, g_c, level_reso, reso):
    lk.set_level_bwd_impl(impl)
    try:
        def loss(p, cl, w):
            po, co = fused_level(p, cl, w, aux, cells_row, ct, pt, tmask,
                                 mask, level_reso, reso)
            return jnp.sum(po * g_p) + jnp.sum(co * g_c)

        return jax.grad(loss, argnums=(0, 1, 2))(plane, c_last, weights)
    finally:
        lk.set_level_bwd_impl("fused")


class TestFusedLevelBackward:
    @pytest.mark.parametrize("reso,level_reso,f,fl", [
        (64, 64, 8, 4),     # finest-resolution level, odd channel counts
        (64, 32, 16, 16),   # coarsened level (cells >> shift path)
        (32, 32, 8, 8),     # minimum window resolution (full-width windows)
    ])
    def test_matches_ref_vjp(self, reso, level_reso, f, fl):
        (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
         xy, cells, g_p, g_c) = _setup(reso, level_reso, f, fl)
        args = (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
                g_p, g_c, level_reso, reso)
        dp_f, dcl_f, dw_f = _grads("fused", *args)
        dp_r, dcl_r, dw_r = _grads("ref", *args)
        np.testing.assert_allclose(dp_f, dp_r, atol=2e-5, rtol=2e-4)
        np.testing.assert_allclose(dcl_f, dcl_r, atol=2e-5, rtol=2e-4)
        for a, b, name in zip(dw_f, dw_r,
                              ["w_in", "b_in", "w_out", "b_out", "w_c", "b_c"]):
            np.testing.assert_allclose(a, b, atol=3e-5, rtol=3e-4,
                                       err_msg=name)

    def test_matches_direct_xla_grad(self):
        """Cross-check against the composition differentiated DIRECTLY (no
        custom_vjp anywhere): guards the fwd/bwd pair as a unit."""
        reso = level_reso = 32
        f = fl = 8
        (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
         xy, cells, g_p, g_c) = _setup(reso, level_reso, f, fl, seed=7)

        def loss_ref(p, cl, w):
            po, co = _level_ref(p, cl, w, xy, cells, mask, level_reso, reso)
            return jnp.sum(po * g_p) + jnp.sum(co * g_c)

        dp_r, dcl_r, dw_r = jax.grad(loss_ref, argnums=(0, 1, 2))(
            plane, c_last, weights)
        args = (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
                g_p, g_c, level_reso, reso)
        dp_f, dcl_f, dw_f = _grads("fused", *args)
        np.testing.assert_allclose(dp_f, dp_r, atol=2e-5, rtol=2e-4)
        np.testing.assert_allclose(dcl_f, dcl_r, atol=2e-5, rtol=2e-4)
        for a, b in zip(dw_f, dw_r):
            np.testing.assert_allclose(a, b, atol=3e-5, rtol=3e-4)

    def test_empty_batch_row(self):
        """A batch element with zero valid points must contribute zero grads
        (garbage counts/windows for unvisited tiles must be masked out)."""
        reso = level_reso = 32
        f = fl = 8
        (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
         xy, cells, g_p, g_c) = _setup(reso, level_reso, f, fl, seed=3)
        # kill every point of batch row 1 the way the layout builder would:
        # mask off + sentinel cells + empty tile offsets
        mask = mask.at[1].set(False)
        args = (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
                g_p, g_c, level_reso, reso)
        dp_f, dcl_f, dw_f = _grads("fused", *args)
        dp_r, dcl_r, dw_r = _grads("ref", *args)
        np.testing.assert_allclose(dp_f, dp_r, atol=2e-5, rtol=2e-4)
        np.testing.assert_allclose(dcl_f, dcl_r, atol=2e-5, rtol=2e-4)

    def test_bf16_backward_runs(self):
        """bf16 grads must trace/run and be no less accurate than the bf16
        XLA reference vjp (the bwd mirrors the fwd's bf16 weight truncation).

        The f32 reference is NOT a usable yardstick here: the bf16 XLA ref
        itself lands ~26% max-rel away from f32 on this input (cancellation
        in d_plane under bf16 rounding), so the fused kernel is held to the
        bf16 reference's own error floor instead.
        """
        reso = level_reso = 32
        f = fl = 8
        (plane, c_last, weights, aux, cells_row, ct, pt, tmask, mask,
         xy, cells, g_p, g_c) = _setup(reso, level_reso, f, fl, seed=11)
        bf = jnp.bfloat16
        args16 = (plane.astype(bf), c_last.astype(bf),
                  tuple(w.astype(bf) for w in weights), aux, cells_row,
                  ct, pt, tmask, mask, g_p.astype(bf), g_c.astype(bf),
                  level_reso, reso)
        dp16, dcl16, dw16 = _grads("fused", *args16)
        dp16r, dcl16r, dw16r = _grads("ref", *args16)
        args32 = (plane, c_last, weights, aux, cells_row, ct, pt, tmask,
                  mask, g_p, g_c, level_reso, reso)
        dp32, dcl32, dw32 = _grads("ref", *args32)
        assert dp16.dtype == bf and dcl16.dtype == bf

        def err(a, b):
            return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                         - b.astype(jnp.float32))))

        # fused must be within 1.5x the bf16 XLA ref's own distance from f32
        # (accumulation orders differ; neither is "more correct" in bf16),
        # with an absolute floor of 2% of the grad scale.
        for g16, g16r, g32 in ((dp16, dp16r, dp32), (dcl16, dcl16r, dcl32)):
            scale = float(jnp.max(jnp.abs(g32))) + 1e-6
            floor = max(1.5 * err(g16r, g32), 0.02 * scale)
            assert err(g16, g32) <= floor, (err(g16, g32), floor)
