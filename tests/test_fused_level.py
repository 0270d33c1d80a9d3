"""Golden tests for the fused ALTO level kernel (ops/pallas/level_kernel.py).

The kernel fuses one whole level round trip (bilinear gather -> fc_comm MLP
-> fc_c skip -> scatter_mean; reference alto.py:97-138) into one pallas_call
on the chunk-aligned Morton layout. Interpret mode on CPU runs the identical
program; parity targets are the XLA composition ``_level_ref`` and the plain
unaligned model path.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tomosar2height_tpu.models.pointnet import LocalPoolPointnet  # noqa: E402
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


class TestFusedLevelKernel:
    @pytest.mark.parametrize("reso,level_reso,f,fl", [
        (64, 64, 8, 4),     # finest-resolution level, odd channel counts
        (64, 32, 16, 16),   # coarsened level (cells >> shift path)
        (32, 32, 8, 8),     # minimum window resolution
    ])
    def test_matches_xla_composition(self, reso, level_reso, f, fl):
        b, n = 2, 700
        apts, amask, acell, atoff, npad = _aligned(b, n, reso, seed=reso + f)
        rng = np.random.default_rng(1)
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

        got_p, got_c = fused_level(plane, c_last, weights, aux, cells_row,
                                   ct, pt, tmask, mask, level_reso, reso)
        ref_p, ref_c = _level_ref(plane, c_last, weights, xy,
                                  jnp.asarray(acell), mask, level_reso, reso)
        # contract: pad rows (in-chunk AND tail chunks) are exact in-kernel zeros
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                                   rtol=1e-5, atol=1e-5)

    def test_empty_patch_and_empty_tiles(self):
        """A fully-masked batch entry yields zero outputs; empty tiles too."""
        b, n, reso = 2, 120, 32  # sparse: most tiles empty
        apts, amask, acell, atoff, npad = _aligned(b, n, reso, seed=9)
        amask[1] = False
        acell[1] = 1 << 30
        atoff[1] = 0
        rng = np.random.default_rng(2)
        f = fl = 8
        plane = jnp.asarray(rng.normal(0, 1, (b, reso, reso, f)).astype(np.float32))
        c_last = jnp.asarray(rng.normal(0, 1, (b, npad, fl)).astype(np.float32))
        c_last = jnp.where(jnp.asarray(amask)[..., None], c_last, 0)
        weights = tuple(jnp.asarray(w) for w in _weights(rng, f, fl))
        aux = make_aux_packed(jnp.asarray(apts[..., :2]))
        cells_row = make_cells_row(jnp.asarray(acell))
        toff = jnp.asarray(atoff)
        ct, pt = chunk_metadata(toff, npad, reso, reso)
        tmask = empty_tile_mask(toff, reso, reso)
        got_p, got_c = fused_level(plane, c_last, weights, aux, cells_row,
                                   ct, pt, tmask, jnp.asarray(amask), reso, reso)
        assert np.all(np.asarray(got_p[1]) == 0)
        assert np.all(np.asarray(got_c[1]) == 0)
        ref_p, ref_c = _level_ref(plane, c_last, weights,
                                  jnp.asarray(apts[..., :2]),
                                  jnp.asarray(acell), jnp.asarray(amask),
                                  reso, reso)
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_matches_composition(self):
        b, n, reso, f, fl = 1, 400, 32, 8, 8
        apts, amask, acell, atoff, npad = _aligned(b, n, reso, seed=5)
        rng = np.random.default_rng(3)
        plane = jnp.asarray(rng.normal(0, 1, (b, reso, reso, f)).astype(np.float32))
        c_last = jnp.asarray(
            np.where(amask[..., None], rng.normal(0, 1, (b, npad, fl)), 0)
            .astype(np.float32))
        weights = tuple(jnp.asarray(w) for w in _weights(rng, f, fl))
        xy = jnp.asarray(apts[..., :2])
        aux = make_aux_packed(xy)
        cells_row = make_cells_row(jnp.asarray(acell))
        toff = jnp.asarray(atoff)
        ct, pt = chunk_metadata(toff, npad, reso, reso)
        tmask = empty_tile_mask(toff, reso, reso)
        mask = jnp.asarray(amask)

        def loss_fused(p, cl, w):
            po, co = fused_level(p, cl, w, aux, cells_row, ct, pt, tmask,
                                 mask, reso, reso)
            return (po * po).sum() + co.sum()

        def loss_ref(p, cl, w):
            po, co = _level_ref(p, cl, w, xy, jnp.asarray(acell), mask,
                                reso, reso)
            return (po * po).sum() + co.sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(plane, c_last, weights)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(plane, c_last, weights)
        for a, b_ in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=5e-4, atol=5e-4)


RESO = 64
N = 1500


def _build(sorted_impl="cumsum"):
    return LocalPoolPointnet(
        feature_dim=8, hidden_dim=8, plane_resolution=RESO,
        scatter_type="max", unet_type="alto",
        unet_kwargs={"depth": 3, "start_filts": 8, "merge_mode": "concat"},
        sorted_impl=sorted_impl, dtype=jnp.float32,
    )


class TestFused2ModelParity:
    @pytest.fixture(scope="class")
    def data(self):
        rng = np.random.default_rng(42)
        b = 2
        pts = rng.uniform(0.001, 0.999, (b, N, 3)).astype(np.float32)
        mask = rng.random((b, N)) > 0.05
        apts, amask, acell, atoff, _ = _aligned(b, N, RESO, seed=0)
        # regenerate from the same points so plain/fused see identical sets
        npad = aligned_bucket_size(N, RESO, PCHUNK)
        apts = np.full((b, npad, 3), 0.5, np.float32)
        amask = np.zeros((b, npad), bool)
        acell = np.zeros((b, npad), np.int32)
        atoff = np.zeros((b, RESO * RESO // ALIGNED_TILE_CELLS + 1), np.int32)
        for i in range(b):
            a = host_morton_bucket_aligned(pts[i], mask[i], RESO, PCHUNK)
            apts[i], amask[i], acell[i], atoff[i] = (
                a["points"], a["mask"], a["cells"], a["tile_offsets"])
        return dict(pts=pts, mask=mask, apts=apts, amask=amask, acell=acell,
                    atoff=atoff)

    def test_forward_matches_plain(self, data):
        plain = _build("cumsum")
        fused = _build("fused2")
        params = plain.init(jax.random.PRNGKey(0),
                            jnp.asarray(data["pts"]), jnp.asarray(data["mask"]))
        out_plain = plain.apply(params, jnp.asarray(data["pts"]),
                                jnp.asarray(data["mask"]))["xy"]
        out_fused = fused.apply(params, jnp.asarray(data["apts"]),
                                jnp.asarray(data["amask"]),
                                jnp.asarray(data["acell"]),
                                jnp.asarray(data["atoff"]))["xy"]
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                                   rtol=2e-4, atol=2e-4)

    def test_param_tree_identical(self, data):
        """fused2 declares the same tree as the composed path, so checkpoints
        swap between backends."""
        plain = _build("cumsum")
        fused = _build("fused2")
        p0 = plain.init(jax.random.PRNGKey(0), jnp.asarray(data["pts"]),
                        jnp.asarray(data["mask"]))
        p1 = fused.init(jax.random.PRNGKey(0), jnp.asarray(data["apts"]),
                        jnp.asarray(data["amask"]), jnp.asarray(data["acell"]),
                        jnp.asarray(data["atoff"]))
        s0 = jax.tree.structure(p0)
        s1 = jax.tree.structure(p1)
        assert s0 == s1
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_grad_flows_and_matches(self, data):
        plain = _build("cumsum")
        fused = _build("fused2")
        params = plain.init(jax.random.PRNGKey(1),
                            jnp.asarray(data["pts"]), jnp.asarray(data["mask"]))

        def loss_plain(p):
            return plain.apply(p, jnp.asarray(data["pts"]),
                               jnp.asarray(data["mask"]))["xy"].sum()

        def loss_fused(p):
            return fused.apply(p, jnp.asarray(data["apts"]),
                               jnp.asarray(data["amask"]),
                               jnp.asarray(data["acell"]),
                               jnp.asarray(data["atoff"]))["xy"].sum()

        from jax.flatten_util import ravel_pytree

        g_plain = jax.grad(loss_plain)(params)
        g_fused = jax.grad(loss_fused)(params)
        flat_p, _ = ravel_pytree(g_plain)
        flat_f, _ = ravel_pytree(g_fused)
        denom = np.maximum(np.abs(np.asarray(flat_p)), 1e-3)
        rel = np.abs(np.asarray(flat_f) - np.asarray(flat_p)) / denom
        assert float(rel.max()) < 5e-3, f"max rel grad err {rel.max()}"

    def test_trimmed_layout_matches(self, data):
        """trim_aligned_batch (the serving default) preserves parity: tail
        chunks carry no information, only per-step cost."""
        from tomosar2height_tpu.ops.sorted_scatter import trim_aligned_batch

        plain = _build("cumsum")
        fused = _build("fused2")
        params = plain.init(jax.random.PRNGKey(0),
                            jnp.asarray(data["pts"]), jnp.asarray(data["mask"]))
        out_plain = plain.apply(params, jnp.asarray(data["pts"]),
                                jnp.asarray(data["mask"]))["xy"]
        # quantum=chunk so the tight 1024-cell layout still has rows to trim
        tp, tm, tc, tt = trim_aligned_batch(
            data["apts"], data["amask"], data["acell"], data["atoff"],
            quantum=128)
        assert tp.shape[1] < data["apts"].shape[1]  # actually trimmed
        out_fused = fused.apply(params, jnp.asarray(tp), jnp.asarray(tm),
                                jnp.asarray(tc), jnp.asarray(tt))["xy"]
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                                   rtol=2e-4, atol=2e-4)

    def test_sharded_over_mesh(self, data):
        """GSPMD batch-shards the chunk-grid kernels over the 8-device mesh
        bit-exactly (the serving configuration's multi-chip path)."""
        from tomosar2height_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        fused = _build("fused2")
        params = fused.init(jax.random.PRNGKey(0),
                            jnp.asarray(data["apts"][:1]),
                            jnp.asarray(data["amask"][:1]),
                            jnp.asarray(data["acell"][:1]),
                            jnp.asarray(data["atoff"][:1]))
        mesh = make_mesh(2)
        dev = shard_batch({"p": data["apts"], "m": data["amask"],
                           "c": data["acell"], "t": data["atoff"]}, mesh)
        rp = replicate(params, mesh)
        out = jax.jit(lambda pr, p, m, c, t: fused.apply(pr, p, m, c, t)["xy"])(
            rp, dev["p"], dev["m"], dev["c"], dev["t"])
        ref = fused.apply(params, jnp.asarray(data["apts"]),
                          jnp.asarray(data["amask"]),
                          jnp.asarray(data["acell"]),
                          jnp.asarray(data["atoff"]))["xy"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_tolerance(self, data):
        """bf16 fused2 stays within bf16-scale error of the bf16 plain path
        (the kernel truncates bilinear weights to bf16 — documented)."""
        plain = _build("cumsum").clone(dtype=jnp.bfloat16)
        fused = _build("fused2").clone(dtype=jnp.bfloat16)
        params = plain.init(jax.random.PRNGKey(0), jnp.asarray(data["pts"]),
                            jnp.asarray(data["mask"]))
        out_plain = plain.apply(params, jnp.asarray(data["pts"]),
                                jnp.asarray(data["mask"]))["xy"]
        out_fused = fused.apply(params, jnp.asarray(data["apts"]),
                                jnp.asarray(data["amask"]),
                                jnp.asarray(data["acell"]),
                                jnp.asarray(data["atoff"]))["xy"]
        err = np.abs(np.asarray(out_fused, np.float32)
                     - np.asarray(out_plain, np.float32))
        scale = np.abs(np.asarray(out_plain, np.float32)).max()
        assert err.max() <= 0.1 * max(scale, 1.0), (err.max(), scale)
