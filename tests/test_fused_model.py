"""Model-level equivalence of the fused Pallas path vs the plain XLA path.

Runs LocalPoolPointnet+ALTO with identical params on the same point set,
once with unaligned inputs (XLA segment/gather ops) and once with the
chunk-aligned layout (sorted_impl='fused' -> Pallas tile kernels in interpret
mode on CPU). The refined feature planes must match: the kernels compute the
same math, only the reduction order differs.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tomosar2height_tpu.models.pointnet import LocalPoolPointnet  # noqa: E402
from tomosar2height_tpu.ops.pallas.gather_kernel import CHUNK  # noqa: E402
from tomosar2height_tpu.ops.sorted_scatter import (  # noqa: E402
    aligned_bucket_size,
    host_morton_bucket_aligned,
)

RESO = 64
N = 1500


def _build(sorted_impl="cumsum", scatter_type="max"):
    return LocalPoolPointnet(
        feature_dim=8, hidden_dim=8, plane_resolution=RESO,
        scatter_type=scatter_type, unet_type="alto",
        unet_kwargs={"depth": 3, "start_filts": 8, "merge_mode": "concat"},
        sorted_impl=sorted_impl, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    b = 2
    pts = rng.uniform(0.001, 0.999, (b, N, 3)).astype(np.float32)
    mask = rng.random((b, N)) > 0.05
    # sorted_impl='fused' (round-2 per-op kernels) iterates 16x16 tiles ->
    # the layout must be built with 256-cell tiles, not the fused2 default
    npad = aligned_bucket_size(N, RESO, CHUNK, tile_cells=256)
    apts = np.full((b, npad, 3), 0.5, np.float32)
    amask = np.zeros((b, npad), bool)
    acell = np.zeros((b, npad), np.int32)
    atoff = np.zeros((b, RESO * RESO // 256 + 1), np.int32)
    for i in range(b):
        a = host_morton_bucket_aligned(pts[i], mask[i], RESO, CHUNK,
                                       tile_cells=256)
        apts[i], amask[i], acell[i], atoff[i] = (
            a["points"], a["mask"], a["cells"], a["tile_offsets"])
    return dict(pts=pts, mask=mask, apts=apts, amask=amask, acell=acell,
                atoff=atoff)


class TestFusedModelParity:
    @pytest.mark.parametrize("scatter_type", ["max", "mean"])
    def test_forward_matches_plain(self, data, scatter_type):
        plain = _build("cumsum", scatter_type)
        fused = _build("fused", scatter_type)
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

    def test_sharded_over_mesh(self, data):
        """GSPMD batch-shards the pallas_call path over the 8-device mesh."""
        import jax

        from tomosar2height_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        fused = _build("fused")
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

    def test_grad_flows_and_matches(self, data):
        plain = _build("cumsum")
        fused = _build("fused")
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
