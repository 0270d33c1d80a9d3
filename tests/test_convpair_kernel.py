"""Golden tests for the fused conv3x3 pair (+pool) kernel
(ops/pallas/convpair_kernel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tomosar2height_tpu.ops.pallas.convpair_kernel import (
    _xla_pair,
    fused_conv_pair,
)


def _mk(rng, cin, c1, c2, dtype=jnp.float32):
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3,
                               dtype)
    return (mk((3, 3, cin, c1)), mk((c1,)), mk((3, 3, c1, c2)), mk((c2,)))


class TestFusedConvPair:
    @pytest.mark.parametrize("h,cin,c1,c2,pool", [
        (64, 8, 16, 16, False),    # equal pair channels
        (96, 8, 16, 32, True),     # widening pair + pool, multi-band
        (16, 32, 64, 64, True),    # deep-level shape (single band)
        (64, 3, 32, 32, True),     # image U-Net first level (RGB in)
    ])
    def test_matches_xla_f32(self, rng, h, cin, c1, c2, pool):
        w1, b1, w2, b2 = _mk(rng, cin, c1, c2)
        x = jnp.asarray(rng.normal(size=(2, h, h, cin)).astype(np.float32))
        got_y, got_p = fused_conv_pair(x, w1, b1, w2, b2, pool)
        want_y, want_p = _xla_pair(x, w1, b1, w2, b2, pool)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-5, atol=1e-4)
        if pool:
            np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                                       rtol=1e-5, atol=1e-4)
        else:
            assert got_p is None

    def test_grad_matches_xla(self, rng):
        w1, b1, w2, b2 = _mk(rng, 8, 16, 16)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 8)).astype(np.float32))

        def loss_f(x, w1, b1, w2, b2):
            y, p = fused_conv_pair(x, w1, b1, w2, b2, True)
            return y.sum() + (p ** 2).sum()

        def loss_r(x, w1, b1, w2, b2):
            y, p = _xla_pair(x, w1, b1, w2, b2, True)
            return y.sum() + (p ** 2).sum()

        g_f = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-3)


class TestModelIntegration:
    def test_plain_unet_fused_matches(self, rng):
        import flax.linen as jnn  # noqa: F401

        from tomosar2height_tpu.models.unet import UNet

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        plain = UNet(num_classes=8, depth=3, start_filts=8)
        fused = UNet(num_classes=8, depth=3, start_filts=8, fused_convs=True)
        params = plain.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(
                    fused.init(jax.random.PRNGKey(0), x)))
        np.testing.assert_allclose(
            np.asarray(fused.apply(params, x)),
            np.asarray(plain.apply(params, x)), rtol=1e-5, atol=1e-4)

    def test_alto_unet_fused_matches(self, rng):
        from tomosar2height_tpu.models.alto import AltoUNet

        n = 128
        pts = jnp.asarray(rng.uniform(0.01, 0.99, (1, n, 3)).astype(np.float32))
        mask = jnp.ones((1, n), bool)
        plane = jnp.asarray(rng.normal(size=(1, 32, 32, 8)).astype(np.float32))
        c = jnp.asarray(rng.normal(size=(1, n, 8)).astype(np.float32))
        plain = AltoUNet(num_classes=8, depth=3, start_filts=8)
        fused = AltoUNet(num_classes=8, depth=3, start_filts=8,
                         fused_convs=True)
        params = plain.init(jax.random.PRNGKey(0), pts, plane, c, mask)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(
                    fused.init(jax.random.PRNGKey(0), pts, plane, c, mask)))
        np.testing.assert_allclose(
            np.asarray(fused.apply(params, pts, plane, c, mask)),
            np.asarray(plain.apply(params, pts, plane, c, mask)),
            rtol=1e-4, atol=1e-3)


class TestMeshSharding:
    def test_batch_shards_over_mesh(self, rng):
        """GSPMD batch-shards the band kernels over the device mesh."""
        from tomosar2height_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        from tomosar2height_tpu.models.decoder import ConvDecoder
        from tomosar2height_tpu.models.unet import UNet

        mesh = make_mesh(2)
        for mod in (ConvDecoder(1, False, jnp.float32, fused=True),
                    UNet(num_classes=8, depth=3, start_filts=8,
                         fused_convs=True)):
            x = np.asarray(rng.normal(size=(4, 64, 64, 8 if isinstance(mod, ConvDecoder) else 3)),
                           np.float32)
            params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
            dev = shard_batch({"x": x}, mesh)
            rp = replicate(params, mesh)
            out = jax.jit(lambda pr, v: mod.apply(pr, v))(rp, dev["x"])
            ref = mod.apply(params, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-4)
