"""Profiling utils + remat flag tests."""

import numpy as np

import jax
import jax.numpy as jnp

from tomosar2height_tpu.utils.profiling import PhaseTimer, device_trace


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        s = t.summary()
        assert s["time/a_total_s"] >= 0 and "time/a_mean_ms" in s
        assert t.counts["a"] == 2 and t.counts["b"] == 1
        t.reset()
        assert not t.totals

    def test_device_trace_noop(self, tmp_path):
        with device_trace(None):
            pass
        with device_trace(str(tmp_path / "trace")):
            jnp.ones(4).sum()


class TestRemat:
    def test_remat_same_output_and_grads(self, rng):
        from tomosar2height_tpu.models import TomoSAR2Height

        pts = jnp.asarray(rng.uniform(0.01, 0.99, (1, 256, 3)).astype(np.float32))
        mask = jnp.ones((1, 256), bool)
        kwargs = dict(
            encoder_kwargs={
                "feature_dim": 8, "hidden_dim": 8, "plane_resolution": 32,
                "unet_type": "alto",
                "unet_kwargs": {"depth": 3, "start_filts": 8, "merge_mode": "concat"},
            },
            decoder_kwargs={"hidden_dim": 8, "output_size": 64},
            z_scale=60.0,
        )
        m0 = TomoSAR2Height(remat=False, **kwargs)
        m1 = TomoSAR2Height(remat=True, **kwargs)
        params = m0.init(jax.random.PRNGKey(0), pts, mask, None)
        # remat must not change the parameter structure
        p1 = jax.eval_shape(lambda: m1.init(jax.random.PRNGKey(0), pts, mask, None))
        assert jax.tree.structure(params) == jax.tree.structure(p1)

        def loss(m, p):
            pa, _ = m.apply(p, pts, mask, None)
            return (pa ** 2).mean()

        l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestCompileCache:
    def test_cpu_backend_never_enables_persistent_cache(self, tmp_path):
        """Persistently-cached XLA:CPU AOT executables carry machine features
        across hosts (cpu_aot_loader mismatch -> intermittent SIGABRT mid-
        suite). enable_compile_cache must be a no-op on the CPU backend."""
        import jax

        from tomosar2height_tpu.utils import enable_compile_cache

        before = jax.config.jax_compilation_cache_dir
        enable_compile_cache(str(tmp_path / "jaxcache"))
        assert jax.config.jax_compilation_cache_dir == before
        assert not (tmp_path / "jaxcache").exists()
