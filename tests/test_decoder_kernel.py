"""Golden tests for the fused ConvDecoder head kernel
(ops/pallas/decoder_kernel.py) vs the composed flax path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tomosar2height_tpu.models.decoder import ConvDecoder
from tomosar2height_tpu.ops.pallas.decoder_kernel import (
    _xla_decoder,
    fused_conv_decoder,
)


def _params(rng, cin, cout=1, dtype=jnp.float32):
    k = {}
    shapes = {
        "w1": (3, 3, cin, 64), "b1": (64,),
        "w2": (3, 3, 64, 128), "b2": (128,),
        "w3": (3, 3, 128, 64), "b3": (64,),
        "w4": (1, 1, cin + 256, cout), "b4": (cout,),
    }
    for name, s in shapes.items():
        k[name] = jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2,
                              dtype)
    return k


class TestFusedConvDecoder:
    @pytest.mark.parametrize("h", [64, 96])
    def test_matches_xla_f32(self, rng, h):
        cin = 8
        p = _params(rng, cin)
        x = jnp.asarray(rng.normal(size=(2, h, h, cin)).astype(np.float32))
        got = fused_conv_decoder(x, p["w1"], p["b1"], p["w2"], p["b2"],
                                 p["w3"], p["b3"], p["w4"], p["b4"])
        want = _xla_decoder(x, p["w1"], p["b1"], p["w2"], p["b2"],
                            p["w3"], p["b3"], p["w4"], p["b4"])
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)

    def test_bf16_within_bf16_ref_floor(self, rng):
        """bf16 operands/f32 accumulation: compare against the f32 oracle
        with a tolerance set by the bf16 XLA composition's own error."""
        cin = 8
        p32 = _params(rng, cin)
        x32 = jnp.asarray(rng.normal(size=(1, 64, 64, cin)).astype(np.float32))
        want = np.asarray(_xla_decoder(x32, *[p32[k] for k in
                                              ("w1", "b1", "w2", "b2", "w3",
                                               "b3", "w4", "b4")]))
        p = {k: v.astype(jnp.bfloat16) for k, v in p32.items()}
        got = np.asarray(fused_conv_decoder(
            x32.astype(jnp.bfloat16), p["w1"], p["b1"], p["w2"], p["b2"],
            p["w3"], p["b3"], p["w4"], p["b4"]))
        # bf16 reference composition's own distance from the f32 oracle
        def conv_bf16(v, k, b):
            y = jax.lax.conv_general_dilated(
                v, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.relu(y + b)

        xb = x32.astype(jnp.bfloat16)
        x1 = conv_bf16(xb, p["w1"], p["b1"])
        x2 = conv_bf16(x1, p["w2"], p["b2"])
        x3 = conv_bf16(x2, p["w3"], p["b3"])
        ref = np.asarray(p["b4"].astype(jnp.float32))
        off = 0
        for part in (xb, x1, x2, x3):
            c = part.shape[-1]
            ref = ref + np.asarray(jnp.einsum(
                "bhwc,cd->bhwd", part, p["w4"][0, 0, off:off + c],
                preferred_element_type=jnp.float32))
            off += c
        floor = np.abs(ref - want).max()
        err = np.abs(got - want).max()
        assert err <= max(4 * floor, 1e-2), (err, floor)

    def test_grad_matches_xla_composition(self, rng):
        cin = 8
        p = _params(rng, cin)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, cin)).astype(np.float32))
        args = (x, p["w1"], p["b1"], p["w2"], p["b2"], p["w3"], p["b3"],
                p["w4"], p["b4"])
        g_f = jax.grad(lambda *a: fused_conv_decoder(*a).sum(),
                       argnums=tuple(range(9)))(*args)
        g_r = jax.grad(lambda *a: _xla_decoder(*a).sum(),
                       argnums=tuple(range(9)))(*args)
        for a, b in zip(g_f, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-3)

    def test_module_fused_matches_composed(self, rng):
        """ConvDecoder(fused=True) == ConvDecoder() with the SAME param tree
        (checkpoint interchangeability)."""
        cin = 8
        x = jnp.asarray(rng.normal(size=(2, 64, 64, cin)).astype(np.float32))
        plain = ConvDecoder(1, False, jnp.float32)
        fused = ConvDecoder(1, False, jnp.float32, fused=True)
        params = plain.init(jax.random.PRNGKey(0), x)
        chex = jax.tree_util.tree_structure(params)
        params_f = fused.init(jax.random.PRNGKey(0), x)
        assert chex == jax.tree_util.tree_structure(params_f)
        want = plain.apply(params, x)
        got = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)
