"""Shared building blocks. Parity: reference tomosar2height/block/resnet.py:4-54."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

# All kernels Xavier-uniform, biases zero — the reference's model-shell init
# pass overrides every Conv/Linear this way (model.py:46-52), including the
# ResnetBlockFC zero-init of fc_1 (resnet.py:34), so Xavier is the effective init.
kernel_init = nn.initializers.xavier_uniform()


class ResnetBlockFC(nn.Module):
    """Fully-connected residual block: x_s + fc_1(relu(fc_0(relu(x)))).

    Parity: reference block/resnet.py:36-54 (pre-activation, linear shortcut when
    the width changes).
    """

    size_out: Optional[int] = None
    size_h: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size_in = x.shape[-1]
        size_out = self.size_out if self.size_out is not None else size_in
        size_h = self.size_h if self.size_h is not None else min(size_in, size_out)

        net = nn.Dense(size_h, kernel_init=kernel_init, dtype=self.dtype, name="fc_0")(
            nn.relu(x)
        )
        dx = nn.Dense(size_out, kernel_init=kernel_init, dtype=self.dtype, name="fc_1")(
            nn.relu(net)
        )
        if size_in != size_out:
            x_s = nn.Dense(
                size_out, use_bias=False, kernel_init=kernel_init, dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            x_s = x
        return x_s + dx


# 3x3 conv backend: False (default) = XLA everywhere; True = the Pallas tap-
# matmul kernel (ops/pallas/conv_kernel.py). Profiler verdict on v5e: the
# kernel only matches XLA's conv speed at model shapes (both ~15-27 TF/s —
# skinny K/N matmul shapes cap the MXU) while its boundary-row side input
# adds ~3 ms of pad traffic per forward. NOTE the kernel is exact (f32
# HIGHEST taps); it is the XLA conv that is loose on this chip — the
# terminal's --xla_allow_excess_precision lets f32 convs run bf16-rounded
# passes (~1e-2 abs err, verified by identity-weight bisection).
FAST_CONV = {"enabled": False}


def set_fast_conv(enabled: bool | None) -> None:
    """Select the conv backend for subsequently TRACED programs.

    The flag is read at trace time inside ``Conv3x3.__call__``, so it must be
    set BEFORE the first jit compilation of a given shape: already-compiled
    programs keep the backend they were traced with (jit caches are keyed on
    shapes/dtypes, not this flag). A/B profilers must use fresh processes or
    fresh shapes per setting (ADVICE r02). The default stays XLA — measured
    equal-speed at model shapes; see the note above.
    """
    FAST_CONV["enabled"] = enabled


def _fast_conv_on() -> bool:
    import jax

    on = FAST_CONV["enabled"]
    if on is None:
        return jax.default_backend() == "tpu"
    return bool(on)


class Conv3x3(nn.Module):
    """3x3 SAME conv with optional fused ReLU; parameter tree identical to
    ``nn.Conv`` ('kernel' (3,3,Cin,Cout) + 'bias'), so checkpoints and the
    torch-parity port are backend-independent."""

    features: int
    use_relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", kernel_init, (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if _fast_conv_on():
            from tomosar2height_tpu.ops.pallas.conv_kernel import pallas_conv3x3

            return pallas_conv3x3(x, kernel, bias, relu=self.use_relu)
        import jax

        # no preferred_element_type: the MXU still accumulates f32 internally,
        # and a mixed-dtype output breaks lax.conv's transpose rule under grad
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bias.astype(y.dtype)
        return nn.relu(y) if self.use_relu else y


def conv3x3(features: int, name: str | None = None, dtype=jnp.float32,
            relu: bool = False) -> nn.Module:
    """3x3 same-padding conv (reference unet.py:8-18 / alto.py:11-20).

    ``relu=True`` fuses the activation into the conv (numerically identical
    to ``nn.relu(conv(x))``)."""
    return Conv3x3(features, use_relu=relu, dtype=dtype, name=name)


def conv1x1(features: int, name: str | None = None, dtype=jnp.float32) -> nn.Conv:
    """1x1 conv (reference unet.py:37-45 / alto.py:38-45)."""
    return nn.Conv(features, (1, 1), kernel_init=kernel_init, dtype=dtype, name=name)


def upconv2x2(features: int, name: str | None = None, dtype=jnp.float32) -> nn.ConvTranspose:
    """2x2 stride-2 transpose conv; output is exactly 2x the spatial size
    (reference unet.py:21-34 'transpose' mode)."""
    return nn.ConvTranspose(features, (2, 2), strides=(2, 2), padding="VALID",
                            kernel_init=kernel_init, dtype=dtype, name=name)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class DenseParams(nn.Module):
    """Declares nn.Dense-compatible params ('kernel' (in, out) + 'bias')
    without applying them — the fused ALTO level kernel
    (ops/pallas/level_kernel.py) consumes the raw arrays. Param tree, shapes
    and init are identical to ``nn.Dense``, so checkpoints are interchangeable
    between the fused and composed paths."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kernel_init, (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class Conv3x3Params(nn.Module):
    """Declares Conv3x3-compatible params ('kernel' (3, 3, Cin, Cout) +
    'bias') without applying them — the fused decoder-head kernel
    (ops/pallas/decoder_kernel.py) consumes the raw arrays. Tree-identical
    to :class:`Conv3x3`, so checkpoints are interchangeable."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kernel_init,
                       (3, 3, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class Conv1x1Params(nn.Module):
    """Raw params of a 1x1 conv / Conv1x1Split head, tree-identical."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kernel_init,
                       (1, 1, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class MLP2Params(nn.Module):
    """Raw params of :class:`MLP2` (fc_in/fc_out), tree-identical."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        wi, bi = DenseParams(2 * self.features, self.in_features, name="fc_in")()
        wo, bo = DenseParams(self.features, 2 * self.features, name="fc_out")()
        return wi, bi, wo, bo


class MLP2(nn.Module):
    """Linear(d, 2d) -> ReLU -> Linear(2d, d): the ALTO ``fc_comm`` communication
    MLP (reference alto.py:63-67,164-168)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(2 * self.features, kernel_init=kernel_init, dtype=self.dtype,
                     name="fc_in")(x)
        x = nn.relu(x)
        return nn.Dense(self.features, kernel_init=kernel_init, dtype=self.dtype,
                        name="fc_out")(x)
