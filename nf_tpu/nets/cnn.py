"""Convolutional conditioner networks (reference ``normflows/nets/cnn.py``).

NCHW layout; convs lower to XLA's conv-on-MXU path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.module import Module, static_field


class Conv2d(Module):
    """Same-padded 2D convolution, NCHW, weight layout OIHW."""

    weight: jax.Array  # (out, in, kh, kw)
    bias: Optional[jax.Array]
    stride: int = static_field(default=1)

    @classmethod
    def create(cls, key, in_channels, out_channels, kernel_size, bias=True,
               init_zeros=False, weight_std=None, dtype=jnp.float32):
        kw, kb = jax.random.split(key)
        shape = (out_channels, in_channels, kernel_size, kernel_size)
        fan_in = in_channels * kernel_size * kernel_size
        if init_zeros:
            weight = jnp.zeros(shape, dtype)
        elif weight_std is not None:
            weight = weight_std * jax.random.normal(kw, shape, dtype)
        else:
            bound = 1.0 / jnp.sqrt(fan_in)
            weight = jax.random.uniform(kw, shape, dtype, -bound, bound)
        if bias:
            if init_zeros:
                b = jnp.zeros((out_channels,), dtype)
            else:
                bound = 1.0 / jnp.sqrt(fan_in)
                b = jax.random.uniform(kb, (out_channels,), dtype, -bound,
                                       bound)
        else:
            b = None
        return cls(weight=weight, bias=b)

    def __call__(self, x):
        pad = self.weight.shape[-1] // 2
        y = jax.lax.conv_general_dilated(
            x, self.weight,
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.bias is not None:
            y = y + self.bias[None, :, None, None]
        return y


class _NetActNorm(Module):
    """Net-side ActNorm used between ConvNet2d layers
    (reference ``utils/nn.py:27-43``): forward only, affine per channel."""

    s: jax.Array
    t: jax.Array

    @classmethod
    def create(cls, shape, dtype=jnp.float32):
        return cls(s=jnp.zeros((1,) + tuple(shape), dtype),
                   t=jnp.zeros((1,) + tuple(shape), dtype))

    def __call__(self, x):
        return x * jnp.exp(self.s) + self.t


class ConvNet2d(Module):
    """Glow's coupling conditioner: convs with LeakyReLU, zero-init output,
    optional inter-layer ActNorm (reference ``nets/cnn.py:5-63``).

    ``channels``: list with in_channels first; ``kernel_size``: per-layer
    kernel sizes (e.g. (3, 1, 3)).
    """

    convs: tuple
    actnorms: Optional[tuple]
    leaky: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, channels, kernel_size, leaky=0.0, init_zeros=True,
               actnorm=False, weight_std=None, dtype=jnp.float32):
        n = len(kernel_size)
        keys = jax.random.split(key, n)
        convs, actnorms = [], []
        for i in range(n - 1):
            convs.append(Conv2d.create(
                keys[i], channels[i], channels[i + 1], kernel_size[i],
                bias=(not actnorm), weight_std=weight_std, dtype=dtype))
            if actnorm:
                actnorms.append(_NetActNorm.create((channels[i + 1], 1, 1),
                                                   dtype))
        convs.append(Conv2d.create(keys[n - 1], channels[n - 1], channels[n],
                                   kernel_size[n - 1], init_zeros=init_zeros,
                                   dtype=dtype))
        return cls(convs=tuple(convs), actnorms=tuple(actnorms) or None,
                   leaky=leaky)

    def __call__(self, x):
        for i, conv in enumerate(self.convs[:-1]):
            x = conv(x)
            if self.actnorms is not None:
                x = self.actnorms[i](x)
            x = jax.nn.leaky_relu(x, negative_slope=self.leaky)
        return self.convs[-1](x)
