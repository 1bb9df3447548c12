"""Residual conditioner networks (reference ``normflows/nets/resnet.py``).

Pre-activation residual MLP / CNN with optional GLU context gating
(``resnet.py:49``: ``glu(cat(h, W_ctx c)) == h * sigmoid(W_ctx c)``) and an
optional ``preprocessing`` hook (periodic features for circular NSF).
Batch norm uses batch statistics with learned affine (the reference only
ever instantiates these nets with ``use_batch_norm=False``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.module import Module, static_field
from .cnn import Conv2d
from .mlp import Linear


def _uniform_small(key, shape, dtype=jnp.float32, bound=1e-3):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _BatchAffineNorm(Module):
    """Batch-stat normalization with learned affine (BatchNorm in train
    mode, no running stats)."""

    gamma: jax.Array
    beta: jax.Array
    eps: float = static_field(default=1e-3)

    @classmethod
    def create(cls, features, eps=1e-3, dtype=jnp.float32):
        return cls(gamma=jnp.ones((features,), dtype),
                   beta=jnp.zeros((features,), dtype), eps=eps)

    def __call__(self, x):
        axes = (0,) if x.ndim == 2 else (0, 2, 3)
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if x.ndim == 2:
            return xn * self.gamma + self.beta
        return xn * self.gamma[None, :, None, None] \
            + self.beta[None, :, None, None]


def _bn_t(bn, x_t):
    """_BatchAffineNorm on feature-major ``(features, batch)`` data: the
    batch axis moves to 1, the affine broadcasts over it."""
    mean = jnp.mean(x_t, axis=1, keepdims=True)
    var = jnp.var(x_t, axis=1, keepdims=True)
    xn = (x_t - mean) * jax.lax.rsqrt(var + bn.eps)
    return xn * bn.gamma[:, None] + bn.beta[:, None]


class ResidualBlock(Module):
    """Pre-activation residual block (reference ``resnet.py:7-51``)."""

    linears: tuple
    context_layer: Optional[Linear]
    batch_norms: Optional[tuple]
    activation: Callable = static_field(default=jax.nn.relu)
    dropout: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, features, context_features=None,
               activation=jax.nn.relu, dropout_probability=0.0,
               use_batch_norm=False, zero_initialization=True,
               dtype=jnp.float32):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        l0 = Linear.create(k1, features, features, dtype=dtype)
        l1 = Linear.create(k2, features, features, dtype=dtype)
        if zero_initialization:
            l1 = l1.replace(weight=_uniform_small(k3, l1.weight.shape, dtype),
                            bias=_uniform_small(k4, l1.bias.shape, dtype))
        ctx = (Linear.create(k5, context_features, features, dtype=dtype)
               if context_features is not None else None)
        bns = (tuple(_BatchAffineNorm.create(features, dtype=dtype)
                     for _ in range(2)) if use_batch_norm else None)
        return cls(linears=(l0, l1), context_layer=ctx, batch_norms=bns,
                   activation=activation, dropout=dropout_probability)

    def __call__(self, inputs, context=None, key=None):
        temps = inputs
        if self.batch_norms is not None:
            temps = self.batch_norms[0](temps)
        temps = self.activation(temps)
        temps = self.linears[0](temps)
        if self.batch_norms is not None:
            temps = self.batch_norms[1](temps)
        temps = self.activation(temps)
        if self.dropout > 0 and key is not None:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(key, keep, temps.shape)
            temps = jnp.where(mask, temps / keep, 0.0)
        temps = self.linears[1](temps)
        if context is not None and self.context_layer is not None:
            temps = temps * jax.nn.sigmoid(self.context_layer(context))
        return inputs + temps

    def call_transposed(self, inputs_t, context_t=None, key=None):
        """Same block on feature-major ``(features, batch)`` activations
        (every matmul via ``Linear.matmul_t``; the rest is elementwise,
        so numerics match ``__call__`` exactly — enforced by
        tests/test_fused_head.py). Dropout draws its mask in the
        transposed shape: a different (equally valid) sample than the
        batch-major path."""
        temps = inputs_t
        if self.batch_norms is not None:
            temps = _bn_t(self.batch_norms[0], temps)
        temps = self.activation(temps)
        temps = self.linears[0].matmul_t(temps)
        if self.batch_norms is not None:
            temps = _bn_t(self.batch_norms[1], temps)
        temps = self.activation(temps)
        if self.dropout > 0 and key is not None:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(key, keep, temps.shape)
            temps = jnp.where(mask, temps / keep, 0.0)
        temps = self.linears[1].matmul_t(temps)
        if context_t is not None and self.context_layer is not None:
            temps = temps * jax.nn.sigmoid(
                self.context_layer.matmul_t(context_t))
        return inputs_t + temps


class ResidualNet(Module):
    """Residual MLP conditioner (reference ``resnet.py:54-104``)."""

    initial_layer: Linear
    blocks: tuple
    final_layer: Linear
    preprocessing: Optional[Any] = None
    hidden_features: int = static_field(default=0)
    context_features: Optional[int] = static_field(default=None)
    # None, or (features, mult): the head emits TRANSPOSED (out, batch)
    # output with rows ordered bin-major (param-major, feature-minor) —
    # spline params are born in the fused kernel's (K, N) layout and the
    # elementwise (N, K) -> (K, N) feed shuffle disappears (docs/kernels.md).
    # The reference layout is feature-major (B, features*mult); the two
    # differ by a fixed row permutation of the final weight/bias
    # (handled by nf_tpu.compat on import/export).
    bin_major_head: Optional[tuple] = static_field(default=None)

    @classmethod
    def create(cls, key, in_features, out_features, hidden_features,
               context_features=None, num_blocks=2, activation=jax.nn.relu,
               dropout_probability=0.0, use_batch_norm=False,
               preprocessing=None, bin_major_head=None, dtype=jnp.float32):
        keys = jax.random.split(key, num_blocks + 2)
        in_total = in_features + (context_features or 0)
        initial = Linear.create(keys[0], in_total, hidden_features,
                                dtype=dtype)
        blocks = tuple(
            ResidualBlock.create(keys[1 + i], hidden_features,
                                 context_features, activation,
                                 dropout_probability, use_batch_norm,
                                 dtype=dtype)
            for i in range(num_blocks))
        final = Linear.create(keys[-1], hidden_features, out_features,
                              dtype=dtype)
        if bin_major_head is not None:
            feats, mult = bin_major_head
            if feats * mult != out_features:
                raise ValueError(
                    f"bin_major_head {bin_major_head} does not factor "
                    f"out_features={out_features}")
            bin_major_head = (int(feats), int(mult))
        return cls(initial_layer=initial, blocks=blocks, final_layer=final,
                   preprocessing=preprocessing,
                   hidden_features=hidden_features,
                   context_features=context_features,
                   bin_major_head=bin_major_head)

    def __call__(self, inputs, context=None, key=None):
        temps = inputs if self.preprocessing is None \
            else self.preprocessing(inputs)
        if context is not None:
            temps = self.initial_layer(
                jnp.concatenate([temps, context], axis=1))
        else:
            temps = self.initial_layer(temps)
        for i, block in enumerate(self.blocks):
            bk = jax.random.fold_in(key, i) if key is not None else None
            temps = block(temps, context=context, key=bk)
        if self.bin_major_head is not None:
            return self.final_layer.call_transposed(temps)
        return self.final_layer(temps)

    def features_transposed(self, inputs, context=None, key=None):
        """Hidden activations BEFORE the final layer, feature-major
        ``(hidden, batch)`` — the whole trunk runs transposed
        (``Linear.matmul_t``; activations/residual adds are elementwise),
        so no data transpose is ever materialized. Feeds the fused
        head+spline kernel (``ops.spline_head_fused``), which consumes
        these activations together with ``final_layer`` weights."""
        temps = inputs if self.preprocessing is None \
            else self.preprocessing(inputs)
        temps_t = temps.T  # (in_features, batch): D is small, this is the
        # only transpose and it is of the tiny pre-trunk input
        context_t = context.T if context is not None else None
        if context_t is not None:
            temps_t = jnp.concatenate([temps_t, context_t], axis=0)
        temps_t = self.initial_layer.matmul_t(temps_t)
        for i, block in enumerate(self.blocks):
            bk = jax.random.fold_in(key, i) if key is not None else None
            temps_t = block.call_transposed(temps_t, context_t, key=bk)
        return temps_t


class ConvResidualBlock(Module):
    """Conv residual block (reference ``resnet.py:107-156``)."""

    convs: tuple
    context_layer: Optional[Conv2d]
    batch_norms: Optional[tuple]
    activation: Callable = static_field(default=jax.nn.relu)
    dropout: float = static_field(default=0.0)

    @classmethod
    def create(cls, key, channels, context_channels=None,
               activation=jax.nn.relu, dropout_probability=0.0,
               use_batch_norm=False, zero_initialization=True,
               dtype=jnp.float32):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        c0 = Conv2d.create(k1, channels, channels, 3, dtype=dtype)
        c1 = Conv2d.create(k2, channels, channels, 3, dtype=dtype)
        if zero_initialization:
            c1 = c1.replace(weight=_uniform_small(k3, c1.weight.shape, dtype),
                            bias=_uniform_small(k4, c1.bias.shape, dtype))
        ctx = (Conv2d.create(k5, context_channels, channels, 1, dtype=dtype)
               if context_channels is not None else None)
        bns = (tuple(_BatchAffineNorm.create(channels, dtype=dtype)
                     for _ in range(2)) if use_batch_norm else None)
        return cls(convs=(c0, c1), context_layer=ctx, batch_norms=bns,
                   activation=activation, dropout=dropout_probability)

    def __call__(self, inputs, context=None, key=None):
        temps = inputs
        if self.batch_norms is not None:
            temps = self.batch_norms[0](temps)
        temps = self.activation(temps)
        temps = self.convs[0](temps)
        if self.batch_norms is not None:
            temps = self.batch_norms[1](temps)
        temps = self.activation(temps)
        if self.dropout > 0 and key is not None:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(key, keep, temps.shape)
            temps = jnp.where(mask, temps / keep, 0.0)
        temps = self.convs[1](temps)
        if context is not None and self.context_layer is not None:
            temps = temps * jax.nn.sigmoid(self.context_layer(context))
        return inputs + temps


class ConvResidualNet(Module):
    """Conv residual conditioner for image NSF
    (reference ``resnet.py:159-209``)."""

    initial_layer: Conv2d
    blocks: tuple
    final_layer: Conv2d
    hidden_channels: int = static_field(default=0)
    context_channels: Optional[int] = static_field(default=None)

    @classmethod
    def create(cls, key, in_channels, out_channels, hidden_channels,
               context_channels=None, num_blocks=2, activation=jax.nn.relu,
               dropout_probability=0.0, use_batch_norm=False,
               dtype=jnp.float32):
        keys = jax.random.split(key, num_blocks + 2)
        in_total = in_channels + (context_channels or 0)
        initial = Conv2d.create(keys[0], in_total, hidden_channels, 1,
                                dtype=dtype)
        blocks = tuple(
            ConvResidualBlock.create(keys[1 + i], hidden_channels,
                                     context_channels, activation,
                                     dropout_probability, use_batch_norm,
                                     dtype=dtype)
            for i in range(num_blocks))
        final = Conv2d.create(keys[-1], hidden_channels, out_channels, 1,
                              dtype=dtype)
        return cls(initial_layer=initial, blocks=blocks, final_layer=final,
                   hidden_channels=hidden_channels,
                   context_channels=context_channels)

    def __call__(self, inputs, context=None, key=None):
        if context is not None:
            temps = self.initial_layer(
                jnp.concatenate([inputs, context], axis=1))
        else:
            temps = self.initial_layer(inputs)
        for i, block in enumerate(self.blocks):
            bk = jax.random.fold_in(key, i) if key is not None else None
            temps = block(temps, context=context, key=bk)
        return self.final_layer(temps)
