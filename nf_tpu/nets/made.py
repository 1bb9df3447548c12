"""MADE — masked autoregressive conditioner (reference
``normflows/nets/made.py``, itself from the nsf codebase).

Degree bookkeeping happens at construction time in numpy (static); at run
time a masked linear is a single dense matmul with a constant 0/1 mask —
exactly what the MXU wants.  Output degrees use the interleaved ``tile``
ordering (reference ``made.py:59-62``): feature d's ``output_multiplier``
parameters are contiguous.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, buffer_field, static_field
from .mlp import Linear


def _get_input_degrees(in_features):
    return np.arange(1, in_features + 1)


def _hidden_degrees(in_degrees, out_features, autoregressive_features,
                    random_mask, key):
    if random_mask:
        min_in = int(min(np.min(in_degrees), autoregressive_features - 1))
        degs = np.asarray(jax.random.randint(
            key, (out_features,), min_in, autoregressive_features))
    else:
        max_ = max(1, autoregressive_features - 1)
        min_ = min(1, autoregressive_features - 1)
        degs = np.arange(out_features) % max_ + min_
    return degs


def _output_degrees(in_degrees_input, out_features, autoregressive_features,
                    bin_major=False):
    mult = out_features // autoregressive_features
    if bin_major:
        # bin-major: all features' p-th parameters contiguous — the head
        # emits spline params in the fused kernel's (mult, D) row order
        return np.tile(in_degrees_input, mult)
    # interleaved tile: each input degree repeated `mult` times contiguously
    return np.repeat(in_degrees_input, mult)


class MaskedLinear(Module):
    """Dense layer with a fixed autoregressive 0/1 mask
    (reference ``made.py:19-81``)."""

    weight: jax.Array  # (out, in)
    bias: Optional[jax.Array]
    mask: jax.Array = buffer_field(default=None)
    degrees: Any = static_field(default=None)  # numpy out-degrees (build-time)

    @classmethod
    def create(cls, key, in_degrees, out_features, autoregressive_features,
               random_mask=False, is_output=False, bias=True,
               out_degrees_=None, bin_major=False, dtype=jnp.float32):
        in_degrees = np.asarray(in_degrees)
        in_features = len(in_degrees)
        if is_output:
            if out_degrees_ is None:
                out_degrees_ = _get_input_degrees(autoregressive_features)
            out_degrees = _output_degrees(np.asarray(out_degrees_),
                                          out_features,
                                          autoregressive_features,
                                          bin_major=bin_major)
            mask = (out_degrees[:, None] > in_degrees).astype(np.float32)
        else:
            kd, key = jax.random.split(key)
            out_degrees = _hidden_degrees(in_degrees, out_features,
                                          autoregressive_features,
                                          random_mask, kd)
            mask = (out_degrees[:, None] >= in_degrees).astype(np.float32)
        lin = Linear.create(key, in_features, out_features, bias=bias,
                            dtype=dtype)
        return cls(weight=lin.weight, bias=lin.bias, mask=jnp.asarray(mask),
                   degrees=tuple(int(d) for d in out_degrees))

    def __call__(self, x):
        w = self.weight * self.mask
        y = jnp.dot(x, w.T, preferred_element_type=x.dtype)
        if self.bias is not None:
            y = y + self.bias
        return y

    def call_transposed(self, x):
        """``y^T = (W*mask) @ x^T`` -> ``(out, batch)`` — transposed output
        at identical MXU cost (see ``Linear.call_transposed``)."""
        w = self.weight * self.mask
        y = jnp.dot(w, x.T, preferred_element_type=x.dtype)
        if self.bias is not None:
            y = y + self.bias[:, None]
        return y


class MaskedFeedforwardBlock(Module):
    """Masked linear + activation (reference ``made.py:84-141``)."""

    linear: MaskedLinear
    activation: Callable = static_field(default=jax.nn.relu)
    dropout: float = static_field(default=0.0)

    @property
    def degrees(self):
        return self.linear.degrees

    @classmethod
    def create(cls, key, in_degrees, autoregressive_features,
               context_features=None, random_mask=False,
               activation=jax.nn.relu, dropout_probability=0.0,
               use_batch_norm=False, dtype=jnp.float32):
        if context_features is not None:
            raise NotImplementedError()
        linear = MaskedLinear.create(
            key, in_degrees, len(np.asarray(in_degrees)),
            autoregressive_features, random_mask=random_mask,
            is_output=False, dtype=dtype)
        return cls(linear=linear, activation=activation,
                   dropout=dropout_probability)

    def __call__(self, inputs, context=None, key=None):
        out = self.activation(self.linear(inputs))
        if self.dropout > 0 and key is not None:
            keep = 1.0 - self.dropout
            out = jnp.where(jax.random.bernoulli(key, keep, out.shape),
                            out / keep, 0.0)
        return out


class MaskedResidualBlock(Module):
    """Residual block of masked linears with degree-monotonicity check
    (reference ``made.py:144-214``)."""

    linears: tuple
    context_layer: Optional[Linear]
    activation: Callable = static_field(default=jax.nn.relu)
    dropout: float = static_field(default=0.0)

    @property
    def degrees(self):
        return self.linears[1].degrees

    @classmethod
    def create(cls, key, in_degrees, autoregressive_features,
               context_features=None, random_mask=False,
               activation=jax.nn.relu, dropout_probability=0.0,
               use_batch_norm=False, zero_initialization=True,
               dtype=jnp.float32):
        if random_mask:
            raise ValueError(
                "Masked residual block can't be used with random masks.")
        in_degrees = np.asarray(in_degrees)
        features = len(in_degrees)
        k0, k1, k2, k3, kc = jax.random.split(key, 5)
        l0 = MaskedLinear.create(k0, in_degrees, features,
                                 autoregressive_features, is_output=False,
                                 dtype=dtype)
        l1 = MaskedLinear.create(k1, np.asarray(l0.degrees), features,
                                 autoregressive_features, is_output=False,
                                 dtype=dtype)
        if not np.all(np.asarray(l1.degrees) >= in_degrees):
            raise RuntimeError(
                "In a masked residual block, the output degrees can't be"
                " less than the corresponding input degrees.")
        if zero_initialization:
            l1 = l1.replace(
                weight=jax.random.uniform(k2, l1.weight.shape, dtype,
                                          -1e-3, 1e-3),
                bias=jax.random.uniform(k3, l1.bias.shape, dtype,
                                        -1e-3, 1e-3))
        ctx = (Linear.create(kc, context_features, features, dtype=dtype)
               if context_features is not None else None)
        return cls(linears=(l0, l1), context_layer=ctx, activation=activation,
                   dropout=dropout_probability)

    def __call__(self, inputs, context=None, key=None):
        temps = self.activation(inputs)
        temps = self.linears[0](temps)
        temps = self.activation(temps)
        if self.dropout > 0 and key is not None:
            keep = 1.0 - self.dropout
            temps = jnp.where(jax.random.bernoulli(key, keep, temps.shape),
                              temps / keep, 0.0)
        temps = self.linears[1](temps)
        if context is not None and self.context_layer is not None:
            temps = temps * jax.nn.sigmoid(self.context_layer(context))
        return inputs + temps


class MADE(Module):
    """Masked autoregressive density estimator net
    (reference ``made.py:217-304``).  Context is added after the initial
    layer (``made.py:299-300``)."""

    initial_layer: MaskedLinear
    context_layer: Optional[Linear]
    blocks: tuple
    final_layer: MaskedLinear
    preprocessing: Optional[Any] = None
    # None, or (features, output_multiplier): the final masked matmul emits
    # TRANSPOSED (out, batch) output with rows ordered bin-major
    # (param-major, feature-minor) — see ResidualNet.bin_major_head.
    bin_major_head: Optional[tuple] = static_field(default=None)

    @classmethod
    def create(cls, key, features, hidden_features, context_features=None,
               num_blocks=2, output_multiplier=1, use_residual_blocks=True,
               random_mask=False, permute_mask=False,
               activation=jax.nn.relu, dropout_probability=0.0,
               use_batch_norm=False, preprocessing=None,
               bin_major_head=False, dtype=jnp.float32):
        if use_residual_blocks and random_mask:
            raise ValueError("Residual blocks can't be used with random masks.")
        keys = jax.random.split(key, num_blocks + 4)
        input_degrees_ = _get_input_degrees(features)
        if permute_mask:
            perm = np.asarray(jax.random.permutation(keys[0], features))
            input_degrees_ = input_degrees_[perm]
        initial = MaskedLinear.create(keys[1], input_degrees_,
                                      hidden_features, features,
                                      random_mask=random_mask,
                                      is_output=False, dtype=dtype)
        ctx = (Linear.create(keys[2], context_features, hidden_features,
                             dtype=dtype)
               if context_features is not None else None)
        block_ctor = (MaskedResidualBlock if use_residual_blocks
                      else MaskedFeedforwardBlock)
        blocks = []
        prev = np.asarray(initial.degrees)
        for i in range(num_blocks):
            blk = block_ctor.create(keys[3 + i], prev, features,
                                    context_features=context_features,
                                    random_mask=random_mask,
                                    activation=activation,
                                    dropout_probability=dropout_probability,
                                    use_batch_norm=use_batch_norm,
                                    dtype=dtype)
            blocks.append(blk)
            prev = np.asarray(blk.degrees)
        final = MaskedLinear.create(keys[-1], prev,
                                    features * output_multiplier, features,
                                    random_mask=random_mask, is_output=True,
                                    out_degrees_=input_degrees_,
                                    bin_major=bool(bin_major_head),
                                    dtype=dtype)
        return cls(initial_layer=initial, context_layer=ctx,
                   blocks=tuple(blocks), final_layer=final,
                   preprocessing=preprocessing,
                   bin_major_head=((features, output_multiplier)
                                   if bin_major_head else None))

    def __call__(self, inputs, context=None, key=None):
        out = inputs if self.preprocessing is None \
            else self.preprocessing(inputs)
        out = self.initial_layer(out)
        if context is not None and self.context_layer is not None:
            out = out + self.context_layer(context)
        for i, block in enumerate(self.blocks):
            bk = jax.random.fold_in(key, i) if key is not None else None
            out = block(out, context=context, key=bk)
        if self.bin_major_head is not None:
            return self.final_layer.call_transposed(out)
        return self.final_layer(out)
