"""MLP conditioner networks (capability parity with reference ``nets/mlp.py:5``).

Implemented as pytree modules over explicit parameters so they can live inside
jitted/sharded flow programs.  Matmuls hit the MXU; keep hidden sizes at
multiples of 128 for best tiling when possible.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.module import Module, static_field


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Linear(Module):
    """Dense layer ``y = x @ W^T + b``."""

    weight: jax.Array  # (out, in)
    bias: Optional[jax.Array]

    @classmethod
    def create(cls, key, in_features, out_features, bias=True, init_zeros=False,
               dtype=jnp.float32):
        kw, kb = jax.random.split(key)
        if init_zeros:
            weight = jnp.zeros((out_features, in_features), dtype)
            b = jnp.zeros((out_features,), dtype) if bias else None
        else:
            weight = _kaiming_uniform(kw, (out_features, in_features), in_features, dtype)
            b = (_kaiming_uniform(kb, (out_features,), in_features, dtype)
                 if bias else None)
        return cls(weight=weight, bias=b)

    def __call__(self, x):
        y = jnp.dot(x, self.weight.T, preferred_element_type=x.dtype)
        if self.bias is not None:
            y = y + self.bias
        return y

    def call_transposed(self, x):
        """``y^T = W @ x^T`` -> ``(out, batch)``.

        Emits the layer's output TRANSPOSED at identical MXU cost: XLA folds
        the ``x`` transpose into the ``dot_general`` contraction, so no
        relayout is materialized. Used by bin-major conditioner heads so
        spline parameters are born in the fused kernel's ``(K, N)`` layout
        instead of paying the elementwise ``(N, K) -> (K, N)`` feed shuffle
        (docs/kernels.md)."""
        y = jnp.dot(self.weight, x.T, preferred_element_type=x.dtype)
        if self.bias is not None:
            y = y + self.bias[:, None]
        return y

    def matmul_t(self, x_t):
        """Apply to an ALREADY-transposed ``(in, batch)`` input:
        ``W @ x_t + b[:, None]``. Used by transposed conditioner execution
        (``ResidualNet.features_transposed``) so hidden activations flow
        feature-major end to end and the fused head+spline kernel never
        needs a data transpose."""
        y = jnp.dot(self.weight, x_t, preferred_element_type=x_t.dtype)
        if self.bias is not None:
            y = y + self.bias[:, None]
        return y


def clamp_exp(x):
    """Nonlinearity ``min(exp(x), 1)`` (reference ``utils/nn.py:60``)."""
    return jnp.minimum(jnp.exp(x), 1.0)


_OUTPUT_FNS = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "clampexp": clamp_exp,
}


class MLP(Module):
    """Leaky-ReLU MLP with optional zero-init output layer and output map.

    Mirrors reference ``nets/mlp.py:5-58``: ``layers`` is the list of sizes,
    ``leaky`` the LeakyReLU slope, ``output_fn`` in {None, sigmoid, relu, tanh,
    clampexp} applied as ``output_scale * output_fn(score_scale * out)``.
    Dropout is not applied at inference; pass ``key`` to ``__call__`` to enable
    it during training.
    """

    linears: tuple
    leaky: float = static_field(default=0.0)
    score_scale: Optional[float] = static_field(default=None)
    output_fn: Optional[str] = static_field(default=None)
    output_scale: Optional[float] = static_field(default=None)
    dropout: Optional[float] = static_field(default=None)

    @classmethod
    def create(cls, key, layers, leaky=0.0, score_scale=None, output_fn=None,
               output_scale=None, init_zeros=False, dropout=None,
               dtype=jnp.float32):
        n = len(layers) - 1
        keys = jax.random.split(key, n)
        linears = []
        for k in range(n):
            zeros = init_zeros and k == n - 1
            linears.append(Linear.create(keys[k], layers[k], layers[k + 1],
                                         init_zeros=zeros, dtype=dtype))
        return cls(linears=tuple(linears), leaky=leaky, score_scale=score_scale,
                   output_fn=output_fn, output_scale=output_scale,
                   dropout=dropout)

    def __call__(self, x, key=None):
        for lin in self.linears[:-1]:
            x = jax.nn.leaky_relu(lin(x), negative_slope=self.leaky)
        if self.dropout is not None and key is not None:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(key, keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        x = self.linears[-1](x)
        if self.output_fn is not None:
            if self.score_scale is not None:
                x = x * self.score_scale
            x = _OUTPUT_FNS[self.output_fn](x)
            if self.output_scale is not None:
                x = x * self.output_scale
        return x
