"""Small neural-net helpers (reference ``normflows/utils/nn.py``)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, buffer_field, static_field


def sum_except_batch(x, num_batch_dims=1):
    """Sum over all but the first ``num_batch_dims`` axes
    (reference ``utils/nn.py:190``)."""
    return jnp.sum(x, axis=tuple(range(num_batch_dims, x.ndim)))


def tile(x, n):
    """Interleaved tiling (reference ``utils/nn.py:181``):
    ``tile([a,b], 2) == [a,a,b,b]``."""
    x_ = jnp.reshape(x, (-1,))
    x_ = jnp.tile(x_, (n,))
    x_ = jnp.reshape(x_, (n, -1)).T
    return jnp.reshape(x_, (-1,))


def _complement_indices(ndim, ind):
    ind = list(int(i) for i in np.asarray(ind).reshape(-1))
    other = [i for i in range(ndim) if i not in ind]
    perm = ind + other
    inv_perm = np.zeros(ndim, dtype=np.int64)
    for i, p in enumerate(perm):
        inv_perm[p] = i
    return np.asarray(ind), np.asarray(other), inv_perm


class PeriodicFeaturesElementwise(Module):
    """Replace circular coords f with ``w1*sin(s*f) + w2*cos(s*f)``
    elementwise (reference ``utils/nn.py:64-131``)."""

    weights: jax.Array  # (len(ind), 2)
    bias: Optional[jax.Array]
    scale: jax.Array = buffer_field()
    ind: jax.Array = buffer_field()
    ind_: jax.Array = buffer_field()
    inv_perm: jax.Array = buffer_field()
    ndim: int = static_field()
    activation: Optional[Callable] = static_field(default=None)

    @classmethod
    def create(cls, ndim, ind, scale=1.0, bias=False, activation=None,
               dtype=jnp.float32):
        ind_a, other, inv_perm = _complement_indices(ndim, ind)
        scale_arr = jnp.broadcast_to(jnp.asarray(scale, dtype), (len(ind_a),))
        return cls(
            weights=jnp.ones((len(ind_a), 2), dtype),
            bias=jnp.zeros((len(ind_a),), dtype) if bias else None,
            scale=scale_arr,
            # explicit int dtype: an EMPTY index list (all features
            # circular) would otherwise default to a float array, which is
            # an invalid indexer
            ind=jnp.asarray(ind_a, jnp.int32),
            ind_=jnp.asarray(other, jnp.int32),
            inv_perm=jnp.asarray(inv_perm, jnp.int32),
            ndim=ndim,
            activation=activation,
        )

    def __call__(self, inputs):
        x = inputs[..., self.ind] * self.scale
        x = self.weights[:, 0] * jnp.sin(x) + self.weights[:, 1] * jnp.cos(x)
        if self.bias is not None:
            x = x + self.bias
        if self.activation is not None:
            x = self.activation(x)
        out = jnp.concatenate([x, inputs[..., self.ind_]], axis=-1)
        return out[..., self.inv_perm]


class PeriodicFeaturesCat(Module):
    """Replace circular coords f with ``[sin(s*f), cos(s*f)]`` concatenated
    (reference ``utils/nn.py:133-178``).  Output has ``ndim + len(ind)``
    features, ordered ``[sin, cos, rest]``."""

    scale: jax.Array = buffer_field()
    ind: jax.Array = buffer_field()
    ind_: jax.Array = buffer_field()
    ndim: int = static_field()

    @classmethod
    def create(cls, ndim, ind, scale=1.0, dtype=jnp.float32):
        ind_a, other, _ = _complement_indices(ndim, ind)
        scale_arr = jnp.broadcast_to(jnp.asarray(scale, dtype), (len(ind_a),))
        return cls(scale=scale_arr, ind=jnp.asarray(ind_a, jnp.int32),
                   ind_=jnp.asarray(other, jnp.int32), ndim=ndim)

    def __call__(self, inputs):
        x = inputs[..., self.ind] * self.scale
        return jnp.concatenate(
            [jnp.sin(x), jnp.cos(x), inputs[..., self.ind_]], axis=-1
        )


class ConstScaleLayer(Module):
    """Multiply by a fixed constant (reference ``utils/nn.py:7-24``)."""

    scale: float = static_field(default=1.0)

    def __call__(self, x):
        return x * self.scale


class ClampExp(Module):
    """Nonlinearity ``min(exp(lam * x), 1)`` (reference ``utils/nn.py:46-62``)."""

    lam: float = static_field(default=1.0)

    def __call__(self, x):
        return jnp.minimum(jnp.exp(self.lam * x), 1.0)
