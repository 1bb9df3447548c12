"""Periodic coordinate flows (reference ``normflows/flows/periodic.py:6-73``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import buffer_field, static_field
from .base import Flow


class PeriodicWrap(Flow):
    """Map periodic coordinates back into ``[-bound, bound)`` on the inverse
    pass (reference ``periodic.py:6-33``); forward is the identity."""

    ind: jax.Array = buffer_field(default=None)
    bound: jax.Array = buffer_field(default=None)

    @classmethod
    def create(cls, ind, bound=1.0, dtype=jnp.float32):
        ind = jnp.asarray(np.asarray(ind).reshape(-1))
        bound = jnp.broadcast_to(jnp.asarray(bound, dtype), ind.shape)
        return cls(ind=ind, bound=bound)

    def forward(self, z, context=None, key=None):
        return z, jnp.zeros(z.shape[0], dtype=z.dtype)

    def inverse(self, z, context=None, key=None):
        wrapped = jnp.remainder(z[..., self.ind] + self.bound,
                                2 * self.bound) - self.bound
        z_ = z.at[..., self.ind].set(wrapped)
        return z_, jnp.zeros(z.shape[0], dtype=z.dtype)


class PeriodicShift(Flow):
    """Shift and wrap periodic coordinates
    (reference ``periodic.py:36-73``)."""

    ind: jax.Array = buffer_field(default=None)
    bound: jax.Array = buffer_field(default=None)
    shift: jax.Array = buffer_field(default=None)

    @classmethod
    def create(cls, ind, bound=1.0, shift=0.0, dtype=jnp.float32):
        ind = jnp.asarray(np.asarray(ind).reshape(-1))
        bound = jnp.broadcast_to(jnp.asarray(bound, dtype), ind.shape)
        shift = jnp.broadcast_to(jnp.asarray(shift, dtype), ind.shape)
        return cls(ind=ind, bound=bound, shift=shift)

    def forward(self, z, context=None, key=None):
        shifted = jnp.remainder(z[..., self.ind] + self.shift + self.bound,
                                2 * self.bound) - self.bound
        z_ = z.at[..., self.ind].set(shifted)
        return z_, jnp.zeros(z.shape[0], dtype=z.dtype)

    def inverse(self, z, context=None, key=None):
        shifted = jnp.remainder(z[..., self.ind] - self.shift + self.bound,
                                2 * self.bound) - self.bound
        z_ = z.at[..., self.ind].set(shifted)
        return z_, jnp.zeros(z.shape[0], dtype=z.dtype)
