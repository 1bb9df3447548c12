"""Planar flow (reference ``normflows/flows/planar.py:8-81``).

``f(z) = z + u * h(w·z + b)`` with the invertibility reparameterization
``u <- u + (softplus(w·u) - 1 - w·u) * w / |w|^2`` enforcing ``w·u > -1``.
tanh activation has no algebraic inverse; leaky_relu does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import static_field
from .base import Flow

_NEG_SLOPE = 0.2


class Planar(Flow):
    u: jax.Array  # (1, *shape)
    w: jax.Array  # (1, *shape)
    b: jax.Array  # (1,)
    act: str = static_field(default="tanh")

    @classmethod
    def create(cls, key, shape, act="tanh", u=None, w=None, b=None,
               dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        lim_w = float(np.sqrt(2.0 / np.prod(shape)))
        lim_u = float(np.sqrt(2.0))
        ku, kw = jax.random.split(key)
        if u is None:
            u = jax.random.uniform(ku, (1,) + shape, dtype, -lim_u, lim_u)
        if w is None:
            w = jax.random.uniform(kw, (1,) + shape, dtype, -lim_w, lim_w)
        if b is None:
            b = jnp.zeros((1,), dtype)
        if act not in ("tanh", "leaky_relu"):
            raise NotImplementedError("Nonlinearity is not implemented.")
        return cls(u=jnp.asarray(u), w=jnp.asarray(w), b=jnp.asarray(b), act=act)

    def _constrained_u(self):
        inner = jnp.sum(self.w * self.u)
        return self.u + (jax.nn.softplus(inner) - 1 - inner) * self.w / jnp.sum(
            self.w**2
        )

    def forward(self, z, context=None, key=None):
        red_axes = tuple(range(1, self.w.ndim))
        lin = jnp.sum(self.w * z, axis=red_axes, keepdims=True) + self.b
        u = self._constrained_u()
        if self.act == "tanh":
            h = jnp.tanh(lin)
            h_prime = 1.0 / jnp.cosh(lin.reshape(-1)) ** 2
        else:  # leaky_relu
            h = jax.nn.leaky_relu(lin, negative_slope=_NEG_SLOPE)
            h_prime = jnp.where(lin.reshape(-1) < 0, _NEG_SLOPE, 1.0)
        z_ = z + u * h
        log_det = jnp.log(jnp.abs(1 + jnp.sum(self.w * u) * h_prime))
        return z_, log_det

    def inverse(self, z, context=None, key=None):
        if self.act != "leaky_relu":
            raise NotImplementedError("This flow has no algebraic inverse.")
        red_axes = tuple(range(1, self.w.ndim))
        lin = jnp.sum(self.w * z, axis=red_axes) + self.b
        a = jnp.where(lin < 0, _NEG_SLOPE, 1.0)  # absorb slope into u
        u = self._constrained_u()
        dims = (-1,) + (u.ndim - 1) * (1,)
        u = a.reshape(dims) * u
        inner_ = jnp.sum(self.w * u, axis=red_axes)
        z_ = z - u * (lin / (1 + inner_)).reshape(dims)
        log_det = -jnp.log(jnp.abs(1 + inner_))
        return z_, log_det
