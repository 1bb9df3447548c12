"""Radial flow (reference ``normflows/flows/radial.py:8-46``).

``f(z) = z + beta * h(alpha, r) * (z - z_0)`` with ``h = 1/(alpha + r)``.
Forward-only (no algebraic inverse), as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import static_field
from .base import Flow


class Radial(Flow):
    beta: jax.Array  # (1,)
    alpha: jax.Array  # (1,)
    z_0: jax.Array  # (1, *shape)
    d: int = static_field(default=0)

    @classmethod
    def create(cls, key, shape, z_0=None, dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        d = int(np.prod(shape))
        lim = 1.0 / np.prod(shape)
        kb, ka, kz = jax.random.split(key, 3)
        beta = jax.random.uniform(kb, (1,), dtype, -lim - 1.0, lim - 1.0)
        alpha = jax.random.uniform(ka, (1,), dtype, -lim, lim)
        if z_0 is None:
            z_0 = jax.random.normal(kz, (1,) + shape, dtype)
        return cls(beta=beta, alpha=alpha, z_0=jnp.asarray(z_0), d=d)

    def forward(self, z, context=None, key=None):
        beta = jax.nn.softplus(self.beta) - jnp.abs(self.alpha)
        dz = z - self.z_0
        red_axes = tuple(range(1, self.z_0.ndim))
        r = jnp.sqrt(jnp.sum(dz**2, axis=red_axes, keepdims=True))
        h_arr = beta / (jnp.abs(self.alpha) + r)
        h_arr_ = -beta * r / (jnp.abs(self.alpha) + r) ** 2
        z_ = z + h_arr * dz
        log_det = (self.d - 1) * jnp.log(1 + h_arr) + jnp.log(1 + h_arr + h_arr_)
        return z_, log_det.reshape(-1)
