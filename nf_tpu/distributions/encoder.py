"""VAE encoders with (batch, num_samples, ...) output shape
(reference ``normflows/distributions/encoder.py``)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, static_field

_LOG2PI = float(np.log(2 * np.pi))


class BaseEncoder(Module):
    """Abstract conditional base distribution q(z|x)
    (reference ``encoder.py:6-37``)."""

    def forward(self, key, x, num_samples=1):
        raise NotImplementedError

    def log_prob(self, z, x):
        raise NotImplementedError


class Dirac(BaseEncoder):
    """Deterministic encoder z = x (reference ``encoder.py:40-52``)."""

    def forward(self, key, x, num_samples=1):
        z = jnp.repeat(x[:, None], num_samples, axis=1)
        log_q = jnp.zeros(z.shape[0:2], z.dtype)
        return z, log_q

    def log_prob(self, z, x):
        return jnp.zeros(z.shape[0:2], z.dtype)


class Uniform(BaseEncoder):
    """Uniform encoder (reference ``encoder.py:55-72``)."""

    zmin: float = static_field(default=0.0)
    zmax: float = static_field(default=1.0)

    def forward(self, key, x, num_samples=1):
        shape = (x.shape[0], num_samples) + x.shape[1:]
        z = jax.random.uniform(key, shape, x.dtype, self.zmin, self.zmax)
        log_q = jnp.full(z.shape[0:2], -np.log(self.zmax - self.zmin), z.dtype)
        return z, log_q

    def log_prob(self, z, x):
        return jnp.full(z.shape[0:2], -np.log(self.zmax - self.zmin), z.dtype)


class ConstDiagGaussian(BaseEncoder):
    """Diagonal Gaussian with x-independent parameters
    (reference ``encoder.py:75-130``)."""

    loc: jax.Array  # (1, 1, d)
    scale: jax.Array

    @classmethod
    def create(cls, loc, scale, dtype=jnp.float32):
        loc = jnp.asarray(loc, dtype).reshape(1, 1, -1)
        scale = jnp.asarray(scale, dtype)
        return cls(loc=loc, scale=scale)

    @property
    def d(self):
        return self.loc.shape[-1]

    def forward(self, key, x=None, num_samples=1):
        batch_size = x.shape[0] if x is not None else 1
        eps = jax.random.normal(key, (batch_size, num_samples, self.d),
                                self.loc.dtype)
        z = self.loc + self.scale * eps
        log_q = -0.5 * self.d * _LOG2PI - jnp.sum(
            jnp.log(self.scale) + 0.5 * eps**2, axis=2)
        return z, log_q

    def log_prob(self, z, x):
        if z.ndim == 1:
            z = z[None]
        if z.ndim == 2:
            z = z[None]
        return -0.5 * self.d * _LOG2PI - jnp.sum(
            jnp.log(self.scale) + 0.5 * ((z - self.loc) / self.scale) ** 2,
            axis=2)


class NNDiagGaussian(BaseEncoder):
    """Diagonal Gaussian with NN-computed mean/variance
    (reference ``encoder.py:133-188``).  The net output stacks mean then
    ``log(var)`` along axis 1."""

    net: Any

    def forward(self, key, x, num_samples=1):
        batch_size = x.shape[0]
        mean_std = self.net(x)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden][:, None]
        std = jnp.exp(0.5 * mean_std[:, n_hidden:(2 * n_hidden)][:, None])
        eps = jax.random.normal(
            key, (batch_size, num_samples) + mean.shape[2:], x.dtype)
        z = mean + std * eps
        d = int(np.prod(z.shape[2:]))
        log_q = -0.5 * d * _LOG2PI - jnp.sum(
            jnp.log(std) + 0.5 * eps**2, axis=tuple(range(2, z.ndim)))
        return z, log_q

    def log_prob(self, z, x):
        if z.ndim == 1:
            z = z[None]
        if z.ndim == 2:
            z = z[None]
        mean_std = self.net(x)
        n_hidden = mean_std.shape[1] // 2
        mean = mean_std[:, :n_hidden][:, None]
        var = jnp.exp(mean_std[:, n_hidden:(2 * n_hidden)][:, None])
        d = int(np.prod(z.shape[2:]))
        return -0.5 * d * _LOG2PI - 0.5 * jnp.sum(
            jnp.log(var) + (z - mean) ** 2 / var,
            axis=tuple(range(2, z.ndim)))
