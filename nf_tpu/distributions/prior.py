"""Unnormalized 2D log-densities for VI experiments
(reference ``normflows/distributions/prior.py``)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.module import Module, buffer_field, static_field


class PriorDistribution(Module):
    """Abstract prior (reference ``prior.py:6-17``)."""

    def log_prob(self, z, context=None):
        raise NotImplementedError


class ImagePrior(PriorDistribution):
    """Image intensities define a 2D density (reference ``prior.py:20-104``):
    pixel-lookup log_prob plus jit-friendly rejection sampling."""

    image: jax.Array = buffer_field(default=None)
    density: jax.Array = buffer_field(default=None)
    x_range: tuple = static_field(default=(-3.0, 3.0))
    y_range: tuple = static_field(default=(-3.0, 3.0))

    @classmethod
    def create(cls, image, x_range=(-3.0, 3.0), y_range=(-3.0, 3.0), eps=1e-10):
        image_ = np.flip(np.asarray(image, np.float32), 0).T + eps
        image_ = image_ / np.max(image_)
        density = np.log(image_ / np.sum(image_))
        return cls(image=jnp.asarray(image_), density=jnp.asarray(density),
                   x_range=tuple(float(v) for v in x_range),
                   y_range=tuple(float(v) for v in y_range))

    @property
    def _scale(self):
        return jnp.asarray([[self.x_range[1] - self.x_range[0],
                             self.y_range[1] - self.y_range[0]]])

    @property
    def _shift(self):
        return jnp.asarray([[self.x_range[0], self.y_range[0]]])

    def log_prob(self, z, context=None):
        size = jnp.asarray(self.image.shape)
        z_ = jnp.clip((z - self._shift) / self._scale, 0.0, 1.0)
        ind = (z_ * (size - 1)).astype(jnp.int32)
        return self.density[ind[:, 0], ind[:, 1]]

    def sample(self, key, num_samples=1):
        size = jnp.asarray(self.image.shape)

        def cond(state):
            return state[2] < num_samples

        def body(state):
            key, buf, count = state
            key, k1, k2 = jax.random.split(key, 3)
            z_ = jax.random.uniform(k1, (num_samples, 2))
            prob = jax.random.uniform(k2, (num_samples,))
            ind = (z_ * (size - 1)).astype(jnp.int32)
            intensity = self.image[ind[:, 0], ind[:, 1]]
            accept = intensity > prob
            slots = jnp.where(accept, count + jnp.cumsum(accept) - 1,
                              num_samples)
            zs = z_ * self._scale + self._shift
            buf = buf.at[slots].set(zs, mode="drop")
            return key, buf, jnp.minimum(count + jnp.sum(accept), num_samples)

        buf = jnp.zeros((num_samples, 2))
        _, buf, _ = jax.lax.while_loop(cond, body, (key, buf, jnp.asarray(0)))
        return buf


class TwoModes(PriorDistribution):
    """Bimodal 2D density (reference ``prior.py:107-149``)."""

    loc: float = static_field(default=2.0)
    scale: float = static_field(default=0.2)

    def log_prob(self, z, context=None):
        a = jnp.abs(z[:, 0])
        eps = abs(self.loc)
        norm = jnp.sqrt(jnp.sum(z**2, axis=1))
        return (-0.5 * ((norm - self.loc) / (2 * self.scale)) ** 2
                - 0.5 * ((a - eps) / (3 * self.scale)) ** 2
                + jnp.log1p(jnp.exp(-2 * (a * eps) / (3 * self.scale) ** 2)))


def _coord_first(z):
    """Move the coordinate axis first (reference permute trick)."""
    if z.ndim > 1:
        return jnp.moveaxis(z, -1, 0)
    return z


def _envelope(z_, scale):
    """Gaussian 4-norm envelope used by the sinusoidal densities."""
    norm4 = jnp.sum(jnp.abs(z_) ** 4, axis=0) ** 0.25
    return -0.5 * (norm4 / (20 * scale)) ** 4


class Sinusoidal(PriorDistribution):
    """Sinusoidal density (reference ``prior.py:152-193``)."""

    scale: float = static_field(default=0.1)
    period: float = static_field(default=1.0)

    def log_prob(self, z, context=None):
        z_ = _coord_first(z)
        w_1 = jnp.sin(2 * np.pi / self.period * z_[0])
        return (-0.5 * ((z_[1] - w_1) / self.scale) ** 2
                + _envelope(z_, self.scale))


class Sinusoidal_gap(PriorDistribution):
    """Sinusoidal density with a gap (reference ``prior.py:196-246``)."""

    scale: float = static_field(default=0.1)
    period: float = static_field(default=1.0)

    def log_prob(self, z, context=None):
        w2_scale, w2_amp, w2_mu = 0.6, 3.0, 1.0
        z_ = _coord_first(z)
        w_1 = jnp.sin(2 * np.pi / self.period * z_[0])
        w_2 = w2_amp * jnp.exp(-0.5 * ((z_[0] - w2_mu) / w2_scale) ** 2)
        eps = jnp.abs(w_2 / 2)
        a = jnp.abs(z_[1] - w_1 + w_2 / 2)
        return (-0.5 * ((a - eps) / self.scale) ** 2
                + jnp.log1p(jnp.exp(-2 * (eps * a) / self.scale**2))
                + _envelope(z_, self.scale))


class Sinusoidal_split(PriorDistribution):
    """Sinusoidal density with a split (reference ``prior.py:249-299``)."""

    scale: float = static_field(default=0.1)
    period: float = static_field(default=1.0)

    def log_prob(self, z, context=None):
        w3_scale, w3_amp, w3_mu = 0.3, 3.0, 1.0
        z_ = _coord_first(z)
        w_1 = jnp.sin(2 * np.pi / self.period * z_[0])
        w_3 = w3_amp * jax.nn.sigmoid((z_[0] - w3_mu) / w3_scale)
        eps = jnp.abs(w_3 / 2)
        a = jnp.abs(z_[1] - w_1 + w_3 / 2)
        return (-0.5 * ((a - eps) / self.scale) ** 2
                + jnp.log1p(jnp.exp(-2 * (eps * a) / self.scale**2))
                + _envelope(z_, self.scale))


class Smiley(PriorDistribution):
    """Smiley-face density (reference ``prior.py:302-327``)."""

    scale: float = static_field(default=0.2)

    def log_prob(self, z, context=None):
        loc = 2.0
        z_ = _coord_first(z)
        norm = jnp.sqrt(jnp.sum(z_**2, axis=0))
        return (-0.5 * ((norm - loc) / (2 * self.scale)) ** 2
                - 0.5 * ((jnp.abs(z_[1] + 0.8) - 1.2) / (2 * self.scale)) ** 2)
