"""Dequantization pipeline transforms for data loading
(reference ``normflows/utils/preprocessing.py``): ``x*255/256 + U(0,1/256)``
then logit."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Logit:
    """``logit(alpha + (1 - alpha) * x)`` (reference ``preprocessing.py:4-27``)."""

    def __init__(self, alpha=0.0):
        self.alpha = alpha

    def __call__(self, x):
        x_ = self.alpha + (1 - self.alpha) * x
        return jnp.log(x_ / (1 - x_))

    def inverse(self, x):
        return (jax.nn.sigmoid(x) - self.alpha) / (1 - self.alpha)


class Jitter:
    """Add uniform dequantization noise (reference ``preprocessing.py:28-44``).
    Functional: pass the key explicitly."""

    def __init__(self, scale=1.0 / 256):
        self.scale = scale

    def __call__(self, x, key):
        return x + jax.random.uniform(key, x.shape, x.dtype) * self.scale


class Scale:
    """Rescale, default 255/256 (reference ``preprocessing.py:45-57``)."""

    def __init__(self, scale=255.0 / 256.0):
        self.scale = scale

    def __call__(self, x):
        return x * self.scale
