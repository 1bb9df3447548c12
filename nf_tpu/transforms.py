"""Flow-typed data preprocessing transforms
(reference ``normflows/transforms.py:8-76``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .flows.base import Flow
from .utils.module import static_field
from .utils.nn import sum_except_batch


class Logit(Flow):
    """Logit transform ``logit(alpha + (1 - alpha) * x)`` with exact log-det
    (reference ``transforms.py:8-47``).  Forward maps logits -> pixels,
    inverse maps pixels -> logits (density direction)."""

    alpha: float = static_field(default=0.05)

    def forward(self, z, context=None, key=None):
        beta = 1 - 2 * self.alpha
        ls = sum_except_batch(jax.nn.log_sigmoid(z))
        mls = sum_except_batch(jax.nn.log_sigmoid(-z))
        d = int(np.prod(z.shape[1:]))
        log_det = -np.log(beta) * d + ls + mls
        z = (jax.nn.sigmoid(z) - self.alpha) / beta
        return z, log_det

    def inverse(self, z, context=None, key=None):
        beta = 1 - 2 * self.alpha
        z = self.alpha + beta * z
        logz = jnp.log(z)
        log1mz = jnp.log(1 - z)
        d = int(np.prod(z.shape[1:]))
        log_det = (np.log(beta) * d - sum_except_batch(logz)
                   - sum_except_batch(log1mz))
        return logz - log1mz, log_det


class Shift(Flow):
    """Constant shift, e.g. [0,1] -> [-0.5, 0.5]
    (reference ``transforms.py:50-76``)."""

    shift: float = static_field(default=-0.5)

    def forward(self, z, context=None, key=None):
        return z - self.shift, jnp.zeros(z.shape[0], dtype=z.dtype)

    def inverse(self, z, context=None, key=None):
        return z + self.shift, jnp.zeros(z.shape[0], dtype=z.dtype)
