"""Normalization flows: ActNorm and BatchNorm.

Capability parity with reference ``normflows/flows/normalization.py:7-62``.
The reference mutates ActNorm parameters on the first batch inside
``forward``/``inverse`` — impossible under ``jit``.  Here initialization is an
explicit functional pass: :func:`init_actnorm_inverse` /
:func:`init_actnorm_forward` run a batch through a flow list *outside* the
compiled step and return updated layers (see SURVEY §7 "data-dependent init
under jit").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.module import static_field
from .affine import AffineConstFlow
from .base import Flow


class ActNorm(AffineConstFlow):
    """Affine-const flow with data-dependent initialization
    (reference ``normalization.py:7-39``).

    ``initialized`` is a static flag; use the ``init_actnorm_*`` helpers or
    ``NormalizingFlow.init_from_data`` to set parameters from the first batch.
    """

    initialized: bool = static_field(default=False)

    @classmethod
    def create(cls, shape, dtype=jnp.float32):
        if isinstance(shape, int):
            shape = (shape,)
        return cls(
            s=jnp.zeros((1,) + tuple(shape), dtype),
            t=jnp.zeros((1,) + tuple(shape), dtype),
            initialized=False,
        )

    def _stat_axes(self, z):
        # all axes where the parameter broadcasts (incl. batch axis 0)
        return tuple(i for i in range(z.ndim) if self.s.shape[i] == 1)

    def init_forward(self, z):
        """Data-dep init as in reference ``normalization.py:19-28`` (forward
        direction: output of forward(z) becomes unit Gaussian)."""
        axes = self._stat_axes(z)
        std = jnp.std(z, axis=axes, keepdims=True, ddof=1)
        s = -jnp.log(std + 1e-6)
        t = -jnp.mean(z, axis=axes, keepdims=True) * jnp.exp(s)
        return self.replace(s=s, t=t, initialized=True)

    def init_inverse(self, z):
        """Data-dep init as in reference ``normalization.py:31-38`` (inverse
        direction: output of inverse(z) becomes unit Gaussian)."""
        axes = self._stat_axes(z)
        std = jnp.std(z, axis=axes, keepdims=True, ddof=1)
        s = jnp.log(std + 1e-6)
        t = jnp.mean(z, axis=axes, keepdims=True)
        return self.replace(s=s, t=t, initialized=True)

    def init_data_forward(self, z, context=None, key=None):
        layer = self if self.initialized else self.init_forward(z)
        z, log_det = layer.forward(z, context=context)
        return layer, z, log_det

    def init_data_inverse(self, z, context=None, key=None):
        layer = self if self.initialized else self.init_inverse(z)
        z, log_det = layer.inverse(z, context=context)
        return layer, z, log_det


class BatchNorm(Flow):
    """Flow-style batch norm with log-det from batch statistics, ignoring
    their parameter dependence (reference ``normalization.py:42-62``)."""

    eps: float = static_field(default=1e-10)

    def forward(self, z, context=None, key=None):
        mean = jnp.mean(z, axis=0, keepdims=True)
        std = jnp.std(z, axis=0, keepdims=True, ddof=1)
        var_eps = std**2 + self.eps
        z_ = (z - mean) / jnp.sqrt(var_eps)
        log_det = -0.5 * jnp.sum(jnp.log(var_eps))
        return z_, jnp.broadcast_to(log_det, (z.shape[0],))
